"""Mimi neural codec — top-level model, HF weight import, streaming decode.

Structure per the reference port (mlx .../codec/mimi.py:30-104) and kyutai/HF:

  encode:  audio [B, L, 1] → SEANet encoder → encoder transformer →
           stride-2 downsample (25 → 12.5 Hz) → split-RVQ encode → codes
  decode:  codes [B, K, T] → RVQ decode → grouped transpose-conv upsample →
           decoder transformer → SEANet decoder → PCM [B, T*1920, 1]

`decode_step` consumes ONE 12.5 Hz frame at a time against an explicit
streaming-state pytree (transpose-conv tails, conv buffers, ring KV cache) —
the whole step jits to a single XLA program emitting 1920 PCM samples
(80 ms @ 24 kHz).

Weights load from the `kyutai/mimi` safetensors release or any HF
`transformers.MimiModel` state dict (both use the same key schema); layouts
are transposed to this module's channels-last/[K, I, O] convention, with
transpose-conv kernels pre-flipped (see conv.py) and RVQ codebooks
materialized as `embed_sum / max(cluster_usage, ε)`.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, NamedTuple, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from smoltts_tpu.codec.config import MimiConfig
from smoltts_tpu.codec.conv import (
    causal_conv1d,
    causal_conv_transpose1d,
    convtr_stream_init,
    convtr_stream_step,
)
from smoltts_tpu.codec.rvq import split_rvq_decode, split_rvq_encode
from smoltts_tpu.codec.seanet import (
    ConvSpec,
    build_decoder_plan,
    build_encoder_plan,
    seanet_apply,
    seanet_stream_init,
    seanet_stream_step,
)
from smoltts_tpu.codec.transformer import (
    TransformerRingState,
    flush_transformer_ring,
    ring_state_init,
    transformer_forward,
    transformer_stream_step,
)

MimiParams = Dict[str, object]


# --------------------------------------------------------------------------
# Weight import
# --------------------------------------------------------------------------


def _conv_w(state, key, bias_key=None) -> dict:
    w = state[key]  # torch [O, I/groups, K]
    p = {"w": np.transpose(w, (2, 1, 0))}  # -> [K, I/groups, O]
    if bias_key and bias_key in state:
        p["b"] = state[bias_key]
    return p


def _convtr_w(state, key, bias_key, groups: int) -> dict:
    """torch ConvTranspose1d weight [I, O/groups, K] -> flipped [K, I/groups, O].

    groups == 1: [I, O, K] -> flip K -> [K, I, O].
    groups == I (Mimi upsample): [I, 1, K] -> flip K -> [K, 1, I].
    """
    w = state[key]
    wf = w[..., ::-1]
    if groups == 1:
        p = {"w": np.ascontiguousarray(np.transpose(wf, (2, 0, 1)))}
    elif groups == w.shape[0] and w.shape[1] == 1:
        p = {"w": np.ascontiguousarray(np.transpose(wf, (2, 1, 0)))}
    else:
        raise NotImplementedError(f"grouped convtr groups={groups} shape={w.shape}")
    if bias_key and bias_key in state:
        p["b"] = state[bias_key]
    return p


def _seanet_params(state, plan: List[ConvSpec], prefix: str) -> List:
    params: List = []
    for i, spec in enumerate(plan):
        base = f"{prefix}.layers.{i}"
        if spec.kind == "elu":
            params.append(None)
        elif spec.kind == "conv":
            params.append(_conv_w(state, f"{base}.conv.weight", f"{base}.conv.bias"))
        elif spec.kind == "convtr":
            params.append(
                _convtr_w(state, f"{base}.conv.weight", f"{base}.conv.bias", groups=1)
            )
        elif spec.kind == "resnet":
            params.append(
                {
                    "conv1": _conv_w(
                        state, f"{base}.block.1.conv.weight", f"{base}.block.1.conv.bias"
                    ),
                    "conv2": _conv_w(
                        state, f"{base}.block.3.conv.weight", f"{base}.block.3.conv.bias"
                    ),
                }
            )
    return params


def _transformer_params(state, prefix: str, n_layers: int) -> dict:
    def stack(fmt, transpose=False):
        arrs = [state[fmt.format(i)] for i in range(n_layers)]
        a = np.stack(arrs, axis=0)
        return np.ascontiguousarray(np.transpose(a, (0, 2, 1))) if transpose else a

    return {
        "layers": {
            "ln1_w": stack(prefix + ".layers.{}.input_layernorm.weight"),
            "ln1_b": stack(prefix + ".layers.{}.input_layernorm.bias"),
            "ln2_w": stack(prefix + ".layers.{}.post_attention_layernorm.weight"),
            "ln2_b": stack(prefix + ".layers.{}.post_attention_layernorm.bias"),
            "wq": stack(prefix + ".layers.{}.self_attn.q_proj.weight", transpose=True),
            "wk": stack(prefix + ".layers.{}.self_attn.k_proj.weight", transpose=True),
            "wv": stack(prefix + ".layers.{}.self_attn.v_proj.weight", transpose=True),
            "wo": stack(prefix + ".layers.{}.self_attn.o_proj.weight", transpose=True),
            "fc1": stack(prefix + ".layers.{}.mlp.fc1.weight", transpose=True),
            "fc2": stack(prefix + ".layers.{}.mlp.fc2.weight", transpose=True),
            "scale_attn": stack(prefix + ".layers.{}.self_attn_layer_scale.scale"),
            "scale_mlp": stack(prefix + ".layers.{}.mlp_layer_scale.scale"),
        }
    }


def _rvq_side(state, prefix: str, n_layers: int, eps: float = 1e-5) -> dict:
    embeds = []
    for i in range(n_layers):
        es = state[f"{prefix}.layers.{i}.codebook.embed_sum"]
        cu = state[f"{prefix}.layers.{i}.codebook.cluster_usage"]
        embeds.append(es / np.maximum(cu, eps)[:, None])
    return {
        "in_proj": np.transpose(state[f"{prefix}.input_proj.weight"][:, :, 0], (1, 0)),
        "out_proj": np.transpose(state[f"{prefix}.output_proj.weight"][:, :, 0], (1, 0)),
        "embed": np.stack(embeds, axis=0),  # [K, codebook_size, dim]
    }


def params_from_hf_state_dict(
    state: Dict[str, np.ndarray], cfg: MimiConfig
) -> MimiParams:
    """Build the JAX param pytree from a kyutai/HF Mimi state dict (numpy)."""
    enc_plan = build_encoder_plan(cfg)
    dec_plan = build_decoder_plan(cfg)
    q = "quantizer"
    return {
        "encoder": _seanet_params(state, enc_plan, "encoder"),
        "encoder_transformer": _transformer_params(
            state, "encoder_transformer", cfg.num_hidden_layers
        ),
        "downsample": _conv_w(state, "downsample.conv.weight", "downsample.conv.bias"),
        "upsample": _convtr_w(
            state, "upsample.conv.weight", "upsample.conv.bias", groups=cfg.upsample_groups
        ),
        "decoder_transformer": _transformer_params(
            state, "decoder_transformer", cfg.num_hidden_layers
        ),
        "decoder": _seanet_params(state, dec_plan, "decoder"),
        "quantizer": {
            "semantic": _rvq_side(
                state, f"{q}.semantic_residual_vector_quantizer", cfg.num_semantic_quantizers
            ),
            "acoustic": _rvq_side(
                state,
                f"{q}.acoustic_residual_vector_quantizer",
                cfg.num_quantizers - cfg.num_semantic_quantizers,
            ),
        },
    }


def init_mimi_params(cfg: MimiConfig, seed: int = 0, dtype=jnp.float32) -> MimiParams:
    """Random-init Mimi params with the correct shapes (for benchmarks and
    tests without a checkpoint; real weights come from `load_mimi`)."""
    rng = np.random.default_rng(seed)

    def conv_p(spec_in, spec_out, k, bias=True, scale=None):
        scale = scale or (1.0 / np.sqrt(max(spec_in * k, 1)))
        p = {"w": rng.standard_normal((k, spec_in, spec_out)).astype(np.float32) * scale}
        if bias:
            p["b"] = np.zeros((spec_out,), np.float32)
        return p

    def seanet_p(plan):
        out = []
        for spec in plan:
            if spec.kind == "elu":
                out.append(None)
            elif spec.kind in ("conv", "convtr"):
                out.append(conv_p(spec.in_ch, spec.out_ch, spec.kernel))
            else:  # resnet
                out.append(
                    {
                        "conv1": conv_p(spec.in_ch, spec.res_hidden, spec.res_kernel),
                        "conv2": conv_p(spec.res_hidden, spec.out_ch, 1),
                    }
                )
        return out

    d, ff = cfg.hidden_size, cfg.intermediate_size
    L = cfg.num_hidden_layers
    s = 1.0 / np.sqrt(d)

    def tf_p():
        return {
            "layers": {
                "ln1_w": np.ones((L, d), np.float32),
                "ln1_b": np.zeros((L, d), np.float32),
                "ln2_w": np.ones((L, d), np.float32),
                "ln2_b": np.zeros((L, d), np.float32),
                "wq": rng.standard_normal((L, d, d)).astype(np.float32) * s,
                "wk": rng.standard_normal((L, d, d)).astype(np.float32) * s,
                "wv": rng.standard_normal((L, d, d)).astype(np.float32) * s,
                "wo": rng.standard_normal((L, d, d)).astype(np.float32) * s,
                "fc1": rng.standard_normal((L, d, ff)).astype(np.float32) * s,
                "fc2": rng.standard_normal((L, ff, d)).astype(np.float32) / np.sqrt(ff),
                "scale_attn": np.full((L, d), cfg.layer_scale_initial_scale, np.float32),
                "scale_mlp": np.full((L, d), cfg.layer_scale_initial_scale, np.float32),
            }
        }

    def rvq_side(n):
        return {
            "in_proj": rng.standard_normal((d, cfg.codebook_dim)).astype(np.float32) * s,
            "out_proj": rng.standard_normal((cfg.codebook_dim, d)).astype(np.float32)
            / np.sqrt(cfg.codebook_dim),
            "embed": rng.standard_normal(
                (n, cfg.codebook_size, cfg.codebook_dim)
            ).astype(np.float32),
        }

    K = cfg.downsample_kernel
    params: MimiParams = {
        "encoder": seanet_p(build_encoder_plan(cfg)),
        "encoder_transformer": tf_p(),
        "downsample": conv_p(d, d, K, bias=False),
        "upsample": {"w": rng.standard_normal((K, 1, d)).astype(np.float32) * 0.5},
        "decoder_transformer": tf_p(),
        "decoder": seanet_p(build_decoder_plan(cfg)),
        "quantizer": {
            "semantic": rvq_side(cfg.num_semantic_quantizers),
            "acoustic": rvq_side(cfg.num_quantizers - cfg.num_semantic_quantizers),
        },
    }
    if dtype is not None:
        params = jax.tree.map(lambda a: jnp.asarray(a, dtype), params)
    return params


def load_mimi(
    path: Union[str, Path], cfg: Optional[MimiConfig] = None, dtype=None
) -> Tuple[MimiParams, MimiConfig]:
    """Load Mimi weights from a safetensors file (kyutai/mimi `model.safetensors`
    schema, same keys as HF transformers MimiModel)."""
    from safetensors.numpy import load_file

    cfg = cfg or MimiConfig()
    state = load_file(str(path))
    params = params_from_hf_state_dict(state, cfg)
    if dtype is not None:
        params = jax.tree.map(lambda a: jnp.asarray(a, dtype), params)
    return params, cfg


# --------------------------------------------------------------------------
# Batch encode / decode
# --------------------------------------------------------------------------


def mimi_encode(
    params: MimiParams,
    cfg: MimiConfig,
    audio: jnp.ndarray,  # [B, L] or [B, L, 1]
    num_quantizers: Optional[int] = None,
) -> jnp.ndarray:
    """Audio -> codes [B, nq, T] (mlx .../codec/mimi.py:64-71)."""
    if audio.ndim == 2:
        audio = audio[..., None]
    enc_plan = build_encoder_plan(cfg)
    x = seanet_apply(enc_plan, params["encoder"], audio, cfg)
    x = transformer_forward(params["encoder_transformer"], cfg, x)
    x = causal_conv1d(
        x,
        params["downsample"]["w"],
        params["downsample"].get("b"),
        stride=cfg.downsample_stride,
        pad_mode="replicate",
    )
    return split_rvq_encode(x, params["quantizer"], cfg, num_quantizers)


def mimi_decode(
    params: MimiParams, cfg: MimiConfig, codes: jnp.ndarray
) -> jnp.ndarray:
    """codes [B, K, T] -> PCM [B, T * 1920, 1] (mlx .../codec/mimi.py:73-99)."""
    emb = split_rvq_decode(codes, params["quantizer"], cfg)  # [B, T, hidden]
    emb = causal_conv_transpose1d(
        emb,
        params["upsample"]["w"],
        params["upsample"].get("b"),
        stride=cfg.downsample_stride,
        groups=cfg.upsample_groups,
        trim_right_ratio=cfg.trim_right_ratio,
    )
    emb = transformer_forward(params["decoder_transformer"], cfg, emb)
    dec_plan = build_decoder_plan(cfg)
    return seanet_apply(dec_plan, params["decoder"], emb, cfg)


# --------------------------------------------------------------------------
# Streaming decode
# --------------------------------------------------------------------------


class MimiStreamState(NamedTuple):
    upsample_tail: jnp.ndarray
    transformer: TransformerRingState
    decoder: List


def decode_stream_init(
    cfg: MimiConfig,
    batch: int,
    dtype=jnp.float32,
    tail_len: int = 64,
    kv_dtype=None,
) -> MimiStreamState:
    """`kv_dtype=jnp.int8` puts the codec transformer's ring KV in kv8 mode
    (int8 ring + per-vector scales; conv/tail buffers stay `dtype`)."""
    K = cfg.downsample_kernel
    return MimiStreamState(
        upsample_tail=convtr_stream_init(
            batch, cfg.hidden_size, K, cfg.downsample_stride, dtype
        ),
        transformer=ring_state_init(cfg, batch, kv_dtype or dtype, tail_len=tail_len),
        decoder=seanet_stream_init(build_decoder_plan(cfg), batch, dtype),
    )


def reset_stream_slots(state: MimiStreamState, slots: jnp.ndarray) -> MimiStreamState:
    """Zero the streaming state of the given batch slots (new stream admitted
    into a reused decode slot). Slot axis is 0 for conv buffers and ring
    bookkeeping, 1 for the ring KV cache."""

    dec = jax.tree.map(lambda a: a.at[slots].set(0), state.decoder)
    t = state.transformer
    return MimiStreamState(
        upsample_tail=state.upsample_tail.at[slots].set(0),
        transformer=t._replace(
            k=t.k.at[:, slots].set(0),
            v=t.v.at[:, slots].set(0),
            slot_pos=t.slot_pos.at[slots].set(-1),
            tail_abs=t.tail_abs.at[slots].set(-1),
            pos=t.pos.at[slots].set(0),
            k_scale=None if t.k_scale is None else t.k_scale.at[:, slots].set(1.0),
            v_scale=None if t.v_scale is None else t.v_scale.at[:, slots].set(1.0),
        ),
        decoder=dec,
    )


def scatter_stream_state(
    big: MimiStreamState, small: MimiStreamState, slots: jnp.ndarray
) -> MimiStreamState:
    """Write an n-slot streaming state into the given slots of a B-slot state."""
    dec = jax.tree.map(lambda b, s: b.at[slots].set(s), big.decoder, small.decoder)
    bt, st = big.transformer, small.transformer
    # The small state's tail phase may differ from the big state's; flush the
    # small state first so everything it carries lives in its ring.
    st_flushed = flush_transformer_ring(st)
    return MimiStreamState(
        upsample_tail=big.upsample_tail.at[slots].set(small.upsample_tail),
        transformer=bt._replace(
            k=bt.k.at[:, slots].set(st_flushed.k),
            v=bt.v.at[:, slots].set(st_flushed.v),
            slot_pos=bt.slot_pos.at[slots].set(st_flushed.slot_pos),
            tail_abs=bt.tail_abs.at[slots].set(-1),
            pos=bt.pos.at[slots].set(st_flushed.pos),
            k_scale=None
            if bt.k_scale is None
            else bt.k_scale.at[:, slots].set(st_flushed.k_scale),
            v_scale=None
            if bt.v_scale is None
            else bt.v_scale.at[:, slots].set(st_flushed.v_scale),
        ),
        decoder=dec,
    )


def flush_mimi_state(state: MimiStreamState) -> MimiStreamState:
    """Consolidate the codec transformer's ring tail (see
    transformer.flush_transformer_ring). Callers driving mimi_decode_step in
    a loop must flush before the tail wraps: at most every
    tail_len // (frames_per_step * 2) steps (2 transformer tokens per 80 ms
    frame)."""
    return state._replace(transformer=flush_transformer_ring(state.transformer))


def mimi_decode_step(
    params: MimiParams,
    cfg: MimiConfig,
    state: MimiStreamState,
    codes: jnp.ndarray,  # [B, K, T_frames] — typically T_frames == 1
) -> Tuple[MimiStreamState, jnp.ndarray]:
    """Streaming decode of one (or more) 12.5 Hz frames -> PCM
    [B, T_frames * 1920, 1]. Streaming output equals batch `mimi_decode`
    (the property the reference checks by ear in tests/test_decoder.py,
    asserted in tests/test_mimi_parity.py)."""
    emb = split_rvq_decode(codes, params["quantizer"], cfg)
    up_tail, emb = convtr_stream_step(
        state.upsample_tail,
        emb,
        params["upsample"]["w"],
        params["upsample"].get("b"),
        stride=cfg.downsample_stride,
        groups=cfg.upsample_groups,
    )
    tstate, emb = transformer_stream_step(
        params["decoder_transformer"], cfg, state.transformer, emb
    )
    dec_state, pcm = seanet_stream_step(
        build_decoder_plan(cfg), params["decoder"], state.decoder, emb
    )
    return MimiStreamState(up_tail, tstate, dec_state), pcm
