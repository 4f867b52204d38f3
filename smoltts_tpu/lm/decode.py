"""KV-cached DualAR decoding: prefill + per-frame step, TPU-first.

Behavioral spec is the reference's single-stream iterator
(mlx .../lm/generate.py:59-171 and lm/rq_transformer.py:173-220), re-designed
for XLA:

- Preallocated KV caches written in place via dynamic_update_slice (the
  reference concat-grows its cache per token, cache.py:6-33).
- The fast 8-step micro-loop is a single `lax.scan` inside the jitted frame
  step — one dispatch per frame instead of the reference's 9 host syncs
  (SURVEY.md §3.3).
- Everything is batched over B decode slots with per-slot positions and
  finished flags, so continuous batching is a host-side slot manager, not a
  model change.

State is an explicit pytree (donated between steps); there is no host state
inside jitted functions.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from smoltts_tpu.config import DualARConfig
from smoltts_tpu.ops.quant import mm, qindex
from smoltts_tpu.lm.samplers import (
    GenerationSettings,
    constrain_logits_to_audio,
    sample_token,
)
from smoltts_tpu.models.dual_ar import (
    embed_merge,
    fast_dims,
    project_fast_in,
    slow_dims,
    token_head,
)
from smoltts_tpu.models.layers import (
    AttnDims,
    apply_rope,
    rms_norm,
    rope_cos_sin,
    split_qkv,
    swiglu,
)
from smoltts_tpu.tokenizer import TokenConfig


class DecodeState(NamedTuple):
    """Per-slot decoding state for B concurrent streams.

    The KV cache is split into a big frozen HISTORY (`k`/`v`) and a small
    ring TAIL (`k_tail`/`v_tail`). The per-frame step writes only the tail —
    at a single global ring column (`phase`), a dynamic_update_slice — so the
    history is a pure input of the step program and is never copied at the
    jit boundary (without donation XLA must otherwise materialize a fresh
    ~0.7 GB cache copy every 80 ms frame; donation itself is pathological
    through tunneled runtimes). `flush_kv` consolidates the tail into the
    history at most every `W` frames; callers must flush before the ring
    wraps (FrameGenerator / DecodeEngine / the chunked pipeline do).

    `tail_pos[b, c]` is the cache position held by tail column c for slot b
    (-1 = empty); `flushed[b]` is the history's valid length.
    """

    k: jnp.ndarray  # [n_layer, B, n_kv_head, S, head_dim] (head-major) history
    v: jnp.ndarray  # [n_layer, B, n_kv_head, S, head_dim]
    k_tail: jnp.ndarray  # [n_layer, B, n_kv_head, W, head_dim] ring tail
    v_tail: jnp.ndarray  # [n_layer, B, n_kv_head, W, head_dim]
    tail_pos: jnp.ndarray  # [B, W] int32 — cache position per tail column (-1 empty)
    flushed: jnp.ndarray  # [B] int32 — history valid length
    phase: jnp.ndarray  # [] int32 — next tail write column (global, wraps mod W)
    pos: jnp.ndarray  # [B] int32 — number of cached tokens == next write slot
    prev_tokens: jnp.ndarray  # [B, num_rows] int32 — frame fed to next step
    finished: jnp.ndarray  # [B] bool
    # kv8 mode (init_decode_state(kv_dtype=jnp.int8)): the HISTORY is int8
    # with per-vector scales (ops/quant.py::quantize_kv) — attention reads
    # halve their HBM traffic — while the hot-path tails stay bf16.
    # Quantization happens only at the prefill/flush boundary. None in the
    # default bf16 mode.
    k_scale: Optional[jnp.ndarray] = None  # [n_layer, B, n_kv_head, S] f32
    v_scale: Optional[jnp.ndarray] = None

    @property
    def tail_len(self) -> int:
        return self.k_tail.shape[3]


class FrameOutput(NamedTuple):
    tokens: jnp.ndarray  # [B, num_rows] int32 — next slow-model input frame
    audio_codes: jnp.ndarray  # [B, num_codebooks] int32 — Mimi codes
    slow_token: jnp.ndarray  # [B] int32
    is_audio: jnp.ndarray  # [B] bool — frame carries valid audio
    finished: jnp.ndarray  # [B] bool — stream has emitted <|im_end|>


def init_decode_state(
    cfg: DualARConfig,
    batch_size: int,
    max_seq_len: Optional[int] = None,
    dtype=jnp.bfloat16,
    tail_len: int = 128,
) -> DecodeState:
    """`dtype=jnp.int8` selects kv8 mode: int8 history + f32 per-vector
    scales (tails stay bf16 — they're written on the hot path and
    consolidated, quantizing, at flush)."""
    S = max_seq_len or cfg.max_seq_len
    kv8 = dtype == jnp.int8
    tail_dtype = jnp.bfloat16 if kv8 else dtype
    kv_shape = (cfg.n_layer, batch_size, cfg.n_local_heads, S, cfg.head_dim)
    tail_shape = (cfg.n_layer, batch_size, cfg.n_local_heads, tail_len, cfg.head_dim)
    return DecodeState(
        k=jnp.zeros(kv_shape, dtype),
        v=jnp.zeros(kv_shape, dtype),
        k_tail=jnp.zeros(tail_shape, tail_dtype),
        v_tail=jnp.zeros(tail_shape, tail_dtype),
        tail_pos=jnp.full((batch_size, tail_len), -1, jnp.int32),
        flushed=jnp.zeros((batch_size,), jnp.int32),
        phase=jnp.zeros((), jnp.int32),
        pos=jnp.zeros((batch_size,), jnp.int32),
        prev_tokens=jnp.zeros((batch_size, cfg.num_rows), jnp.int32),
        finished=jnp.zeros((batch_size,), bool),
        k_scale=jnp.ones(kv_shape[:-1], jnp.float32) if kv8 else None,
        v_scale=jnp.ones(kv_shape[:-1], jnp.float32) if kv8 else None,
    )


def flush_kv(state: DecodeState) -> DecodeState:
    """Consolidate the ring tail into the history cache.

    Scatters every valid tail entry to its cache position and resets the
    ring. This program DOES copy the history at the jit boundary (~ the cost
    of one pre-split frame step), so callers amortize it: at most once per
    `tail_len` frames. Decode results are bit-identical with or without
    intermediate flushes (tests/test_decode.py::test_flush_equivalence).
    """
    S = state.k.shape[3]
    valid = (
        (state.tail_pos >= 0)
        & (state.tail_pos >= state.flushed[:, None])
        & (state.tail_pos < state.pos[:, None])
    )  # [B, W]
    idx = jnp.where(valid, state.tail_pos, S)  # OOB rows are dropped

    def flush_one(hist_b, tail_b, idx_w):
        # hist_b [L, H, S, ...]; tail_b [L, H, W, ...]; idx_w [W]
        return hist_b.at[:, :, idx_w].set(tail_b, mode="drop")

    scatter = jax.vmap(flush_one, in_axes=(1, 1, 0), out_axes=1)
    updates = {}
    if state.k_scale is not None:
        # kv8: quantize the bf16 tail entries as they enter the history.
        from smoltts_tpu.ops.quant import quantize_kv

        kq, ks = quantize_kv(state.k_tail)
        vq, vs = quantize_kv(state.v_tail)
        updates["k"] = scatter(state.k, kq, idx)
        updates["v"] = scatter(state.v, vq, idx)
        updates["k_scale"] = scatter(state.k_scale, ks, idx)
        updates["v_scale"] = scatter(state.v_scale, vs, idx)
    else:
        updates["k"] = scatter(state.k, state.k_tail, idx)
        updates["v"] = scatter(state.v, state.v_tail, idx)
    return state._replace(
        tail_pos=jnp.full_like(state.tail_pos, -1),
        flushed=state.pos,
        phase=jnp.zeros_like(state.phase),
        **updates,
    )


def _mlp(hn: jnp.ndarray, lp: dict) -> jnp.ndarray:
    """SwiGLU that takes the fused gate/up weight when present
    (ops/quant.py::fuse_decode_params — one [dim, 2*ffn] dot instead of two,
    bit-exact)."""
    if "w13" in lp:
        y = mm(hn, lp["w13"])
        a, b = jnp.split(y, 2, axis=-1)
        return mm(jax.nn.silu(a) * b, lp["w2"])
    return swiglu(hn, lp["w1"], lp["w3"], lp["w2"])


# --------------------------------------------------------------------------
# Cached attention primitives
# --------------------------------------------------------------------------


def _write_kv(
    cache: jnp.ndarray,
    new: jnp.ndarray,
    pos: jnp.ndarray,
    scale_cache: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Write new [B, T, H, hd] into cache [B, H, S, hd] at per-slot positions.

    T == 1 (the decode hot path) uses a single batched scatter — a vmapped
    dynamic_update_slice lowers to a while-loop over the batch (~70 us/layer
    on v5e). Prefill (T > 1) keeps the vmapped slice write.

    With `scale_cache` ([B, H, S], kv8 mode) the new entries are quantized
    per vector and both caches are written.
    """
    new = new.transpose(0, 2, 1, 3)  # [B, H, T, hd]
    B = cache.shape[0]
    if scale_cache is not None:
        from smoltts_tpu.ops.quant import quantize_kv

        new, new_scale = quantize_kv(new)  # int8 [B,H,T,hd], f32 [B,H,T]
    if new.shape[2] == 1:
        cache = cache.at[jnp.arange(B), :, pos].set(new[:, :, 0].astype(cache.dtype))
        if scale_cache is not None:
            scale_cache = scale_cache.at[jnp.arange(B), :, pos].set(new_scale[:, :, 0])
        return cache, scale_cache

    def write_one(c, n, p):
        return jax.lax.dynamic_update_slice(c, n.astype(c.dtype), (0, p, 0))

    cache = jax.vmap(write_one)(cache, new, pos)
    if scale_cache is not None:
        scale_cache = jax.vmap(
            lambda c, n, p: jax.lax.dynamic_update_slice(c, n, (0, p))
        )(scale_cache, new_scale, pos)
    return cache, scale_cache


def _decode_trunk(
    layer_params: dict,
    x: jnp.ndarray,  # [B, T, dim]
    k_cache: jnp.ndarray,  # [L, B, n_kv, S, hd]
    v_cache: jnp.ndarray,
    pos: jnp.ndarray,  # [B] write position of x[:, 0]
    dims: AttnDims,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    *,
    causal_within: bool,
    norm_eps: float,
    attend_limit: Optional[int] = None,
    k_scale: Optional[jnp.ndarray] = None,  # [L, B, n_kv, S] — kv8 mode
    v_scale: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray], Optional[jnp.ndarray]]:
    """Run the cached trunk over T new tokens (T=1 decode, T=prompt prefill).

    Writes k/v at positions pos..pos+T-1 and attends over the whole cache with
    a per-slot validity mask (k index <= pos + query offset).

    `attend_limit` (static) bounds the attention READS to cache positions
    [0, attend_limit): length bucketing. The caller must guarantee
    max(pos) + T <= attend_limit; writes always go to the full cache, so a
    bucket switch is just a different compiled program over the same state.
    At S=1024 this is the dominant decode cost (KV reads are ~950 GB/s
    bandwidth-bound), so early-in-generation buckets run up to 4x faster.

    Returns (h, k_cache, v_cache, k_scale, v_scale) — scales are None unless
    the cache is kv8 (int8 + per-vector scales).
    """
    B, T, _ = x.shape
    S = k_cache.shape[3]
    kv8 = k_scale is not None

    def block(carry, lp_kv):
        h = carry
        if kv8:
            lp, kc, vc, ksc, vsc = lp_kv
        else:
            lp, kc, vc = lp_kv
            ksc = vsc = None
        hn = rms_norm(h, lp["attention_norm"], norm_eps)
        qkv = mm(hn, lp["wqkv"])
        if "wqkv_bias" in lp:
            qkv = qkv + lp["wqkv_bias"]
        q, k, v = split_qkv(qkv, dims)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        kc, ksc = _write_kv(kc, k, pos, ksc)
        vc, vsc = _write_kv(vc, v, pos, vsc)
        if causal_within and T > 1:
            # Prefill runs on FRESH slots (pos == 0): the only attendable
            # history is the T new tokens themselves, so attend over them
            # directly (T x T) instead of scanning the whole S-cache
            # (16x less attention work at T=64, S=1024).
            t_idx = jnp.arange(T)
            causal = t_idx[:, None] >= t_idx[None, :]
            att = _cached_sdpa_multi(
                q,
                k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3),
                jnp.broadcast_to(causal, (B, T, T)),
            )
        else:
            from smoltts_tpu.ops.attention import decode_attention

            kr, vr = kc, vc
            ksr, vsr = ksc, vsc
            if attend_limit is not None and attend_limit < S:
                kr = kc[:, :, :attend_limit]
                vr = vc[:, :, :attend_limit]
                if kv8:
                    ksr = ksc[:, :, :attend_limit]
                    vsr = vsc[:, :, :attend_limit]
            att = decode_attention(q[:, 0], kr, vr, pos, k_scale=ksr, v_scale=vsr)[
                :, None, :
            ]
        h = h + mm(att, lp["wo"])
        hn = rms_norm(h, lp["ffn_norm"], norm_eps)
        h = h + _mlp(hn, lp)
        out = (kc, vc, ksc, vsc) if kv8 else (kc, vc)
        return h, out

    if kv8:
        xs = (layer_params, k_cache, v_cache, k_scale, v_scale)
        x, (k_cache, v_cache, k_scale, v_scale) = jax.lax.scan(block, x, xs)
    else:
        x, (k_cache, v_cache) = jax.lax.scan(block, x, (layer_params, k_cache, v_cache))
    return x, k_cache, v_cache, k_scale, v_scale


def _decode_trunk_tailed(
    layer_params: dict,
    x: jnp.ndarray,  # [B, 1, dim]
    k_hist: jnp.ndarray,  # [L, B, n_kv, S, hd] — read-only
    v_hist: jnp.ndarray,
    k_tail: jnp.ndarray,  # [L, B, n_kv, W, hd]
    v_tail: jnp.ndarray,
    tail_pos: jnp.ndarray,  # [B, W] — already updated with the current column
    flushed: jnp.ndarray,  # [B]
    phase: jnp.ndarray,  # [] — tail column for this token
    pos: jnp.ndarray,  # [B]
    dims: AttnDims,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    *,
    norm_eps: float,
    attend_limit: Optional[int] = None,
    k_scale: Optional[jnp.ndarray] = None,  # [L, B, n_kv, S] — kv8 history scales
    v_scale: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Single-token trunk over the split (history + ring-tail) cache.

    History is consumed read-only; per-layer K/V go to the tail at the
    shared scalar column `phase`. Returns (h, k_tail', v_tail'); the history
    is untouched, so the calling jit program passes it through without a
    boundary copy.

    The layer loop is UNROLLED (a Python loop over static layer indices):
    under lax.scan the tail would be scan xs/ys, and every iteration's
    slice-out/DUS/slice-back round-trips the whole per-layer tail through
    HBM (~2 ms/step at B=64 measured in the profiler). Unrolled, each layer
    issues one single-column dynamic_update_slice on the stacked tail, which
    XLA performs in place.
    """
    from smoltts_tpu.ops.attention import decode_attention_tailed

    B = x.shape[0]
    L = k_hist.shape[0]
    S = k_hist.shape[3]
    lim = S if attend_limit is None else min(attend_limit, S)

    h = x
    for l in range(L):
        lp = jax.tree.map(lambda a: a[l], layer_params)
        hn = rms_norm(h, lp["attention_norm"], norm_eps)
        qkv = mm(hn, lp["wqkv"])
        if "wqkv_bias" in lp:
            qkv = qkv + lp["wqkv_bias"]
        q, k, v = split_qkv(qkv, dims)  # [B, 1, H, hd]
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        k_tail = jax.lax.dynamic_update_slice(
            k_tail,
            k.transpose(0, 2, 1, 3)[None].astype(k_tail.dtype),
            (l, 0, 0, phase, 0),
        )
        v_tail = jax.lax.dynamic_update_slice(
            v_tail,
            v.transpose(0, 2, 1, 3)[None].astype(v_tail.dtype),
            (l, 0, 0, phase, 0),
        )
        att = decode_attention_tailed(
            q[:, 0],
            k_hist[l, :, :, :lim],
            v_hist[l, :, :, :lim],
            k_tail[l],
            v_tail[l],
            pos,
            flushed,
            tail_pos,
            k_scale=None if k_scale is None else k_scale[l, :, :, :lim],
            v_scale=None if v_scale is None else v_scale[l, :, :, :lim],
        )[:, None, :]
        h = h + mm(att, lp["wo"])
        hn = rms_norm(h, lp["ffn_norm"], norm_eps)
        h = h + _mlp(hn, lp)
    return h, k_tail, v_tail


def _cached_sdpa_multi(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, valid_bqk: jnp.ndarray
) -> jnp.ndarray:
    """Multi-query attention over the head-major cache with a per-query mask
    [B, Tq, S] (prefill)."""
    B, Tq, n_head, hd = q.shape
    n_kv = k.shape[1]
    group = n_head // n_kv
    qg = q.reshape(B, Tq, n_kv, group, hd)
    logits = jnp.einsum(
        "bqhgd,bhkd->bhgqk", qg, k, preferred_element_type=jnp.float32
    ) * (hd**-0.5)
    logits = jnp.where(valid_bqk[:, None, None, :, :], logits, -jnp.inf)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhgqk,bhkd->bqhgd", probs, v)
    return out.reshape(B, Tq, n_head * hd)


# --------------------------------------------------------------------------
# Fast (depth) transformer micro-loop
# --------------------------------------------------------------------------


def _fast_micro_loop(
    params: dict,
    cfg: DualARConfig,
    hidden: jnp.ndarray,  # [B, dim] pre-norm slow output at the frame position
    rng: jax.Array,
    settings: GenerationSettings,
) -> jnp.ndarray:
    """Autoregressively sample the codebook levels for one frame.

    Equivalent to the reference's 8 × forward_generate_fast host loop
    (lm/generate.py:113-141) fused into one lax.scan. Returns [B, n] codes.
    """
    import os

    from smoltts_tpu.ops.fast_loop import fused_fast_micro_loop, supports_fused_fast

    # Fused Pallas frame kernel (ops/fast_loop.py): weights stay resident in
    # VMEM across all 8 micro-steps instead of being re-streamed from HBM per
    # step (standalone A/B on v5e at 150M/B=64: 0.97-1.06 ms vs 1.03-1.65 ms
    # per frame for the XLA loop, bit-exact greedy). OPT-IN
    # (SMOLTTS_FUSED_FAST=1): on this environment's tunneled runtime,
    # embedding the kernel inside the large fused pipeline programs wedges
    # the remote-compile service (standalone compiles are fine, 3/3) — flip
    # the default on a standard TPU host.
    if os.environ.get("SMOLTTS_FUSED_FAST") == "1" and supports_fused_fast(cfg, params):
        return fused_fast_micro_loop(params, cfg, hidden, rng, settings)

    B = hidden.shape[0]
    n = cfg.max_fast_seqlen
    fdims = fast_dims(cfg)
    fcos, fsin = rope_cos_sin(jnp.arange(n), cfg.fast_head_dim, cfg.rope_base)
    x0 = project_fast_in(params, cfg, hidden)[:, None, :]  # [B, 1, fast_dim]

    kv_shape = (cfg.n_fast_layer, B, cfg.fast_n_local_heads, n, cfg.fast_head_dim)
    k0 = jnp.zeros(kv_shape, x0.dtype)
    v0 = jnp.zeros(kv_shape, x0.dtype)
    w_out = params["fast_output"]

    fast_temp = settings.default_fast_temp
    n_idx = jnp.arange(n)

    # Both the 8-step micro-loop and the 4-layer trunk are UNROLLED (static
    # Python loops): at these tiny shapes the lax.scan while-loop overhead
    # and its per-iteration cache slice round-trips dominate the actual
    # compute (~3 ms/frame at B=64 in the profiler; the unrolled form lets
    # XLA chain the single-column cache updates in place). The position `i`
    # is a SCALAR shared by every stream, so each cache write is one
    # dynamic_update_slice (a vmapped per-stream write lowers to thousands
    # of tiny select ops — 5.6 ms/frame on v5e before this specialization).
    group = fdims.n_head // fdims.n_kv_head
    layer_params = [
        jax.tree.map(lambda a: a[l], params["fast_layers"])
        for l in range(cfg.n_fast_layer)
    ]

    x, kc, vc = x0, k0, v0
    codes_list = []
    for i in range(n):
        cos_i, sin_i = fcos[i][None, None], fsin[i][None, None]  # [1,1,half]
        h = x
        for l, lp in enumerate(layer_params):
            hn = rms_norm(h, lp["attention_norm"], cfg.norm_eps)
            qkv = mm(hn, lp["wqkv"])
            if "wqkv_bias" in lp:
                qkv = qkv + lp["wqkv_bias"]
            q, k, v = split_qkv(qkv, fdims)  # [B, 1, H, hd]
            q = apply_rope(q, cos_i, sin_i)
            k = apply_rope(k, cos_i, sin_i)
            kc = jax.lax.dynamic_update_slice(
                kc, k.transpose(0, 2, 1, 3)[None].astype(kc.dtype), (l, 0, 0, i, 0)
            )
            vc = jax.lax.dynamic_update_slice(
                vc, v.transpose(0, 2, 1, 3)[None].astype(vc.dtype), (l, 0, 0, i, 0)
            )
            # Attention over the i+1 cached positions (static slice).
            kcl, vcl = kc[l, :, :, : i + 1], vc[l, :, :, : i + 1]
            qg = q[:, 0].reshape(B, fdims.n_kv_head, group, fdims.head_dim)
            logits = jnp.einsum(
                "bhgd,bhkd->bhgk", qg, kcl, preferred_element_type=jnp.float32
            ) * (fdims.head_dim**-0.5)
            probs = jax.nn.softmax(logits, axis=-1).astype(vcl.dtype)
            att = jnp.einsum("bhgk,bhkd->bhgd", probs, vcl)
            att = att.reshape(B, 1, fdims.n_head * fdims.head_dim)
            h = h + mm(att, lp["wo"])
            hn = rms_norm(h, lp["ffn_norm"], cfg.norm_eps)
            h = h + _mlp(hn, lp)

        fast_out = rms_norm(h[:, 0], params["fast_norm"], cfg.norm_eps)
        w_i = qindex(w_out, i) if cfg.depthwise_output else w_out
        logits = mm(fast_out, w_i).astype(jnp.float32)  # [B, cb]

        rng, sub = jax.random.split(rng)
        if fast_temp is not None and fast_temp > 0:
            code = sample_token(
                logits, sub, temperature=fast_temp, min_p=settings.min_p
            )
        else:
            code = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        codes_list.append(code)

        # Re-embed for the next micro-step. Depthwise tables are offset per
        # position (lm/generate.py:136-140); the final step's embedding is
        # skipped entirely (the reference performs a silent OOB lookup there).
        if i + 1 < n:
            if cfg.depthwise_wte:
                offset = (i if cfg.duplicate_code_0 else i + 1) * cfg.codebook_size
            else:
                offset = 0
            x = params["fast_embeddings"][code + offset][:, None, :]
    return jnp.stack(codes_list, axis=1)  # [B, n]


# --------------------------------------------------------------------------
# Frame assembly
# --------------------------------------------------------------------------


def _frame_from_hidden(
    params: dict,
    cfg: DualARConfig,
    token_cfg: TokenConfig,
    hidden: jnp.ndarray,  # [B, dim]
    token_logits: jnp.ndarray,  # [B, vocab]
    finished: jnp.ndarray,  # [B]
    rng: jax.Array,
    settings: GenerationSettings,
) -> FrameOutput:
    """Sample the semantic token + codebook levels; assemble the next frame
    (lm/generate.py:88-166)."""
    rng_slow, rng_fast = jax.random.split(rng)
    logits = token_logits.astype(jnp.float32)
    if settings.audio_only_constraint:
        logits = constrain_logits_to_audio(
            logits,
            token_cfg.im_end_id,
            token_cfg.semantic_start_id,
            token_cfg.semantic_end_id,
        )
    slow_token = sample_token(
        logits,
        rng_slow,
        temperature=settings.default_temp,
        min_p=settings.min_p,
    )
    # Finished streams keep emitting <|im_end|> deterministically.
    slow_token = jnp.where(finished, token_cfg.im_end_id, slow_token)

    codes = _fast_micro_loop(params, cfg, hidden, rng_fast, settings)  # [B, n]

    frame = jnp.concatenate([slow_token[:, None], codes], axis=1)  # [B, num_rows]

    is_semantic = (slow_token >= token_cfg.semantic_start_id) & (
        slow_token <= (token_cfg.semantic_end_id or token_cfg.semantic_start_id)
    )
    if cfg.duplicate_code_0:
        audio_codes = codes
    else:
        sem_code = slow_token - token_cfg.semantic_start_id
        audio_codes = jnp.concatenate([sem_code[:, None], codes], axis=1)

    new_finished = finished | (slow_token == token_cfg.im_end_id)
    return FrameOutput(
        tokens=frame,
        audio_codes=audio_codes,
        slow_token=slow_token,
        is_audio=is_semantic & ~finished,
        finished=new_finished,
    )


# --------------------------------------------------------------------------
# Prefill and frame step
# --------------------------------------------------------------------------


def prefill(
    params: dict,
    cfg: DualARConfig,
    token_cfg: TokenConfig,
    settings: GenerationSettings,
    state: DecodeState,
    prompt: jnp.ndarray,  # [B, num_rows, T] (right-padded)
    prompt_len: jnp.ndarray,  # [B] true lengths
    rng: jax.Array,
) -> Tuple[DecodeState, FrameOutput]:
    """Process the prompt, fill the KV cache, and emit the FIRST frame
    (the reference folds prefill into the first iterator step,
    lm/generate.py:59-74).

    Requires FRESH slots (state.pos == 0): prefill attention runs over the
    prompt tokens only, not the cache (see _decode_trunk)."""
    B, R, T = prompt.shape
    x = embed_merge(
        params,
        cfg,
        prompt,
        embed_mask_mode="semantic_range",
        semantic_start_id=token_cfg.semantic_start_id,
        semantic_end_id=token_cfg.semantic_end_id or token_cfg.semantic_start_id,
    )
    # Each slot's prompt occupies cache positions pos..pos+T-1 (pos is 0 for a
    # fresh slot); RoPE positions run pos+t.
    positions = state.pos[:, None] + jnp.arange(T)[None, :]
    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_base)
    h, k_cache, v_cache, k_scale, v_scale = _decode_trunk(
        params["layers"],
        x,
        state.k,
        state.v,
        state.pos,
        slow_dims(cfg),
        cos,
        sin,
        causal_within=True,
        norm_eps=cfg.norm_eps,
        k_scale=state.k_scale,
        v_scale=state.v_scale,
    )
    # Gather the last REAL position per slot.
    last_idx = state.pos + prompt_len - 1
    batch_idx = jnp.arange(B)
    rel_idx = prompt_len - 1
    h_last = h[batch_idx, rel_idx]  # [B, dim]
    token_logits = token_head(params, cfg, h_last[:, None, :])[:, 0]

    out = _frame_from_hidden(
        params, cfg, token_cfg, h_last, token_logits, state.finished, rng, settings
    )
    # Prompt K/V went straight to the history; the ring starts empty.
    new_state = state._replace(
        k=k_cache,
        v=v_cache,
        k_scale=k_scale,
        v_scale=v_scale,
        tail_pos=jnp.full_like(state.tail_pos, -1),
        flushed=state.pos + prompt_len,
        phase=jnp.zeros_like(state.phase),
        pos=state.pos + prompt_len,
        prev_tokens=out.tokens,
        finished=out.finished,
    )
    del last_idx
    return new_state, out


def decode_frame(
    params: dict,
    cfg: DualARConfig,
    token_cfg: TokenConfig,
    settings: GenerationSettings,
    state: DecodeState,
    rng: jax.Array,
    attend_limit: Optional[int] = None,
) -> Tuple[DecodeState, FrameOutput]:
    """One 80 ms frame for every live slot: slow step + fast micro-loop
    (the reference's SingleBatchGenerator.__next__, lm/generate.py:59-171).

    `attend_limit` statically bounds attention reads (length bucketing);
    requires max(state.pos) < attend_limit."""
    B = state.prev_tokens.shape[0]
    x = embed_merge(
        params,
        cfg,
        state.prev_tokens[:, :, None],
        embed_mask_mode="semantic_range",
        semantic_start_id=token_cfg.semantic_start_id,
        semantic_end_id=token_cfg.semantic_end_id or token_cfg.semantic_start_id,
    )  # [B, 1, dim]
    cos, sin = rope_cos_sin(state.pos[:, None], cfg.head_dim, cfg.rope_base)
    # Claim the current ring column: tail_pos[:, phase] = pos.
    tail_pos = jax.lax.dynamic_update_slice(
        state.tail_pos, state.pos[:, None], (0, state.phase)
    )
    h, k_tail, v_tail = _decode_trunk_tailed(
        params["layers"],
        x,
        state.k,
        state.v,
        state.k_tail,
        state.v_tail,
        tail_pos,
        state.flushed,
        state.phase,
        state.pos,
        slow_dims(cfg),
        cos,
        sin,
        norm_eps=cfg.norm_eps,
        attend_limit=attend_limit,
        k_scale=state.k_scale,
        v_scale=state.v_scale,
    )
    h_last = h[:, 0]
    token_logits = token_head(params, cfg, h_last[:, None, :])[:, 0]
    out = _frame_from_hidden(
        params, cfg, token_cfg, h_last, token_logits, state.finished, rng, settings
    )
    W = state.tail_len
    new_state = state._replace(
        k_tail=k_tail,
        v_tail=v_tail,
        tail_pos=tail_pos,
        phase=(state.phase + 1) % W,
        pos=state.pos + 1,
        prev_tokens=out.tokens,
        finished=out.finished,
    )
    return new_state, out


# --------------------------------------------------------------------------
# Jitted entry points
# --------------------------------------------------------------------------


def make_decode_fns(cfg: DualARConfig, token_cfg: TokenConfig, settings: GenerationSettings):
    """Build jitted (prefill, decode_frame) closures.

    The decode step takes the KV history as INPUT ONLY and returns a state
    with k/v stripped (a host wrapper splices them back): jit outputs always
    materialize fresh buffers — even pass-through ones — which would copy
    the whole history every frame (see pipeline.py)."""
    pf = jax.jit(partial(prefill, cfg=cfg, token_cfg=token_cfg, settings=settings))

    def df(params, kv, rest, rng):
        state = rest._replace(
            k=kv["k"], v=kv["v"], k_scale=kv["ks"], v_scale=kv["vs"]
        )
        new_state, out = decode_frame(params, cfg, token_cfg, settings, state, rng)
        return new_state._replace(k=None, v=None, k_scale=None, v_scale=None), out

    df = jax.jit(df)

    def prefill_fn(params, state, prompt, prompt_len, rng):
        return pf(params, state=state, prompt=prompt, prompt_len=prompt_len, rng=rng)

    def decode_fn(params, state, rng):
        kv = {"k": state.k, "v": state.v, "ks": state.k_scale, "vs": state.v_scale}
        rest, out = df(
            params, kv, state._replace(k=None, v=None, k_scale=None, v_scale=None), rng
        )
        return (
            rest._replace(
                k=state.k, v=state.v, k_scale=state.k_scale, v_scale=state.v_scale
            ),
            out,
        )

    return prefill_fn, decode_fn
