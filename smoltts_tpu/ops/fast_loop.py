"""Fused fast-transformer micro-loop: the whole 8-step x 4-layer frame in ONE
Pallas kernel with weights resident in VMEM.

Why: the decode frame's fast loop is sequential over codebook levels —
step i+1's input is the embedding of step i's SAMPLED code — so XLA re-reads
every fast-layer weight from HBM at every micro-step: at 150M that's
~8 x 35 MB int8 ~ 280 MB of HBM traffic per frame, the single largest decode
cost (smoltts_tpu/lm/decode.py:_fast_micro_loop). v5e's large VMEM fits the
int8 fast trunk + depthwise head + bf16 embedding table (~75 MB) for the
entire frame, cutting fast-loop HBM traffic ~4x. The reference runs this loop
as 8 host-synced dispatches (mlx .../lm/generate.py:113-141).

Kernel design notes (Mosaic-friendly: everything stays [batch, lanes] 2-D):
- Per-head structure is expressed as matmuls with constant 0/1 matrices
  instead of lane<->sublane reshapes: pair-swap for traditional RoPE,
  group-sum [D, H] for attention scores, head-expand [H, D] / [KV*hd, D]
  for GQA broadcast.
- The 8-slot KV cache lives in VMEM scratch; attention is unrolled over the
  (max 8) cached steps with an i-mask.
- Sampling runs in-kernel: temperature + min-p via Gumbel-max over the
  codebook logits (pltpu.prng_*), argmax when temperature == 0. The Gumbel
  stream differs from the XLA path's jax.random.categorical — same
  distribution, different draws (greedy is equivalent modulo fp association).
- int8 weights (ops/quant.py QTensor) are dequantized into the dots (cast
  fused by Mosaic); scales apply to the f32 results.

Supported shapes: the released DualAR family — depthwise_wte +
depthwise_output + duplicate_code_0, no fast qkv bias, int8-quantized fast
trunk/head. Anything else falls back to the XLA loop (decode.py handles the
dispatch); exactness vs the XLA loop is pinned by tests/test_fast_loop.py.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from smoltts_tpu.config import DualARConfig
from smoltts_tpu.ops.quant import QTensor


def supports_fused_fast(cfg: DualARConfig, params: dict) -> bool:
    lp = params.get("fast_layers", {})
    ffn_ok = (
        ("w1" in lp and isinstance(lp["w1"], QTensor))
        # w13-fused trees (ops/quant.py::fuse_decode_params) are split back
        # into w1/w3 views in fused_fast_micro_loop — exact, since the fused
        # concat is along the per-output-channel axis.
        or ("w13" in lp and isinstance(lp["w13"], QTensor))
    )
    return bool(
        cfg.depthwise_wte
        and cfg.depthwise_output
        and cfg.duplicate_code_0
        and not cfg.fast_attention_qkv_bias
        and isinstance(lp.get("wqkv"), QTensor)
        and ffn_ok
        and isinstance(params.get("fast_output"), QTensor)
        and cfg.fast_n_head % cfg.fast_n_local_heads == 0
        and cfg.fast_head_dim % 2 == 0
    )


@functools.lru_cache(maxsize=8)
def _structure_constants(D: int, H: int, KV: int, hd: int):
    """Constant 0/1 matrices expressing head structure as matmuls.

    Cached as NUMPY (host) arrays: the cache is shared across jit traces, and
    caching traced jnp values would leak tracers."""
    # pair swap within each (2t, 2t+1) lane pair (traditional RoPE)
    perm = np.arange(D)
    perm = perm.reshape(-1, 2)[:, ::-1].reshape(-1)
    P = np.zeros((D, D), np.float32)
    P[perm, np.arange(D)] = 1.0
    # per-head lane-group sum [D, H]
    G = np.zeros((D, H), np.float32)
    G[np.arange(D), np.arange(D) // hd] = 1.0
    # kv-head lanes -> full-head lanes (GQA broadcast) [KV*hd, D]
    Ek = np.zeros((KV * hd, D), np.float32)
    d = np.arange(D)
    Ek[(d // hd // (H // KV)) * hd + d % hd, d] = 1.0
    return P, G, Ek


def _rope_tables(cfg: DualARConfig) -> tuple:
    """cosv/sgnsin [n, D]: per-step lane tables with the rotation sign folded
    into sin (even lane of a pair: -sin; odd: +sin)."""
    from smoltts_tpu.models.layers import rope_cos_sin

    n, D, hd = cfg.max_fast_seqlen, cfg.fast_dim, cfg.fast_head_dim
    cos, sin = rope_cos_sin(jnp.arange(n), hd, cfg.rope_base)  # [n, hd//2] bf16
    cos = jnp.repeat(cos.astype(jnp.float32), 2, axis=-1)  # duplicate per pair
    sin = jnp.repeat(sin.astype(jnp.float32), 2, axis=-1)
    sgn = jnp.tile(jnp.asarray([-1.0, 1.0], jnp.float32), hd // 2)
    cosv = jnp.tile(cos, (1, cfg.fast_n_head))
    sgnsin = jnp.tile(sin * sgn, (1, cfg.fast_n_head))
    return cosv, sgnsin  # [n, D] f32


def _kernel(cfg: DualARConfig, B: int, temp: float, min_p: Optional[float],
            cdt, hidden_ref, wqkv_q, wqkv_s, wo_q, wo_s, w1_q, w1_s, w3_q, w3_s,
            w2_q, w2_s, anorm, fnorm, fast_norm, wte, head_q, head_s,
            cosv_ref, sgnsin_ref, P_ref, G_ref, Ek_ref, seed_ref,
            codes_ref, k_scr, v_scr):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    D, H, hd = cfg.fast_dim, cfg.fast_n_head, cfg.fast_head_dim
    KV, F, CB = cfg.fast_n_local_heads, cfg.fast_intermediate_size, cfg.codebook_size
    L, n = cfg.n_fast_layer, cfg.max_fast_seqlen
    eps, scale = cfg.norm_eps, hd ** -0.5

    if temp > 0.0:
        pltpu.prng_seed(seed_ref[0, 0])

    def rms(x, w):
        var = jnp.mean(x * x, axis=-1, keepdims=True)
        return x * jax.lax.rsqrt(var + eps) * w[None, :].astype(jnp.float32)

    def qdot(x, q_ref, s_ref, l):
        # `cdt` is the compute dtype (the XLA path dots in the activations'
        # dtype, ops/quant.py::mm — bf16 in production, f32 in parity tests)
        y = jnp.dot(
            x.astype(cdt), q_ref[l].astype(cdt),
            preferred_element_type=jnp.float32,
        )
        return y * s_ref[l]

    P = P_ref[:]
    G = G_ref[:]
    Ek = Ek_ref[:]

    x = hidden_ref[:].astype(jnp.float32)  # [B, D]
    for i in range(n):
        cos_i = cosv_ref[i][None, :]
        sgnsin_i = sgnsin_ref[i][None, :]

        def rope(t):
            sw = jnp.dot(t.astype(cdt), P.astype(cdt), preferred_element_type=jnp.float32)
            return t * cos_i + sw * sgnsin_i

        h = x
        for l in range(L):
            hn = rms(h, anorm[l])
            qkv = qdot(hn, wqkv_q, wqkv_s, l)  # [B, D + 2*KV*hd]
            q = rope(qkv[:, :D])
            k = qkv[:, D : D + KV * hd]
            v = qkv[:, D + KV * hd :]
            k = rope(jnp.dot(k.astype(cdt), Ek.astype(cdt),
                             preferred_element_type=jnp.float32))
            v = jnp.dot(v.astype(cdt), Ek.astype(cdt),
                        preferred_element_type=jnp.float32)
            k_scr[l, i] = k
            v_scr[l, i] = v

            # attention over cached steps 0..i (static unroll, tiny dims)
            neg = jnp.float32(-1e30)
            scores = []
            for j in range(n):
                if j <= i:
                    s_j = jnp.dot(q * k_scr[l, j], G,
                                  preferred_element_type=jnp.float32) * scale
                else:
                    s_j = jnp.full((B, H), neg, jnp.float32)
                scores.append(s_j)  # [B, H]
            m = scores[0]
            for s_j in scores[1:]:
                m = jnp.maximum(m, s_j)
            exps = [jnp.exp(s_j - m) for s_j in scores]
            denom = exps[0]
            for e in exps[1:]:
                denom = denom + e
            att = jnp.zeros((B, D), jnp.float32)
            for j in range(i + 1):
                p_j = exps[j] / denom  # [B, H]
                att = att + jnp.dot(p_j, G.T, preferred_element_type=jnp.float32) * v_scr[l, j]
            h = h + qdot(att, wo_q, wo_s, l)

            hn = rms(h, fnorm[l])
            gate = qdot(hn, w1_q, w1_s, l)
            up = qdot(hn, w3_q, w3_s, l)
            act = (jax.nn.silu(gate) * up).astype(cdt)
            mlp = jnp.dot(act, w2_q[l].astype(cdt),
                          preferred_element_type=jnp.float32) * w2_s[l]
            h = h + mlp

        fo = rms(h, fast_norm[:])
        logits = jnp.dot(fo.astype(cdt), head_q[i].astype(cdt),
                         preferred_element_type=jnp.float32) * head_s[i]  # [B, CB]

        if temp > 0.0:
            scaled = logits / temp
            if min_p is not None:
                thr = jnp.max(scaled, axis=-1, keepdims=True) + math.log(min_p)
                scaled = jnp.where(scaled >= thr, scaled, jnp.float32(-1e30))
            bits = pltpu.prng_random_bits((B, CB))
            # top 24 bits -> uniform (0,1); go through int32 (always positive
            # after the shift) — Mosaic has no uint32->f32 cast
            u24 = pltpu.bitcast(pltpu.bitcast(bits, jnp.uint32) >> 8, jnp.int32)
            u = u24.astype(jnp.float32) * jnp.float32(1.0 / (1 << 24)) + jnp.float32(1e-12)
            gumbel = -jnp.log(-jnp.log(u))
            code = jnp.argmax(scaled + gumbel, axis=-1).astype(jnp.int32)
        else:
            code = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        codes_ref[i, :] = code

        if i + 1 < n:
            # re-embed: one-hot matmul against the depthwise table slice
            # (duplicate_code_0: level offset i * CB; decode.py:431-436)
            cols = jax.lax.broadcasted_iota(jnp.int32, (B, CB), 1)
            onehot = (cols == code[:, None]).astype(cdt)
            x = jnp.dot(onehot, wte[i * CB : (i + 1) * CB].astype(cdt),
                        preferred_element_type=jnp.float32)


def fused_fast_micro_loop(
    params: dict,
    cfg: DualARConfig,
    hidden: jnp.ndarray,  # [B, dim] pre-norm slow output
    rng: jax.Array,
    settings,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in replacement for decode._fast_micro_loop. Returns [B, n]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from smoltts_tpu.models.dual_ar import project_fast_in

    D, H, hd = cfg.fast_dim, cfg.fast_n_head, cfg.fast_head_dim
    KV, n, L = cfg.fast_n_local_heads, cfg.max_fast_seqlen, cfg.n_fast_layer
    B = hidden.shape[0]
    Bp = max(8, B)  # f32 sublane tile

    x0 = project_fast_in(params, cfg, hidden)
    if Bp != B:
        x0 = jnp.pad(x0, ((0, Bp - B), (0, 0)))

    lp = params["fast_layers"]
    if "w13" in lp:
        # Split the decode-fused gate/up weight back into w1/w3 views: the
        # fusion concatenates along the output-channel axis, so slicing q and
        # its per-output-channel scale is bit-exact (ops/quant.py::_concat_w).
        w13: QTensor = lp["w13"]
        F = w13.q.shape[-1] // 2
        lp = dict(lp)
        lp["w1"] = QTensor(q=w13.q[..., :F], scale=w13.scale[..., :F])
        lp["w3"] = QTensor(q=w13.q[..., F:], scale=w13.scale[..., F:])
    head: QTensor = params["fast_output"]
    cosv, sgnsin = _rope_tables(cfg)
    P_np, G_np, Ek_np = _structure_constants(D, H, KV, hd)
    P = jnp.asarray(P_np, jnp.bfloat16)
    G, Ek = jnp.asarray(G_np), jnp.asarray(Ek_np)
    seed = jax.random.bits(rng, (1, 1), jnp.uint32).astype(jnp.int32)

    temp = float(settings.default_fast_temp or 0.0)
    cdt = hidden.dtype  # compute dtype matches the XLA path's activations
    kern = functools.partial(_kernel, cfg, Bp, temp, settings.min_p, cdt)

    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    codes = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n, Bp), jnp.int32),
        in_specs=[vspec] * 22
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=vspec,
        scratch_shapes=[
            pltpu.VMEM((L, n, Bp, D), jnp.float32),
            pltpu.VMEM((L, n, Bp, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        x0,
        lp["wqkv"].q, lp["wqkv"].scale,
        lp["wo"].q, lp["wo"].scale,
        lp["w1"].q, lp["w1"].scale,
        lp["w3"].q, lp["w3"].scale,
        lp["w2"].q, lp["w2"].scale,
        lp["attention_norm"], lp["ffn_norm"], params["fast_norm"],
        params["fast_embeddings"],
        head.q, head.scale,
        cosv, sgnsin, P, G, Ek,
        seed,
    )
    return codes.T[:B]  # [B, n]
