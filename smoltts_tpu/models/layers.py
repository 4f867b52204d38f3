"""Transformer building blocks, written functionally for JAX/XLA on TPU.

Semantics match the reference Llama-style blocks (modeling/model/
rq_transformer.py:482-641 and mlx .../lm/rq_transformer.py:223-307):
fused wqkv, GQA, traditional (interleaved-pair) RoPE with bf16-cached
cos/sin, RMSNorm in fp32, SwiGLU MLP, causal SDPA with 1/sqrt(head_dim)
scale. Everything here is a pure function over parameter pytrees so it
jits, shards (pjit/GSPMD), and scans cleanly.

Weight layout convention: linear kernels are [in, out] (x @ W); embedding
tables are [rows, dim]. The torch/safetensors importer transposes.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class AttnDims:
    """Static attention dimensions for one trunk."""

    n_head: int
    n_kv_head: int
    head_dim: int
    dim: int

    @property
    def q_size(self) -> int:
        return self.n_head * self.head_dim

    @property
    def kv_size(self) -> int:
        return self.n_kv_head * self.head_dim


# --------------------------------------------------------------------------
# Norm / MLP
# --------------------------------------------------------------------------


def dropout_keep(rng: jax.Array, rate: float, shape) -> jnp.ndarray:
    """Bernoulli(1 - rate) keep mask from the RBG bit generator.

    Mask bits come from `lax.rng_bit_generator` (TPU's fast non-cryptographic
    generator) keyed by the caller's threefry key: drawing threefry bits for
    every attention-probability element costs ~12% of the 150M train step
    (and is recomputed under remat), while RBG bits are near-free. The keep
    distribution is identical — iid Bernoulli via a uint32 threshold compare
    — only the bit-stream differs, which is already the contract for dropout
    here (sdpa_blockwise draws different bits than eager sdpa)."""
    kd = jax.random.key_data(rng).reshape(-1).astype(jnp.uint32)
    key4 = jnp.concatenate([kd, kd])[:4] if kd.size < 4 else kd[:4]
    _, bits = jax.lax.rng_bit_generator(
        key4, shape, dtype=jnp.uint32, algorithm=jax.lax.RandomAlgorithm.RNG_DEFAULT
    )
    threshold = jnp.uint32(min(int(round((1.0 - rate) * 2**32)), 2**32 - 1))
    return bits < threshold


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    """RMSNorm computed in fp32, cast back (rq_transformer.py:601-613)."""
    xf = x.astype(jnp.float32)
    normed = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return normed.astype(x.dtype) * weight


def swiglu(x: jnp.ndarray, w1, w3, w2) -> jnp.ndarray:
    """SwiGLU FFN: w2(silu(x w1) * (x w3)) (rq_transformer.py:573-582).

    Weights may be plain arrays or int8 QTensors (ops/quant.py)."""
    from smoltts_tpu.ops.quant import mm

    return mm(jax.nn.silu(mm(x, w1)) * mm(x, w3), w2)


# --------------------------------------------------------------------------
# RoPE (traditional / interleaved-pair form)
# --------------------------------------------------------------------------


def rope_cos_sin(
    positions: jnp.ndarray, head_dim: int, base: float, dtype=jnp.bfloat16
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables for the given positions, shape [*pos, head_dim//2].

    Computed in fp32 then cast to bf16, matching the reference's bf16
    freqs_cis cache (rq_transformer.py:616-624) bit-for-bit at load.
    """
    inv_freq = 1.0 / (
        base ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    angles = positions.astype(jnp.float32)[..., None] * inv_freq
    return jnp.cos(angles).astype(dtype), jnp.sin(angles).astype(dtype)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Traditional RoPE on interleaved pairs (x0,x1),(x2,x3),...

    x: [..., T, H, head_dim]; cos/sin: [T, head_dim//2] (or broadcastable
    [..., T, head_dim//2]). Math in fp32, output cast back to x.dtype
    (rq_transformer.py:627-640).
    """
    xf = x.astype(jnp.float32)
    x_pairs = xf.reshape(*x.shape[:-1], x.shape[-1] // 2, 2)
    x0, x1 = x_pairs[..., 0], x_pairs[..., 1]
    # cos/sin enter at fp32; broadcast over the head axis.
    c = cos.astype(jnp.float32)[..., :, None, :]
    s = sin.astype(jnp.float32)[..., :, None, :]
    out = jnp.stack([x0 * c - x1 * s, x1 * c + x0 * s], axis=-1)
    return out.reshape(x.shape).astype(x.dtype)


# --------------------------------------------------------------------------
# Attention
# --------------------------------------------------------------------------


def split_qkv(
    qkv: jnp.ndarray, dims: AttnDims
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Split fused wqkv output into per-head q/k/v.

    qkv: [..., T, q_size + 2*kv_size] -> q [..., T, n_head, hd],
    k/v [..., T, n_kv_head, hd].
    """
    q, k, v = jnp.split(qkv, [dims.q_size, dims.q_size + dims.kv_size], axis=-1)
    q = q.reshape(*q.shape[:-1], dims.n_head, dims.head_dim)
    k = k.reshape(*k.shape[:-1], dims.n_kv_head, dims.head_dim)
    v = v.reshape(*v.shape[:-1], dims.n_kv_head, dims.head_dim)
    return q, k, v


def sdpa_blockwise(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    block_q: int = 256,
    block_k: int = 256,
) -> jnp.ndarray:
    """Causal GQA attention with online (flash-style) softmax over K blocks.

    Numerically equivalent to `sdpa(is_causal=True, mask=None)` (fp32 online
    softmax) but never materializes the [B, H, T, T] logits: the eager form
    writes+reads ~450 MB of fp32 probabilities per layer at the training
    shapes (B16 x T768 x H12), which dominates the train step in the
    profiler. Each q-block is wrapped in jax.checkpoint so the backward pass
    recomputes block logits instead of storing them.

    Attention-prob dropout (reference rq_transformer.py:559-566 semantics)
    is drawn per block from fold_in(dropout_rng, block_index) — the same
    Bernoulli(1-p)/(1-p) distribution as the eager path, different bits.
    The normalizer uses undropped probabilities, matching torch SDPA (which
    drops after softmax).
    """
    B, T, H, hd = q.shape
    n_kv = k.shape[2]
    group = H // n_kv
    scale = hd**-0.5
    NQ, NK = T // block_q, T // block_k
    qg = q.reshape(B, T, n_kv, group, hd)

    def one_q_block(qi, qb, k, v, rng):
        # qb [B, bq, n_kv, g, hd] -> out [B, bq, n_kv, g, hd]
        m = jnp.full((B, n_kv, group, block_q), -jnp.inf, jnp.float32)
        l = jnp.zeros((B, n_kv, group, block_q), jnp.float32)
        acc = jnp.zeros((B, n_kv, group, block_q, hd), jnp.float32)
        n_kb = (qi * block_q) // block_k + (block_q + block_k - 1) // block_k
        for kj in range(min(n_kb, NK)):
            kb = k[:, kj * block_k : (kj + 1) * block_k]
            vb = v[:, kj * block_k : (kj + 1) * block_k]
            logits = (
                jnp.einsum(
                    "bqhgd,bkhd->bhgqk", qb, kb, preferred_element_type=jnp.float32
                )
                * scale
            )  # [B, n_kv, g, bq, bk]
            q_idx = qi * block_q + jnp.arange(block_q)
            k_idx = kj * block_k + jnp.arange(block_k)
            causal = q_idx[:, None] >= k_idx[None, :]
            logits = jnp.where(causal, logits, -jnp.inf)

            m_new = jnp.maximum(m, jnp.max(logits, axis=-1))
            corr = jnp.exp(m - m_new)
            p = jnp.exp(logits - m_new[..., None])  # undropped
            l = l * corr + jnp.sum(p, axis=-1)  # normalizer from undropped p
            p16 = p.astype(v.dtype)
            if dropout_rate > 0.0 and rng is not None:
                blk_rng = jax.random.fold_in(rng, qi * NK + kj)
                keep = dropout_keep(blk_rng, dropout_rate, p.shape)
                # Zero in matmul dtype; the 1/(1-p) inverted scaling moves
                # to the block output below — identical by linearity, and
                # it drops a full fp32 probs-sized where pass (PERF.md
                # "step anatomy": attention dropout cost 54 ms/step).
                p16 = jnp.where(keep, p16, 0)
            acc = acc * corr[..., None] + jnp.einsum(
                "bhgqk,bkhd->bhgqd", p16, vb,
                preferred_element_type=jnp.float32,
            )
            m = m_new
        out = acc / jnp.maximum(l[..., None], 1e-30)
        if dropout_rate > 0.0 and rng is not None:
            out = out * (1.0 / (1.0 - dropout_rate))
        return out.transpose(0, 3, 1, 2, 4).astype(q.dtype)  # [B, bq, n_kv, g, hd]

    outs = []
    for qi in range(NQ):
        qb = qg[:, qi * block_q : (qi + 1) * block_q]
        fn = jax.checkpoint(partial(one_q_block, qi))
        outs.append(fn(qb, k, v, dropout_rng))
    return jnp.concatenate(outs, axis=1).reshape(B, T, H * hd)


def sdpa(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    *,
    is_causal: bool = False,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    dropout_cols: Optional[int] = None,
) -> jnp.ndarray:
    """Scaled dot-product attention with GQA.

    q: [B, Tq, n_head, hd]; k/v: [B, Tk, n_kv_head, hd].
    mask: bool [*, Tq, Tk] broadcastable, True = attend. Softmax in fp32.
    Matches torch SDPA semantics used at rq_transformer.py:559-566
    (is_causal, dropout on attention probabilities at train time).

    dropout_cols: when the mask leaves at most `dropout_cols` attendable
    keys per query row, all at column positions congruent mod dropout_cols
    (the frame-folded fast trunk: 8 block-aligned keys per 128-wide row —
    models/dual_ar.py::run_fast_trunk), draw keep bits for only that many
    columns and index-expand by (col % dropout_cols). Valid positions map
    to distinct draws, so the keep distribution over attendable entries is
    unchanged iid Bernoulli; masked positions have probability 0 and ignore
    their (shared) bits. Cuts dropout bit generation by Tk/dropout_cols
    (16x at the folded fast-trunk shapes).

    Long causal self-attention (the packed-batch trainer) routes to
    `sdpa_blockwise`, which avoids materializing [B, H, T, T] logits.
    """
    if (
        is_causal
        and mask is None
        and q.shape[1] == k.shape[1]
        and q.shape[1] >= 512
        and q.shape[1] % 256 == 0
    ):
        return sdpa_blockwise(
            q, k, v, dropout_rate=dropout_rate, dropout_rng=dropout_rng
        )
    B, Tq, n_head, hd = q.shape
    n_kv = k.shape[2]
    group = n_head // n_kv
    scale = hd**-0.5

    qg = q.reshape(B, Tq, n_kv, group, hd)
    # [B, n_kv, group, Tq, Tk]
    logits = jnp.einsum("bqhgd,bkhd->bhgqk", qg, k, preferred_element_type=jnp.float32)
    logits = logits * scale

    Tk = k.shape[1]
    if is_causal:
        causal = jnp.tril(jnp.ones((Tq, Tk), dtype=bool), k=Tk - Tq)
        mask = causal if mask is None else (mask & causal)
    if mask is not None:
        mask_b = jnp.broadcast_to(mask, (B, 1, 1, Tq, Tk)) if mask.ndim <= 2 else mask
        while mask_b.ndim < 5:
            mask_b = mask_b[:, None]
        logits = jnp.where(mask_b, logits, -jnp.inf)

    probs = jax.nn.softmax(logits, axis=-1)
    probs = jnp.where(jnp.isnan(probs), 0.0, probs)  # fully-masked rows
    probs = probs.astype(v.dtype)
    if dropout_rate > 0.0 and dropout_rng is not None:
        if dropout_cols is not None and dropout_cols < probs.shape[-1]:
            keep = dropout_keep(
                dropout_rng, dropout_rate, probs.shape[:-1] + (dropout_cols,)
            )
            keep = keep[..., jnp.arange(probs.shape[-1]) % dropout_cols]
        else:
            keep = dropout_keep(dropout_rng, dropout_rate, probs.shape)
        # Zero kept-out probs in the matmul dtype and apply the 1/(1-p)
        # inverted scaling to the OUTPUT instead of the probabilities —
        # identical by linearity of the PV matmul, and it removes a full
        # fp32 probs-sized where pass (measured: attention dropout cost
        # 54 ms/step at 150M b16 before this; PERF.md "step anatomy").
        probs = jnp.where(keep, probs, 0)

    out = jnp.einsum(
        "bhgqk,bkhd->bqhgd", probs, v, preferred_element_type=jnp.float32
    )
    if dropout_rate > 0.0 and dropout_rng is not None:
        out = out * (1.0 / (1.0 - dropout_rate))
    out = out.astype(v.dtype)
    return out.reshape(B, Tq, n_head * hd)


def attention_block(
    x: jnp.ndarray,
    lp: dict,
    dims: AttnDims,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    *,
    mask: Optional[jnp.ndarray] = None,
    is_causal: bool = True,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    dropout_cols: Optional[int] = None,
    norm_eps: float = 1e-5,
) -> jnp.ndarray:
    """One pre-norm attention sublayer: x + wo(attn(norm(x))).

    Projections go through ops.quant.mm so int8 QTensor params work here
    exactly like in swiglu (dense arrays pass through as plain matmuls)."""
    from smoltts_tpu.ops.quant import mm

    h = rms_norm(x, lp["attention_norm"], norm_eps)
    qkv = mm(h, lp["wqkv"])
    if "wqkv_bias" in lp:
        qkv = qkv + lp["wqkv_bias"]
    q, k, v = split_qkv(qkv, dims)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    att = sdpa(
        q,
        k,
        v,
        mask,
        is_causal=is_causal,
        dropout_rate=dropout_rate,
        dropout_rng=dropout_rng,
        dropout_cols=dropout_cols,
    )
    return x + mm(att, lp["wo"])


def ffn_block(x: jnp.ndarray, lp: dict, norm_eps: float) -> jnp.ndarray:
    """One pre-norm FFN sublayer: x + swiglu(norm(x)).

    Accepts either separate w1/w3 or the decode-fused w13 weight
    (ops/quant.py::fuse_decode_params) so fused trees also run through the
    training forward (used by the runtime quant gates, ops/quant_gate.py)."""
    from smoltts_tpu.ops.quant import mm

    h = rms_norm(x, lp["ffn_norm"], norm_eps)
    if "w13" in lp:
        y = mm(h, lp["w13"])
        a, b = jnp.split(y, 2, axis=-1)
        return x + mm(jax.nn.silu(a) * b, lp["w2"])
    return x + swiglu(h, lp["w1"], lp["w3"], lp["w2"])


def transformer_block(
    x: jnp.ndarray,
    lp: dict,
    dims: AttnDims,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    *,
    mask: Optional[jnp.ndarray] = None,
    is_causal: bool = True,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    dropout_cols: Optional[int] = None,
    norm_eps: float = 1e-5,
) -> jnp.ndarray:
    x = attention_block(
        x,
        lp,
        dims,
        cos,
        sin,
        mask=mask,
        is_causal=is_causal,
        dropout_rate=dropout_rate,
        dropout_rng=dropout_rng,
        dropout_cols=dropout_cols,
        norm_eps=norm_eps,
    )
    return ffn_block(x, lp, norm_eps)
