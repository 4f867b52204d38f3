"""Single-token decode attention over a preallocated KV cache.

The decode hot loop calls attention once per layer per frame with a
single-query q [B, H, hd] against the cache k/v [B, S, n_kv, hd] and a
per-stream valid length. The XLA composition (einsum + where + softmax +
einsum) emits several small kernels per call; the Pallas kernel fuses the
whole thing: grid over (B, n_kv), per-block masked flash-style attention in
VMEM, fp32 accumulation, GQA by grouping query heads per KV head.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def decode_attention_xla(
    q: jnp.ndarray,  # [B, H, hd]
    k: jnp.ndarray,  # [B, n_kv, S, hd] (head-major cache; bf16 or int8)
    v: jnp.ndarray,
    pos: jnp.ndarray,  # [B] — index of the newest valid cache entry
    k_scale: jnp.ndarray = None,  # [B, n_kv, S] — kv8 per-vector scales
    v_scale: jnp.ndarray = None,
) -> jnp.ndarray:
    """Reference implementation. Returns [B, H*hd] in q.dtype.

    With `k_scale`/`v_scale` the cache is int8 (ops/quant.py::quantize_kv):
    keys dequantize by scaling the logits, values by scaling the probs —
    the int8->compute-dtype convert fuses into the dot's operand read, so
    KV HBM traffic halves with no dequantized copy."""
    B, H, hd = q.shape
    n_kv, S = k.shape[1], k.shape[2]
    group = H // n_kv
    qg = q.reshape(B, n_kv, group, hd)
    logits = jnp.einsum(
        "bhgd,bhkd->bhgk", qg, k.astype(q.dtype), preferred_element_type=jnp.float32
    ) * (hd**-0.5)
    if k_scale is not None:
        logits = logits * k_scale[:, :, None, :]
    valid = jnp.arange(S)[None, :] <= pos[:, None]
    logits = jnp.where(valid[:, None, None, :], logits, -jnp.inf)
    probs = jax.nn.softmax(logits, axis=-1)
    if v_scale is not None:
        probs = probs * v_scale[:, :, None, :]
    out = jnp.einsum("bhgk,bhkd->bhgd", probs.astype(q.dtype), v.astype(q.dtype))
    return out.reshape(B, H * hd).astype(q.dtype)


def _decode_attn_kernel(pos_ref, q_ref, k_ref, v_ref, o_ref, *, group: int, s_total: int):
    """One (batch, kv-head) block: q [group, hd], k/v [S, hd]."""
    b = pl.program_id(0)
    q = q_ref[0, 0].astype(jnp.float32)  # [group, hd]
    k = k_ref[0, 0].astype(jnp.float32)  # [S, hd]
    v = v_ref[0, 0].astype(jnp.float32)

    hd = q.shape[-1]
    scores = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * (hd**-0.5)
    s_idx = jax.lax.broadcasted_iota(jnp.int32, (group, s_total), 1)
    valid = s_idx <= pos_ref[b]
    scores = jnp.where(valid, scores, -jnp.inf)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    probs = e / denom
    o_ref[0, 0] = jnp.dot(probs, v, preferred_element_type=jnp.float32).astype(
        o_ref.dtype
    )


def decode_attention_pallas(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, pos: jnp.ndarray
) -> jnp.ndarray:
    """q [B, H, hd]; k/v [B, n_kv, S, hd] head-major."""
    B, H, hd = q.shape
    n_kv, S = k.shape[1], k.shape[2]
    group = H // n_kv
    qg = q.reshape(B, n_kv, group, hd)

    kernel = functools.partial(_decode_attn_kernel, group=group, s_total=S)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, n_kv),
            in_specs=[
                pl.BlockSpec(
                    (1, 1, group, hd), lambda b, h, pos: (b, h, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, S, hd), lambda b, h, pos: (b, h, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, S, hd), lambda b, h, pos: (b, h, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, group, hd), lambda b, h, pos: (b, h, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((B, n_kv, group, hd), q.dtype),
    )(pos.astype(jnp.int32), qg, k, v)
    return out.reshape(B, H * hd)


def decode_attention_tailed(
    q: jnp.ndarray,  # [B, H, hd]
    k_hist: jnp.ndarray,  # [B, n_kv, Sh, hd] — frozen history (bf16 or int8)
    v_hist: jnp.ndarray,
    k_tail: jnp.ndarray,  # [B, n_kv, W, hd] — ring tail of recent writes (bf16)
    v_tail: jnp.ndarray,
    pos: jnp.ndarray,  # [B] position of the current token
    flushed: jnp.ndarray,  # [B] history valid length per slot
    tail_pos: jnp.ndarray,  # [B, W] cache position of each tail column (-1 = invalid)
    k_scale: jnp.ndarray = None,  # [B, n_kv, Sh] — kv8 per-vector history scales
    v_scale: jnp.ndarray = None,
) -> jnp.ndarray:
    """Single-query GQA attention over a split (history + ring-tail) KV cache.

    The split exists so the per-frame decode step never has to return (and
    therefore copy) the big history buffers at the jit boundary: history is a
    pure input, per-frame K/V go to the small tail, and a separate flush
    program consolidates every W frames (see lm/decode.py).

    Valid keys: history positions [0, flushed[b]) plus tail columns whose
    tail_pos lies in [flushed[b], pos[b]]. Together these cover [0, pos[b]]
    exactly once. Returns [B, H*hd] in q.dtype.

    kv8 mode (`k_scale`/`v_scale` given): the HISTORY is int8 with per-vector
    scales — logits scale by k_scale, probs by v_scale — while the hot-path
    tail stays bf16 (quantization happens only at the flush/prefill
    boundary, lm/decode.py::flush_kv).
    """
    B, H, hd = q.shape
    n_kv, Sh = k_hist.shape[1], k_hist.shape[2]
    W = k_tail.shape[2]
    group = H // n_kv
    qg = q.reshape(B, n_kv, group, hd)
    scale = hd**-0.5
    lh = jnp.einsum(
        "bhgd,bhkd->bhgk", qg, k_hist.astype(q.dtype), preferred_element_type=jnp.float32
    ) * scale
    if k_scale is not None:
        lh = lh * k_scale[:, :, None, :]
    lt = jnp.einsum("bhgd,bhkd->bhgk", qg, k_tail, preferred_element_type=jnp.float32) * scale
    mask_h = jnp.arange(Sh)[None, :] < flushed[:, None]  # [B, Sh]
    mask_t = (
        (tail_pos >= flushed[:, None]) & (tail_pos <= pos[:, None]) & (tail_pos >= 0)
    )  # [B, W]
    lh = jnp.where(mask_h[:, None, None, :], lh, -jnp.inf)
    lt = jnp.where(mask_t[:, None, None, :], lt, -jnp.inf)
    logits = jnp.concatenate([lh, lt], axis=-1)
    probs = jax.nn.softmax(logits, axis=-1)
    ph = probs[..., :Sh]
    if v_scale is not None:
        ph = ph * v_scale[:, :, None, :]
    ph = ph.astype(q.dtype)
    pt = probs[..., Sh:].astype(v_tail.dtype)
    out = jnp.einsum("bhgk,bhkd->bhgd", ph, v_hist.astype(q.dtype)) + jnp.einsum(
        "bhgk,bhkd->bhgd", pt, v_tail
    )
    return out.reshape(B, H * hd).astype(q.dtype)


def decode_attention(
    q, k, v, pos, use_pallas: bool | None = None, k_scale=None, v_scale=None
) -> jnp.ndarray:
    if use_pallas is None:
        # Measured on v5e (B=32-128, S=256-1024, GQA 12/4, hd 64): the XLA
        # composition sustains ~950 GB/s on the KV reads — at HBM peak —
        # while the per-(batch,kv-head) Pallas grid runs 3-8x slower (group=3
        # single-query matmuls can't feed the MXU). XLA is the fast path;
        # the kernel remains available explicitly and as a fusion template.
        use_pallas = False
    if use_pallas and k_scale is None:
        return decode_attention_pallas(q, k, v, pos)
    return decode_attention_xla(q, k, v, pos, k_scale=k_scale, v_scale=v_scale)
