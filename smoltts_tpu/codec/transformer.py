"""Mimi codec transformer (8 × 512-dim pre-LayerNorm blocks with LayerScale).

Semantics match kyutai/mimi as ported in the reference
(mlx .../codec/transformer.py:10-150): split-half ("non-traditional") RoPE at
θ=10000, no GQA, GELU MLP (fc1/fc2, no bias), LayerNorm WITH bias, LayerScale
0.01, causal attention with a 250-token sliding window.

Batch mode applies the sliding-window causal mask directly. Streaming mode
carries a fixed-size RING KV cache of `sliding_window` slots with per-slot
absolute positions — constant memory for unbounded streams (the reference
concat-grows its cache and silently exceeds the trained context,
lm/cache.py:6-33; bounded-window behavior is what the codec was trained
with).

Layer weights are stacked on a leading axis; the trunk is a lax.scan.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from smoltts_tpu.ops.quant import mm

from smoltts_tpu.codec.config import MimiConfig


class TransformerRingState(NamedTuple):
    """Streaming KV state, split like the LM decode cache (lm/decode.py):

    the big ring (`k`/`v`, `sliding_window` slots with per-slot absolute
    positions) is READ-ONLY during `transformer_stream_step` — new tokens go
    to the small ring TAIL (`k_tail`/`v_tail`) at a shared scalar column, so
    the step program never copies the ring at the jit boundary.
    `flush_transformer_ring` scatters the tail into the ring; callers must
    flush before the tail wraps (at most every tail_len // T_per_step steps).
    """

    k: jnp.ndarray  # [L, B, W, H, hd] (post-RoPE keys) — ring, read-only per step
    v: jnp.ndarray  # [L, B, W, H, hd]
    slot_pos: jnp.ndarray  # [B, W] absolute position per ring slot, -1 = empty
    k_tail: jnp.ndarray  # [L, B, Wt, H, hd]
    v_tail: jnp.ndarray  # [L, B, Wt, H, hd]
    tail_abs: jnp.ndarray  # [B, Wt] absolute position per tail column, -1 = empty
    t_phase: jnp.ndarray  # [] int32 — next tail write column
    pos: jnp.ndarray  # [B] next absolute position
    # kv8 mode (ring_state_init(dtype=jnp.int8)): the RING is int8 with
    # per-vector scales (quantized at flush); tails stay bf16. None otherwise.
    k_scale: Optional[jnp.ndarray] = None  # [L, B, W, H] f32
    v_scale: Optional[jnp.ndarray] = None

    @property
    def tail_len(self) -> int:
        return self.k_tail.shape[2]


def ring_state_init(
    cfg: MimiConfig, batch: int, dtype=jnp.float32, tail_len: int = 64
) -> TransformerRingState:
    """`dtype=jnp.int8` selects kv8: int8 ring + f32 per-vector scales (the
    tails, written on the hot path, stay bf16)."""
    W = cfg.sliding_window
    H, hd = cfg.num_attention_heads, cfg.head_dim
    L = cfg.num_hidden_layers
    kv8 = dtype == jnp.int8
    tail_dtype = jnp.bfloat16 if kv8 else dtype
    return TransformerRingState(
        k=jnp.zeros((L, batch, W, H, hd), dtype),
        v=jnp.zeros((L, batch, W, H, hd), dtype),
        slot_pos=jnp.full((batch, W), -1, jnp.int32),
        k_tail=jnp.zeros((L, batch, tail_len, H, hd), tail_dtype),
        v_tail=jnp.zeros((L, batch, tail_len, H, hd), tail_dtype),
        tail_abs=jnp.full((batch, tail_len), -1, jnp.int32),
        t_phase=jnp.zeros((), jnp.int32),
        pos=jnp.zeros((batch,), jnp.int32),
        k_scale=jnp.ones((L, batch, W, H), jnp.float32) if kv8 else None,
        v_scale=jnp.ones((L, batch, W, H), jnp.float32) if kv8 else None,
    )


def flush_transformer_ring(state: TransformerRingState) -> TransformerRingState:
    """Scatter every valid tail entry into the ring (slot = abs_pos mod W)
    and reset the tail. Streaming outputs are identical with or without
    intermediate flushes (tests/test_mimi_parity.py)."""
    W = state.k.shape[2]
    valid = state.tail_abs >= 0  # [B, Wt]
    slots = jnp.where(valid, state.tail_abs % W, W)  # OOB -> dropped

    def flush_one(ring_b, tail_b, slots_b):
        # ring_b [L, W, ...]; tail_b [L, Wt, ...]; slots_b [Wt]
        return ring_b.at[:, slots_b].set(tail_b, mode="drop")

    scatter = jax.vmap(flush_one, in_axes=(1, 1, 0), out_axes=1)
    updates = {}
    if state.k_scale is not None:
        # kv8: quantize the bf16 tail entries as they enter the ring.
        from smoltts_tpu.ops.quant import quantize_kv

        kq, ks = quantize_kv(state.k_tail)
        vq, vs = quantize_kv(state.v_tail)
        updates["k"] = scatter(state.k, kq, slots)
        updates["v"] = scatter(state.v, vq, slots)
        updates["k_scale"] = scatter(state.k_scale, ks, slots)
        updates["v_scale"] = scatter(state.v_scale, vs, slots)
    else:
        updates["k"] = scatter(state.k, state.k_tail, slots)
        updates["v"] = scatter(state.v, state.v_tail, slots)
    slot_pos = jax.vmap(lambda sp, sl, ab: sp.at[sl].set(ab, mode="drop"))(
        state.slot_pos, slots, state.tail_abs
    )
    return state._replace(
        slot_pos=slot_pos,
        tail_abs=jnp.full_like(state.tail_abs, -1),
        t_phase=jnp.zeros_like(state.t_phase),
        **updates,
    )


def _rope_half_cos_sin(positions: jnp.ndarray, head_dim: int, theta: float):
    """HF-style split-half RoPE tables: cos/sin [..., head_dim] with the
    frequency vector duplicated across halves."""
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def _apply_rope_half(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x [..., T, H, hd]; cos/sin [..., T, hd] (broadcast over heads)."""
    xf = x.astype(jnp.float32)
    half = x.shape[-1] // 2
    x1, x2 = xf[..., :half], xf[..., half:]
    rot = jnp.concatenate([-x2, x1], axis=-1)
    c = cos[..., :, None, :]
    s = sin[..., :, None, :]
    return (xf * c + rot * s).astype(x.dtype)


def _layer_norm(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray, eps: float) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mu = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return y.astype(x.dtype) * w + b


def _mha(q, k, v, mask, scale):
    """q [B,Tq,H,hd], k/v [B,Tk,H,hd], mask bool broadcastable [B,1,Tq,Tk]."""
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    logits = jnp.where(mask, logits, -jnp.inf)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
    return out.reshape(*q.shape[:2], -1)


def _qkv(h, lp, B, T, H, hd):
    """Q/K/V projections; takes the fused wqkv when present
    (ops/quant.py::fuse_mimi_decode_params — one dot, bit-exact)."""
    if "wqkv" in lp:
        qkv = mm(h, lp["wqkv"])
        D = H * hd
        q, k, v = qkv[..., :D], qkv[..., D : 2 * D], qkv[..., 2 * D :]
    else:
        q, k, v = mm(h, lp["wq"]), mm(h, lp["wk"]), mm(h, lp["wv"])
    return (
        q.reshape(B, T, H, hd),
        k.reshape(B, T, H, hd),
        v.reshape(B, T, H, hd),
    )


def _block(x, lp, cfg: MimiConfig, attn_fn):
    """One pre-norm block with LayerScale (transformer.py:109-131)."""
    h = _layer_norm(x, lp["ln1_w"], lp["ln1_b"], cfg.norm_eps)
    att = attn_fn(h, lp)
    x = x + att * lp["scale_attn"]
    h = _layer_norm(x, lp["ln2_w"], lp["ln2_b"], cfg.norm_eps)
    mlp = mm(jax.nn.gelu(mm(h, lp["fc1"]), approximate=False), lp["fc2"])
    return x + mlp * lp["scale_mlp"]


def transformer_forward(
    params: dict, cfg: MimiConfig, x: jnp.ndarray, positions: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """Batch forward over [B, T, d] with sliding-window causal attention."""
    B, T, _ = x.shape
    H, hd = cfg.num_attention_heads, cfg.head_dim
    if positions is None:
        positions = jnp.arange(T)
    cos, sin = _rope_half_cos_sin(positions, hd, cfg.rope_theta)
    q_idx = jnp.arange(T)
    mask = (q_idx[:, None] >= q_idx[None, :]) & (
        q_idx[:, None] - q_idx[None, :] < cfg.sliding_window
    )
    mask = mask[None, None]
    scale = hd**-0.5

    def attn(h, lp):
        q, k, v = _qkv(h, lp, B, T, H, hd)
        q = _apply_rope_half(q, cos, sin)
        k = _apply_rope_half(k, cos, sin)
        return mm(_mha(q, k, v, mask, scale), lp["wo"])

    def body(h, lp):
        return _block(h, lp, cfg, attn), None

    x, _ = jax.lax.scan(body, x, params["layers"])
    return x


def transformer_stream_step(
    params: dict,
    cfg: MimiConfig,
    state: TransformerRingState,
    x: jnp.ndarray,  # [B, T, d] — T new tokens (2 per 80 ms frame)
) -> Tuple[TransformerRingState, jnp.ndarray]:
    """Streaming forward with the ring KV cache."""
    B, T, _ = x.shape
    H, hd = cfg.num_attention_heads, cfg.head_dim
    W = cfg.sliding_window
    scale = hd**-0.5

    abs_pos = state.pos[:, None] + jnp.arange(T)[None, :]  # [B, T]
    cos, sin = _rope_half_cos_sin(abs_pos, hd, cfg.rope_theta)
    phase = state.t_phase
    # Claim T contiguous tail columns (shared scalar start for every slot).
    tail_abs = jax.lax.dynamic_update_slice(state.tail_abs, abs_pos, (0, phase))

    q_abs = abs_pos[:, :, None]
    # Ring entries: position in (q - W, q] (stale wrapped slots fall out of
    # the window automatically; tail-resident positions are NOT yet in the
    # ring, so no double counting).
    ring_mask = (
        (state.slot_pos[:, None, :] >= 0)
        & (state.slot_pos[:, None, :] <= q_abs)
        & (state.slot_pos[:, None, :] > q_abs - W)
    )[:, None]  # [B, 1, T, W]
    tail_mask = (
        (tail_abs[:, None, :] >= 0)
        & (tail_abs[:, None, :] <= q_abs)
        & (tail_abs[:, None, :] > q_abs - W)
    )[:, None]  # [B, 1, T, Wt]

    # Unrolled layer loop with in-place (dynamic_update_slice) tail writes:
    # under lax.scan the ring k/v were xs/ys, and every iteration
    # round-tripped the whole per-layer ring slice through HBM — the
    # dominant vocoder-step cost in the profiler. The ring itself is now a
    # pure input (no jit-boundary copy).
    L = state.k.shape[0]
    h = x
    k_tail, v_tail = state.k_tail, state.v_tail
    for l in range(L):
        lp = jax.tree.map(lambda a: a[l], params["layers"])
        hn = _layer_norm(h, lp["ln1_w"], lp["ln1_b"], cfg.norm_eps)
        q, k, v = _qkv(hn, lp, B, T, H, hd)
        q = _apply_rope_half(q, cos, sin)
        k = _apply_rope_half(k, cos, sin)
        k_tail = jax.lax.dynamic_update_slice(
            k_tail, k[None].astype(k_tail.dtype), (l, 0, phase, 0, 0)
        )
        v_tail = jax.lax.dynamic_update_slice(
            v_tail, v[None].astype(v_tail.dtype), (l, 0, phase, 0, 0)
        )
        # Two einsums + joint softmax: concatenating the ring and tail K/V
        # would materialize a fresh [B, W+Wt, H, hd] buffer per layer.
        # kv8: the ring is int8 — keys dequantize by scaling the logits,
        # values by scaling the probs (per ring-vector scales).
        lr = jnp.einsum(
            "bqhd,bkhd->bhqk", q, state.k[l].astype(h.dtype),
            preferred_element_type=jnp.float32,
        ) * scale
        if state.k_scale is not None:
            lr = lr * state.k_scale[l].transpose(0, 2, 1)[:, :, None, :]
        lt = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k_tail[l], preferred_element_type=jnp.float32
        ) * scale
        logits = jnp.concatenate(
            [jnp.where(ring_mask, lr, -jnp.inf), jnp.where(tail_mask, lt, -jnp.inf)],
            axis=-1,
        )
        probs = jax.nn.softmax(logits, axis=-1)
        pr = probs[..., :W]
        if state.v_scale is not None:
            pr = pr * state.v_scale[l].transpose(0, 2, 1)[:, :, None, :]
        pr = pr.astype(h.dtype)
        pt = probs[..., W:].astype(v_tail.dtype)
        att = (
            jnp.einsum("bhqk,bkhd->bqhd", pr, state.v[l].astype(h.dtype))
            + jnp.einsum("bhqk,bkhd->bqhd", pt, v_tail[l])
        )
        att = mm(att.reshape(B, T, H * hd).astype(h.dtype), lp["wo"])
        h = h + att * lp["scale_attn"]
        hn = _layer_norm(h, lp["ln2_w"], lp["ln2_b"], cfg.norm_eps)
        mlp = mm(jax.nn.gelu(mm(hn, lp["fc1"]), approximate=False), lp["fc2"])
        h = h + mlp * lp["scale_mlp"]
    x = h
    new_state = state._replace(
        k_tail=k_tail,
        v_tail=v_tail,
        tail_abs=tail_abs,
        t_phase=phase + T,
        pos=state.pos + T,
    )
    return new_state, x
