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

from smoltts_tpu.codec.config import MimiConfig


class TransformerRingState(NamedTuple):
    k: jnp.ndarray  # [L, B, W, H, hd] (post-RoPE keys)
    v: jnp.ndarray  # [L, B, W, H, hd]
    slot_pos: jnp.ndarray  # [B, W] absolute position per ring slot, -1 = empty
    pos: jnp.ndarray  # [B] next absolute position


def ring_state_init(cfg: MimiConfig, batch: int, dtype=jnp.float32) -> TransformerRingState:
    W = cfg.sliding_window
    H, hd = cfg.num_attention_heads, cfg.head_dim
    L = cfg.num_hidden_layers
    return TransformerRingState(
        k=jnp.zeros((L, batch, W, H, hd), dtype),
        v=jnp.zeros((L, batch, W, H, hd), dtype),
        slot_pos=jnp.full((batch, W), -1, jnp.int32),
        pos=jnp.zeros((batch,), jnp.int32),
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


def _block(x, lp, cfg: MimiConfig, attn_fn):
    """One pre-norm block with LayerScale (transformer.py:109-131)."""
    h = _layer_norm(x, lp["ln1_w"], lp["ln1_b"], cfg.norm_eps)
    att = attn_fn(h, lp)
    x = x + att * lp["scale_attn"]
    h = _layer_norm(x, lp["ln2_w"], lp["ln2_b"], cfg.norm_eps)
    mlp = jax.nn.gelu(h @ lp["fc1"], approximate=False) @ lp["fc2"]
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
        q = (h @ lp["wq"]).reshape(B, T, H, hd)
        k = (h @ lp["wk"]).reshape(B, T, H, hd)
        v = (h @ lp["wv"]).reshape(B, T, H, hd)
        q = _apply_rope_half(q, cos, sin)
        k = _apply_rope_half(k, cos, sin)
        return _mha(q, k, v, mask, scale) @ lp["wo"]

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
    slots = abs_pos % W  # [B, T]
    new_slot_pos = jax.vmap(lambda sp, sl, ap: sp.at[sl].set(ap))(
        state.slot_pos, slots, abs_pos
    )

    def write_ring(cache_l, new):  # [B, W, H, hd], [B, T, H, hd]
        return jax.vmap(lambda c, sl, n: c.at[sl].set(n.astype(c.dtype)))(
            cache_l, slots, new
        )

    # Validity: slot holds a position in (q - W, q], per query.
    # [B, T, W]
    valid_base = new_slot_pos[:, None, :]  # slot abs positions after write
    q_abs = abs_pos[:, :, None]
    mask = (valid_base >= 0) & (valid_base <= q_abs) & (valid_base > q_abs - W)
    mask = mask[:, None]  # [B, 1, T, W]

    def body(carry, lp_kv):
        h, = carry
        lp, kc, vc = lp_kv
        hn = _layer_norm(h, lp["ln1_w"], lp["ln1_b"], cfg.norm_eps)
        q = (hn @ lp["wq"]).reshape(B, T, H, hd)
        k = (hn @ lp["wk"]).reshape(B, T, H, hd)
        v = (hn @ lp["wv"]).reshape(B, T, H, hd)
        q = _apply_rope_half(q, cos, sin)
        k = _apply_rope_half(k, cos, sin)
        kc = write_ring(kc, k)
        vc = write_ring(vc, v)
        att = _mha(q, kc, vc, mask, scale) @ lp["wo"]
        h = h + att * lp["scale_attn"]
        hn = _layer_norm(h, lp["ln2_w"], lp["ln2_b"], cfg.norm_eps)
        mlp = jax.nn.gelu(hn @ lp["fc1"], approximate=False) @ lp["fc2"]
        h = h + mlp * lp["scale_mlp"]
        return (h,), (kc, vc)

    (x,), (k_new, v_new) = jax.lax.scan(body, (x,), (params["layers"], state.k, state.v))
    new_state = TransformerRingState(
        k=k_new, v=v_new, slot_pos=new_slot_pos, pos=state.pos + T
    )
    return new_state, x
