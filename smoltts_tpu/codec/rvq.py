"""Split residual vector quantizer (RVQ) for Mimi.

Semantics per the reference port (mlx .../codec/rvq.py:7-187) and kyutai/HF:
- Euclidean codebooks whose embeddings are `embed_sum / max(cluster_usage, ε)`
  (materialized once at load time here).
- Split: 1 semantic quantizer + 31 acoustic quantizers, each side with its own
  1×1 input/output projection (512 ↔ 256); the acoustic side quantizes the
  ORIGINAL embedding, not the semantic residual.
- Encode: per-level nearest-neighbour on the running residual. The argmin is
  one matmul (‖e‖² − 2x·eᵀ) — no materialized cdist.
- Decode: Σ codebook lookups per side, then output projections.

Layout: activations [B, T, C]; codes [B, K, T] (HF/data-pipeline order).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from smoltts_tpu.codec.config import MimiConfig


def _nearest(residual: jnp.ndarray, embed: jnp.ndarray) -> jnp.ndarray:
    """argmin_j ||r - e_j||² over codes. residual [.., D], embed [C, D]."""
    rf = residual.astype(jnp.float32)
    ef = embed.astype(jnp.float32)
    scores = rf @ ef.T - 0.5 * jnp.sum(ef * ef, axis=-1)  # maximize x·e - ||e||²/2
    return jnp.argmax(scores, axis=-1).astype(jnp.int32)


def rvq_encode_side(
    x: jnp.ndarray,  # [B, T, hidden]
    side: dict,  # {"in_proj" [hid, dim], "out_proj" [dim, hid], "embed" [K, C, dim]}
    num_quantizers: int,
) -> jnp.ndarray:
    """Iterative residual encode -> codes [B, num_quantizers, T]."""
    z = x.astype(jnp.float32) @ side["in_proj"].astype(jnp.float32)

    def step(residual, embed):
        idx = _nearest(residual, embed)
        residual = residual - embed.astype(jnp.float32)[idx]
        return residual, idx

    _, codes = jax.lax.scan(step, z, side["embed"][:num_quantizers])
    return codes.transpose(1, 0, 2)  # [B, K, T]


def rvq_decode_side(codes: jnp.ndarray, side: dict) -> jnp.ndarray:
    """codes [B, K, T] -> [B, T, hidden]."""
    K = codes.shape[1]

    def gather(acc, kc):
        embed, c = kc
        return acc + embed[c], None

    B, _, T = codes.shape
    dim = side["embed"].shape[-1]
    acc0 = jnp.zeros((B, T, dim), side["embed"].dtype)
    acc, _ = jax.lax.scan(
        gather, acc0, (side["embed"][:K], codes.transpose(1, 0, 2))
    )
    return acc @ side["out_proj"]


def split_rvq_encode(
    x: jnp.ndarray, quantizer: dict, cfg: MimiConfig, num_quantizers: Optional[int] = None
) -> jnp.ndarray:
    """x [B, T, hidden] -> codes [B, nq, T] (level 0 semantic)."""
    nq = num_quantizers or cfg.num_quantizers
    if nq > cfg.num_quantizers or nq < cfg.num_semantic_quantizers:
        raise ValueError(f"num_quantizers {nq} out of range")
    sem = rvq_encode_side(x, quantizer["semantic"], cfg.num_semantic_quantizers)
    n_ac = nq - cfg.num_semantic_quantizers
    if n_ac == 0:
        return sem
    ac = rvq_encode_side(x, quantizer["acoustic"], n_ac)
    return jnp.concatenate([sem, ac], axis=1)


def split_rvq_decode(codes: jnp.ndarray, quantizer: dict, cfg: MimiConfig) -> jnp.ndarray:
    """codes [B, K, T] -> embeddings [B, T, hidden]."""
    ns = cfg.num_semantic_quantizers
    out = rvq_decode_side(codes[:, :ns], quantizer["semantic"])
    if codes.shape[1] > ns:
        out = out + rvq_decode_side(codes[:, ns:], quantizer["acoustic"])
    return out
