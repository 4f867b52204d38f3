"""DualAR training losses.

Semantics per the reference (train/trainer.py:25-60): `base_loss` is CE of the
slow head against row-0 labels, `semantic_loss` is CE over ALL codebook levels
flattened together, both with ignore_index=-100 masking; optional per-codebook
losses for validation. Cross-entropy is computed in fp32.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class Losses(NamedTuple):
    total: jnp.ndarray
    base: jnp.ndarray
    semantic: jnp.ndarray
    per_codebook: Optional[jnp.ndarray] = None  # [num_levels]


def masked_cross_entropy(
    logits: jnp.ndarray, labels: jnp.ndarray, ignore_index: int = -100
) -> jnp.ndarray:
    """Mean CE over positions where labels != ignore_index.

    logits [..., V]; labels [...] int. Returns a scalar (0 if fully masked).
    """
    mask = labels != ignore_index
    safe = jnp.where(mask, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    total = jnp.sum(nll * mask)
    count = jnp.maximum(jnp.sum(mask), 1)
    return total / count


def compute_losses(
    token_logits: jnp.ndarray,  # [B, T, V]
    codebook_logits: jnp.ndarray,  # [B, T, N, CB]
    labels: jnp.ndarray,  # [B, R, T] with R = 1 + N
    per_codebook: bool = False,
) -> Losses:
    base = masked_cross_entropy(token_logits, labels[:, 0, :])
    cb_labels = labels[:, 1:, :].transpose(0, 2, 1)  # [B, T, N]
    semantic = masked_cross_entropy(codebook_logits, cb_labels)
    per_cb = None
    if per_codebook:
        per_cb = jax.vmap(
            lambda lg, lb: masked_cross_entropy(lg, lb), in_axes=(2, 2)
        )(codebook_logits, cb_labels)
    return Losses(total=base + semantic, base=base, semantic=semantic, per_codebook=per_cb)
