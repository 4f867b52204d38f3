"""Token samplers as pure functions of PRNG keys.

Replicates the reference's sampling surface (mlx .../lm/generate.py:88-99,
117-132 and lm/utils/samplers.py:7-34): greedy argmax at temperature 0,
plain temperature-scaled categorical, and min-p filtering.

The min-p filter is implemented sort-free: keep logits within log(min_p) of
the max (same distribution as the reference's sorted formulation, since the
top-1 token always survives the threshold).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class GenerationSettings:
    """Static sampling settings (reference: lm/generate.py:12-17)."""

    default_temp: float = 0.7
    default_fast_temp: Optional[float] = 0.7
    min_p: Optional[float] = None
    max_new_tokens: int = 1024
    # Optional constraint to {im_end} ∪ semantic range for the slow head
    # (present-but-disabled in the reference, lm/utils/constraints.py:8-43).
    audio_only_constraint: bool = False


def sample_token(
    logits: jnp.ndarray,
    rng: jax.Array,
    *,
    temperature: float,
    min_p: Optional[float] = None,
) -> jnp.ndarray:
    """Sample token ids from [..., vocab] logits. temperature==0 => argmax."""
    if temperature is None or temperature <= 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    scaled = logits.astype(jnp.float32) / temperature
    if min_p is not None:
        if not (0.0 <= min_p <= 1.0):
            raise ValueError(f"min_p must be in [0, 1], got {min_p}")
        top = jnp.max(scaled, axis=-1, keepdims=True)
        scaled = jnp.where(scaled >= top + math.log(min_p), scaled, -jnp.inf)
    return jax.random.categorical(rng, scaled, axis=-1).astype(jnp.int32)


def constrain_logits_to_audio(
    logits: jnp.ndarray, im_end_id: int, semantic_start_id: int, semantic_end_id: int
) -> jnp.ndarray:
    """Mask slow-head logits outside {im_end} ∪ [semantic_start, semantic_end]
    (reference: lm/utils/constraints.py:8-27, disabled at its call site)."""
    vocab = logits.shape[-1]
    ids = jnp.arange(vocab)
    allowed = (
        (ids == im_end_id) | ((ids >= semantic_start_id) & (ids <= semantic_end_id))
    )
    return jnp.where(allowed, logits, -jnp.inf)
