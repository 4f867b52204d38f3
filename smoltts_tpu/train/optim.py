"""Optimizer & LR schedule (optax), replicating the reference recipe.

- AdamW with decay/no-decay partition: biases, norm weights, and embedding
  tables get weight_decay 0 (reference train/optim.py:8-40).
- Linear warmup from `lr_start` to `learning_rate` over `lr_warmup_steps`,
  constant afterwards (train/optim.py:43-56).
- Optional global-norm gradient clipping (train/trainer.py:212-216).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from smoltts_tpu.config import TrainingConfig

_NO_DECAY_LEAVES = {
    "attention_norm",
    "ffn_norm",
    "norm",
    "fast_norm",
    "wqkv_bias",
    "bias",
}


def decay_mask(params) -> dict:
    """True where weight decay applies (mirrors partition_params, optim.py:8-22).

    Matches the reference's EFFECTIVE partition: only biases and norm weights
    are exempt. Its ".embeddings." pattern (train/optim.py:15) never matches
    the model's actual parameter names (`embeddings.weight` has no leading
    dot), so embedding tables ARE decayed upstream — pinned end-to-end by
    tests/test_training_trajectory.py.
    """

    def walk(tree, name):
        if isinstance(tree, dict):
            return {k: walk(v, k) for k, v in tree.items()}
        return name not in _NO_DECAY_LEAVES

    return walk(params, "")


def lr_schedule(config: TrainingConfig) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Linear lr_start -> learning_rate over warmup, then constant."""

    def fn(step):
        progress = jnp.minimum(step / max(1, config.lr_warmup_steps), 1.0)
        return config.lr_start + (config.learning_rate - config.lr_start) * progress

    return fn


def create_optimizer(config: TrainingConfig, params) -> optax.GradientTransformation:
    schedule = lr_schedule(config)
    tx = optax.chain(
        optax.clip_by_global_norm(config.gradient_clip)
        if config.gradient_clip > 0
        else optax.identity(),
        optax.adamw(
            learning_rate=schedule,
            b1=config.betas[0],
            b2=config.betas[1],
            eps=config.eps,
            weight_decay=config.weight_decay,
            mask=decay_mask(params),
            mu_dtype=jnp.float32,
        ),
    )
    return tx
