"""Training step and loop for DualAR models — jitted, sharded, accumulated.

Replicates the reference recipe (train/trainer.py:63-283): forward + backward
with gradient-accumulation loss scaling, global-norm clipping, AdamW with the
warmup schedule, periodic validation and checkpointing — re-architected for
TPU:

- ONE jitted `train_step` containing the microbatch `lax.scan` for gradient
  accumulation (the reference loops `.backward()` on the host).
- State (params, opt_state, step) is an explicit pytree, donated every step.
- Data parallelism by sharding the batch over the mesh 'data' axis; tensor
  parallelism via the param shardings in parallel/mesh.py. XLA inserts the
  grad all-reduces.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from smoltts_tpu.config import DualARConfig, TrainingConfig
from smoltts_tpu.models.dual_ar import forward_train
from smoltts_tpu.train.loss import Losses, compute_losses
from smoltts_tpu.train.optim import create_optimizer


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray  # scalar int32


def init_train_state(
    params, config: TrainingConfig
) -> tuple[TrainState, optax.GradientTransformation]:
    tx = create_optimizer(config, params)
    return TrainState(params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32)), tx


def loss_fn(params, cfg: DualARConfig, batch: Dict[str, jnp.ndarray], rng,
            remat_policy: str = "none", activation_sharding=None,
            fast_chunk_t: int = 0) -> tuple:
    from smoltts_tpu.train.loss import forward_train_loss

    losses = forward_train_loss(
        params, cfg, batch["tokens"], batch["labels"], dropout_rng=rng,
        train=True, chunk_t=fast_chunk_t,
        remat_policy=remat_policy, activation_sharding=activation_sharding,
    )
    return losses.total, losses


def make_train_step(
    cfg: DualARConfig,
    config: TrainingConfig,
    tx: optax.GradientTransformation,
    accumulate_steps: int = 1,
    donate: bool = True,
    activation_sharding=None,
):
    """Build the jitted train step.

    batch tensors have a leading microbatch axis when accumulate_steps > 1:
    tokens [A, B, R, T]; otherwise [B, R, T].

    activation_sharding: optional NamedSharding for the [B, T, dim] slow-trunk
    activations — sequence parallelism for long packed batches
    (TrainingConfig.sequence_parallel wires P('data', 'model', None)).
    """

    def step_fn(state: TrainState, batch, rng):
        if accumulate_steps == 1:
            (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, cfg, batch, rng, config.remat_policy,
                activation_sharding, config.fast_chunk_t,
            )
        else:

            def micro(carry, mb):
                acc, rng = carry
                rng, sub = jax.random.split(rng)
                (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                    state.params, cfg, mb, sub, config.remat_policy,
                    activation_sharding, config.fast_chunk_t,
                )
                acc = jax.tree.map(jnp.add, acc, grads)
                return (acc, rng), losses

            zero = jax.tree.map(
                lambda p: jnp.zeros(p.shape, jnp.float32), state.params
            )
            (grads, _), losses_seq = jax.lax.scan(micro, (zero, rng), batch)
            grads = jax.tree.map(lambda g: g / accumulate_steps, grads)
            losses = jax.tree.map(lambda x: x.mean(), losses_seq)

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params, opt_state, state.step + 1)
        metrics = {
            "loss": losses.total,
            "base_loss": losses.base,
            "semantic_loss": losses.semantic,
            "grad_norm": optax.global_norm(grads),
        }
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_eval_step(cfg: DualARConfig):
    def eval_fn(params, batch) -> Losses:
        out = forward_train(params, cfg, batch["tokens"], train=False)
        return compute_losses(
            out.token_logits, out.codebook_logits, batch["labels"], per_codebook=True
        )

    return jax.jit(eval_fn)


def validate(params, cfg: DualARConfig, val_batches, eval_step=None) -> Dict[str, float]:
    """Average losses over validation batches (train/trainer.py:94-134)."""
    eval_step = eval_step or make_eval_step(cfg)
    totals: Optional[Losses] = None
    n = 0
    for batch in val_batches:
        losses = eval_step(params, batch)
        losses = jax.tree.map(lambda x: np.asarray(x), losses)
        totals = losses if totals is None else jax.tree.map(np.add, totals, losses)
        n += 1
    if totals is None or n == 0:
        return {}
    out = {
        "loss": float(totals.total) / n,
        "base_loss": float(totals.base) / n,
        "semantic_loss": float(totals.semantic) / n,
    }
    if totals.per_codebook is not None:
        for i, v in enumerate(np.asarray(totals.per_codebook) / n):
            out[f"codebook_{i + 1}_loss"] = float(v)
    return out


def train_loop(
    cfg: DualARConfig,
    config: TrainingConfig,
    state: TrainState,
    tx,
    train_batches,
    val_batches_fn=None,
    checkpoint_manager=None,
    log_fn=None,
    rng: Optional[jax.Array] = None,
    max_steps: Optional[int] = None,
):
    """Host-side training loop: iterate batches, log, validate, checkpoint."""
    rng = rng if rng is not None else jax.random.PRNGKey(config.seed)
    activation_sharding = None
    if config.sequence_parallel:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from smoltts_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

        mesh = getattr(jax.tree.leaves(state.params)[0], "sharding", None)
        mesh = getattr(mesh, "mesh", None)
        if mesh is not None:
            activation_sharding = NamedSharding(
                mesh, P(DATA_AXIS, MODEL_AXIS, None)
            )
    train_step = make_train_step(
        cfg, config, tx, accumulate_steps=config.accumulate_steps,
        activation_sharding=activation_sharding,
    )
    t0 = time.perf_counter()
    profiling = False
    for i, batch in enumerate(train_batches):
        if max_steps is not None and i >= max_steps:
            break
        # Optional profiler window (skip step 0/1 compiles): the TPU-native
        # version of the reference's nsys-wrapped run config.
        if config.profile_steps > 0:
            if i == 2 and not profiling:
                jax.profiler.start_trace(config.profile_dir)
                profiling = True
            elif profiling and i >= 2 + config.profile_steps:
                jax.profiler.stop_trace()
                profiling = False
        rng, sub = jax.random.split(rng)
        state, metrics = train_step(state, batch, sub)
        step = int(state.step)

        if log_fn and step % config.log_every_n_steps == 0:
            m = {k: float(v) for k, v in metrics.items()}
            m["steps_per_s"] = config.log_every_n_steps / max(
                time.perf_counter() - t0, 1e-9
            )
            t0 = time.perf_counter()
            log_fn(step, m)

        if val_batches_fn and step % config.val_every_n_steps == 0 and step > 0:
            vm = validate(state.params, cfg, val_batches_fn())
            if log_fn:
                log_fn(step, {f"val/{k}": v for k, v in vm.items()})

        if checkpoint_manager and step % config.save_every_n_steps == 0 and step > 0:
            checkpoint_manager.save(state, step)
    if profiling:
        jax.profiler.stop_trace()
    return state
