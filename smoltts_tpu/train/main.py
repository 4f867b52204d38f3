"""smoltts-train — training CLI.

`python -m smoltts_tpu.train.main --config <json> [--checkpoint <dir>]`,
mirroring the reference entry point (train/main.py:10-62): JSON run config,
dataset split loading, fresh init or checkpoint resume (with optimizer
reinit on hparam drift), then the training loop with periodic validation and
checkpointing. TPU deltas: device mesh (DP x TP) from config, bf16 params,
multihost-sharded data loading by process index.
"""

from __future__ import annotations

import argparse
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from smoltts_tpu.config import (
    DualARConfig,
    TrainingConfig,
    load_training_config,
)
from smoltts_tpu.models.dual_ar import init_params
from smoltts_tpu.tokenizer import TokenConfig, load_tokenizer
from smoltts_tpu.config import ModelType
from smoltts_tpu.train.checkpoint import CheckpointManager
from smoltts_tpu.train.data import batch_iterator, load_splits
from smoltts_tpu.train.trainer import TrainState, init_train_state, train_loop
from smoltts_tpu.parallel.mesh import (
    init_distributed,
    make_global_batch,
    make_mesh,
    make_multihost_mesh,
    param_shardings,
)
from jax.sharding import NamedSharding, PartitionSpec as P


def default_log_fn(use_wandb: bool):
    run = None
    if use_wandb:
        try:
            import wandb  # type: ignore

            run = wandb.init(project="smoltts_tpu", resume="allow")
        except Exception as e:  # wandb absent in hermetic envs
            print(f"wandb unavailable ({e}); falling back to stdout logging")

    def log(step: int, metrics: dict):
        if run is not None:
            run.log(metrics, step=step)
        line = " ".join(
            f"{k}={v:.4f}" if isinstance(v, float) else f"{k}={v}"
            for k, v in metrics.items()
        )
        print(f"step {step}: {line}")

    return log


def main(argv: Optional[list] = None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--checkpoint", type=str, default=None)
    parser.add_argument("--max-steps", type=int, default=None)
    # Multihost (jax.distributed): --multihost alone auto-detects on TPU pod
    # slices; the explicit flags drive CPU multi-process runs/tests.
    parser.add_argument("--multihost", action="store_true")
    parser.add_argument("--coordinator", type=str, default=None)
    parser.add_argument("--num-processes", type=int, default=None)
    parser.add_argument("--process-id", type=int, default=None)
    args = parser.parse_args(argv)

    if args.multihost or args.coordinator is not None:
        init_distributed(args.coordinator, args.num_processes, args.process_id)

    config = load_training_config(args.config)
    model_cfg = DualARConfig.from_json_file(config.init_folder)
    tokenizer = load_tokenizer(config.init_folder)
    token_cfg = TokenConfig.from_tokenizer(ModelType.smoltts_v0(), tokenizer, model_cfg)

    train_ds, val_ds = load_splits(config.dataset_path)

    if jax.process_count() > 1:
        mesh = make_multihost_mesh(config.mesh_model_axis)
    else:
        mesh = make_mesh(config.mesh_data_axis, config.mesh_model_axis)
    dtype = jnp.bfloat16 if config.use_bf16 else jnp.float32

    if config.use_pretrained:
        from smoltts_tpu.io.checkpoint_interop import load_params

        params = load_params(config.init_folder, model_cfg, dtype=dtype)
    else:
        params = init_params(model_cfg, jax.random.PRNGKey(config.seed), dtype=dtype)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    print(f"Total number of parameters: {n_params}")

    params = jax.tree.map(jax.device_put, params, param_shardings(mesh, params))
    state, tx = init_train_state(params, config)

    checkpoint_manager = CheckpointManager(
        config.checkpoint_path,
        keep_last_n=config.keep_last_n_checkpoints,
        config=config,
    )
    start_step = 0
    resume_from = args.checkpoint
    if resume_from is None and config.auto_resume:
        # Preemption recovery: restart-from-latest (SURVEY §5). A fresh run
        # (no checkpoints yet) starts from init.
        latest = CheckpointManager.latest_checkpoint(config.checkpoint_path)
        if latest is not None:
            print(f"auto-resume: restarting from {latest}")
            resume_from = str(latest)
    if resume_from:
        ckpt, start_step, reinit = CheckpointManager.load(resume_from, config)
        params = jax.tree.map(
            lambda a, sh: jax.device_put(jnp.asarray(a), sh.sharding),
            ckpt["params"],
            state.params,
        )
        if reinit:
            state, tx = init_train_state(params, config)
        else:
            state = TrainState(
                params=params,
                opt_state=jax.tree.map(jnp.asarray, ckpt["opt_state"]),
                step=jnp.asarray(start_step, jnp.int32),
            )
        state = state._replace(step=jnp.asarray(start_step, jnp.int32))

    batch_sh = NamedSharding(
        mesh, P(None, "data") if config.accumulate_steps > 1 else P("data")
    )

    def batches():
        for b in batch_iterator(
            train_ds,
            batch_size=config.batch_size,
            semantic_pad_id=token_cfg.pad_id,
            max_len=config.max_sequence_length,
            duplicate_code_0=model_cfg.duplicate_code_0,
            num_codebooks=model_cfg.num_codebooks,
            accumulate_steps=config.accumulate_steps,
            seed=config.seed,
            epochs=config.max_epochs,
            process_index=jax.process_index(),
            process_count=jax.process_count(),
        ):
            yield make_global_batch(b, batch_sh)

    def val_batches():
        it = batch_iterator(
            val_ds,
            batch_size=config.batch_size,
            semantic_pad_id=token_cfg.pad_id,
            max_len=config.max_sequence_length,
            duplicate_code_0=model_cfg.duplicate_code_0,
            num_codebooks=model_cfg.num_codebooks,
            process_index=jax.process_index(),
            process_count=jax.process_count(),
        )
        val_sh = NamedSharding(mesh, P("data"))
        for i, b in enumerate(it):
            if i >= 16:
                break
            yield make_global_batch(b, val_sh)

    train_loop(
        model_cfg,
        config,
        state,
        tx,
        batches(),
        val_batches_fn=val_batches,
        checkpoint_manager=checkpoint_manager,
        log_fn=default_log_fn(config.use_wandb),
        rng=jax.random.PRNGKey(config.seed),
        max_steps=args.max_steps,
    )


if __name__ == "__main__":
    main()
