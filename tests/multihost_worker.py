"""Multihost training worker: one process of an N-process DP x TP run.

Launched by tests/test_multihost.py as 2 subprocesses x 4 virtual CPU devices
each, coordinated over a local jax.distributed service. Runs the REAL
components (make_multihost_mesh, param_shardings, batch_iterator with
process sharding, make_train_step, CheckpointManager) on a synthetic dataset
and writes per-step losses (+ an Orbax checkpoint) for the parent test to
compare against a single-process 8-device run.
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")  # sitecustomize may pin a TPU backend

import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--out", type=str, required=True)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--global-batch", type=int, default=4)
    args = ap.parse_args()

    from smoltts_tpu.parallel.mesh import (
        init_distributed,
        make_global_batch,
        make_multihost_mesh,
        param_shardings,
    )

    init_distributed(
        f"127.0.0.1:{args.port}", args.num_processes, args.process_id
    )
    assert jax.process_count() == args.num_processes

    from smoltts_tpu.config import ModelType, TrainingConfig, tiny_debug_config
    from smoltts_tpu.models.dual_ar import init_params
    from smoltts_tpu.tokenizer import ByteTokenizer, TokenConfig
    from smoltts_tpu.train.checkpoint import CheckpointManager
    from smoltts_tpu.train.data import batch_iterator, synthetic_dataset
    from smoltts_tpu.train.trainer import init_train_state, make_train_step

    cfg = tiny_debug_config(codebook_size=32, vocab_size=256 + 64 + 32)
    tok = ByteTokenizer(cfg.codebook_size)
    token_cfg = TokenConfig.from_tokenizer(ModelType.smoltts_v0(), tok, cfg)
    tc = TrainingConfig(learning_rate=1e-3, accumulate_steps=1, use_bf16=False)

    mesh = make_multihost_mesh(n_model=2)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=np.float32)
    params = jax.tree.map(
        jax.device_put, params, param_shardings(mesh, params)
    )
    state, tx = init_train_state(params, tc)
    step_fn = make_train_step(cfg, tc, tx)

    dataset = synthetic_dataset(64, cfg, token_cfg, seq_len=48, seed=0)
    batch_sh = NamedSharding(mesh, P("data"))
    local_bs = args.global_batch // args.num_processes
    it = batch_iterator(
        dataset,
        batch_size=local_bs,
        semantic_pad_id=token_cfg.pad_id,
        max_len=48,
        duplicate_code_0=cfg.duplicate_code_0,
        num_codebooks=cfg.num_codebooks,
        seed=1,
        epochs=10,
        process_index=jax.process_index(),
        process_count=jax.process_count(),
    )

    rng = jax.random.PRNGKey(7)
    losses = []
    for _ in range(args.steps):
        batch = make_global_batch(next(it), batch_sh)
        rng, sub = jax.random.split(rng)
        state, metrics = step_fn(state, batch, sub)
        losses.append(float(metrics["loss"]))

    mgr = CheckpointManager(args.out, run_name="mh_run", config=tc)
    mgr.save(state, args.steps)

    if jax.process_index() == 0:
        with open(Path(args.out) / "losses.json", "w") as f:
            json.dump(
                {"losses": losses, "mesh": dict(mesh.shape)}, f
            )
    print(f"worker {args.process_id}: done losses={losses}", flush=True)


if __name__ == "__main__":
    main()
