"""Training-step throughput bench (BASELINE.md config 4 proxy).

One-chip 150M training: jitted train step (fwd+bwd+AdamW, bf16 params,
gradient checkpointing, reference hyperparameters) on synthetic packed
batches at the reference's shapes (batch 16 x seq 768). Prints one JSON line
with tokens/s and step time. Multi-host DP scales this linearly per chip
(shardings validated by __graft_entry__.dryrun_multichip).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
import jax.numpy as jnp
import numpy as np

BATCH = int(os.environ.get("BENCH_TRAIN_BATCH", "16"))
SEQ = int(os.environ.get("BENCH_TRAIN_SEQ", "768"))
STEPS = int(os.environ.get("BENCH_TRAIN_STEPS", "10"))


def main():
    from smoltts_tpu.config import TrainingConfig, smoltts_byte_150m
    from smoltts_tpu.models.dual_ar import init_params
    from smoltts_tpu.tokenizer import TokenConfig
    from smoltts_tpu.train.data import collate, synthetic_dataset
    from smoltts_tpu.train.trainer import init_train_state, make_train_step

    cfg = smoltts_byte_150m()  # grad checkpointing + dropout 0.1 as released
    token_cfg = TokenConfig.smoltts_v0()
    tc = TrainingConfig(
        batch_size=BATCH,
        learning_rate=5e-4,
        lr_start=1e-3,
        lr_warmup_steps=70_000,
        weight_decay=0.01,
        gradient_clip=1.0,
    )
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    state, tx = init_train_state(params, tc)
    step = make_train_step(cfg, tc, tx, donate=os.environ.get("SMOLTTS_DONATE") == "1")

    rows = synthetic_dataset(BATCH, cfg, token_cfg, seq_len=SEQ, seed=0)
    batch = collate(
        [r["ground_truth"] for r in rows], token_cfg.pad_id, max_len=SEQ,
        duplicate_code_0=cfg.duplicate_code_0, num_codebooks=cfg.num_codebooks,
    )
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    rng = jax.random.PRNGKey(1)
    rng, sub = jax.random.split(rng)
    state, metrics = step(state, batch, sub)  # compile
    float(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(STEPS):
        rng, sub = jax.random.split(rng)
        state, metrics = step(state, batch, sub)
    loss = float(metrics["loss"])  # forces the chain
    dt = (time.perf_counter() - t0) / STEPS

    tokens_per_step = BATCH * SEQ
    # MFU via the standard 6*N*D rule (fwd 2ND + bwd 4ND; rematerialization
    # adds ~2ND more but is excluded, so this is the conservative "model
    # FLOPs" number). N counts matmul-participating params (tables excluded).
    n_matmul = sum(
        int(np.prod(p.shape))
        for name, p in [
            *[(k, v) for k, v in params["layers"].items()],
            *[(k, v) for k, v in params["fast_layers"].items()],
            ("fast_output", params["fast_output"]),
            ("embeddings", params["embeddings"]),  # tied head matmul
        ]
        if "norm" not in name
    )
    peak = 197e12 if jax.devices()[0].platform == "tpu" else float("nan")
    mfu = (6.0 * n_matmul * tokens_per_step / dt) / peak
    print(
        json.dumps(
            {
                "metric": "train_tokens_per_s_per_chip_150m",
                "value": round(tokens_per_step / dt, 1),
                "unit": "tokens/s",
                "extra": {
                    "step_ms": round(dt * 1e3, 1),
                    "batch": BATCH,
                    "seq": SEQ,
                    "loss": round(loss, 3),
                    "mfu_6nd_vs_v5e_bf16_peak": round(mfu, 4),
                    "matmul_params": n_matmul,
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
