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

jax.config.update(
    "jax_compilation_cache_dir", str(Path(__file__).parent / ".jax_cache")
)
import jax.numpy as jnp
import numpy as np

BATCH = int(os.environ.get("BENCH_TRAIN_BATCH", "16"))
SEQ = int(os.environ.get("BENCH_TRAIN_SEQ", "768"))
STEPS = int(os.environ.get("BENCH_TRAIN_STEPS", "10"))
# >0: fused time-chunked fast trunk + codebook CE (train/loss.py::
# forward_train_loss) — the [B, T, 8, 2048] codebook logits are never
# materialized, unlocking batch >= 32 at 150M / 16 GB.
CHUNK_T = int(os.environ.get("BENCH_TRAIN_CHUNK_T", "0"))


def model_flops_per_step(cfg, batch: int, seq: int) -> float:
    """Required model FLOPs for one train step (fwd + 2x bwd), counting each
    component at the token count it actually processes.

    The naive 6*N*D rule undercounts DualAR ~3x: the fast trunk's parameters
    touch max_fast_seqlen (=8) fast tokens PER slow token (forward_train runs
    a length-n fast sequence for every frame, models/dual_ar.py:367-399), and
    the depthwise output head is a per-position [fast_dim, cb] matmul for all
    n positions of every frame. Rematerialization recompute is excluded
    (standard MFU convention), attention included (causal, halved)."""

    def trunk_params(n_layer, dims_dim, q, kv, ffn):
        return n_layer * (dims_dim * (q + 2 * kv) + q * dims_dim + 3 * dims_dim * ffn)

    n_slow = trunk_params(
        cfg.n_layer, cfg.dim, cfg.n_head * cfg.head_dim,
        cfg.n_local_heads * cfg.head_dim, cfg.intermediate_size,
    )
    n_fast = trunk_params(
        cfg.n_fast_layer, cfg.fast_dim, cfg.fast_n_head * cfg.fast_head_dim,
        cfg.fast_n_local_heads * cfg.fast_head_dim, cfg.fast_intermediate_size,
    )
    BT = batch * seq
    n = cfg.max_fast_seqlen
    fwd = 2.0 * n_slow * BT  # slow trunk matmuls
    fwd += 2.0 * n_fast * BT * n  # fast trunk: n fast tokens per slow token
    fwd += 2.0 * cfg.dim * cfg.vocab_size * BT  # (tied) token head
    if cfg.depthwise_output:
        fwd += 2.0 * n * cfg.fast_dim * cfg.codebook_size * BT
    else:
        fwd += 2.0 * cfg.fast_dim * cfg.codebook_size * BT * n
    if cfg.fast_dim != cfg.dim:
        fwd += 2.0 * cfg.dim * cfg.fast_dim * BT
    # attention: QK^T + PV, causal -> x0.5; fast-trunk attention (seq n) incl.
    fwd += cfg.n_layer * 2.0 * batch * seq * seq * cfg.dim
    fwd += cfg.n_fast_layer * 2.0 * BT * n * n * cfg.fast_dim
    return 3.0 * fwd  # bwd = 2x fwd


def main():
    from smoltts_tpu.config import TrainingConfig, smoltts_byte_150m
    from smoltts_tpu.models.dual_ar import init_params
    from smoltts_tpu.tokenizer import TokenConfig
    from smoltts_tpu.train.data import collate, synthetic_dataset
    from smoltts_tpu.train.trainer import init_train_state, make_train_step

    cfg = smoltts_byte_150m()  # grad checkpointing + dropout 0.1 as released
    # Remat/dropout knobs for the throughput sweep (defaults = released
    # recipe). BENCH_TRAIN_REMAT: keep|dots|off; BENCH_TRAIN_DROPOUT: float.
    remat_mode = os.environ.get("BENCH_TRAIN_REMAT", "keep")
    if remat_mode == "off":
        cfg = cfg.model_copy(update=dict(use_gradient_checkpointing=False))
    upd = {}
    if "BENCH_TRAIN_DROPOUT" in os.environ:
        upd["dropout"] = float(os.environ["BENCH_TRAIN_DROPOUT"])
    if upd:
        cfg = cfg.model_copy(update=upd)
    token_cfg = TokenConfig.smoltts_v0()
    tc = TrainingConfig(
        batch_size=BATCH,
        learning_rate=5e-4,
        lr_start=1e-3,
        lr_warmup_steps=70_000,
        weight_decay=0.01,
        gradient_clip=1.0,
        remat_policy="dots" if remat_mode == "dots" else "none",
        fast_chunk_t=CHUNK_T,
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
    flops = model_flops_per_step(cfg, BATCH, SEQ)
    mfu = (flops / dt) / peak
    # the naive 6ND figure (r1/r2 reported this; it undercounts the fast
    # trunk's 8x token multiplicity) kept for cross-round comparability
    mfu_6nd = (6.0 * n_matmul * tokens_per_step / dt) / peak
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
                    "mfu": round(mfu, 4),
                    "model_tflops_per_step": round(flops / 1e12, 2),
                    "mfu_6nd_vs_v5e_bf16_peak": round(mfu_6nd, 4),
                    "matmul_params": n_matmul,
                    "remat": remat_mode,
                    "fast_chunk_t": CHUNK_T,
                    "dropout": cfg.dropout,
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
