"""Anatomy of the 150M training step (VERDICT r4 #4).

Decomposes the defended train step (batch 16 x seq 768, bf16, layer remat,
dropout 0.1 — BENCH_TRAIN.json recipe) into measured components, printed as
one JSON line:

- full_step:      make_train_step (grad + clip + AdamW + metrics)
- grad:           jax.grad of the fused loss alone
- fwd:            the fused forward+loss alone
- forward stages: slow trunk / token head+CE inputs / fast trunk (gather +
  4 layers over B*T frames) / depthwise codebook head / CE losses, each
  timed on materialized stage inputs
- derived:        bwd_incl_remat = grad - fwd; remat recompute estimate =
  grad - 3*fwd (ideal bwd is 2x fwd); optimizer = full_step - grad

Methodology (profile_decode.py): every timed program returns a SCALAR
(jnp.sum of its output) fetched with float(...) — block_until_ready is not
a reliable fence on the tunneled runtime. An xplane trace is attempted with
--trace; on runtimes where no device plane is captured the component view
is authoritative.

Usage: python scripts/profile_train.py [--batch 16] [--seq 768] [--iters 8]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    str(Path(__file__).resolve().parent.parent / ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np


def timed_scalar(fn, args, iters):
    float(fn(*args))  # warm/compile
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            x = fn(*args)
        float(x)
        times.append((time.perf_counter() - t0) / iters * 1e3)
    return float(np.median(times))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--seq", type=int, default=768)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--trace", action="store_true")
    args = ap.parse_args()

    from smoltts_tpu.config import TrainingConfig, smoltts_byte_150m
    from smoltts_tpu.models import dual_ar as da
    from smoltts_tpu.models.layers import rms_norm, rope_cos_sin
    from smoltts_tpu.tokenizer import TokenConfig
    from smoltts_tpu.train.data import collate, synthetic_dataset
    from smoltts_tpu.train.loss import compute_losses, forward_train_loss
    from smoltts_tpu.train.trainer import init_train_state, make_train_step

    cfg = smoltts_byte_150m()
    token_cfg = TokenConfig.smoltts_v0()
    tc = TrainingConfig(
        batch_size=args.batch, learning_rate=5e-4, lr_start=1e-3,
        lr_warmup_steps=70_000, weight_decay=0.01, gradient_clip=1.0,
    )
    params = init_params = da.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    state, tx = init_train_state(params, tc)
    step = make_train_step(cfg, tc, tx, donate=False)

    rows = synthetic_dataset(args.batch, cfg, token_cfg, seq_len=args.seq, seed=0)
    batch = collate(
        [r["ground_truth"] for r in rows], token_cfg.pad_id, max_len=args.seq,
        duplicate_code_0=cfg.duplicate_code_0, num_codebooks=cfg.num_codebooks,
    )
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    tokens, labels = batch["tokens"], batch["labels"]
    rng = jax.random.PRNGKey(1)
    out = {"batch": args.batch, "seq": args.seq, "device": str(jax.devices()[0])}
    iters = args.iters

    # ---- full step (threads state; donate off so inputs stay valid) -------
    s2, m = step(state, batch, rng)  # compile
    float(m["loss"])
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        s_run = state
        for _ in range(iters):
            s_run, m = step(s_run, batch, rng)
        float(m["loss"])
        times.append((time.perf_counter() - t0) / iters * 1e3)
    t_step = float(np.median(times))

    # ---- fused loss fwd and grad ------------------------------------------
    kw = dict(train=True, remat_policy=tc.remat_policy)

    @jax.jit
    def j_fwd(p, tokens, labels, key):
        return forward_train_loss(p, cfg, tokens, labels, dropout_rng=key, **kw).total

    @jax.jit
    def j_grad(p, tokens, labels, key):
        g = jax.grad(
            lambda p_: forward_train_loss(
                p_, cfg, tokens, labels, dropout_rng=key, **kw
            ).total.astype(jnp.float32)
        )(p)
        # Reduce over EVERY leaf: returning a single leaf would let XLA
        # dead-code-eliminate the rest of the backward (measured: 34 ms
        # "grad" vs 131 ms fwd — the pruned program is 12x off).
        return jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(x.astype(jnp.float32)), g, jnp.float32(0)
        )

    t_fwd = timed_scalar(j_fwd, (params, tokens, labels, rng), iters)
    t_grad = timed_scalar(j_grad, (params, tokens, labels, rng), iters)

    # ---- forward stages on materialized inputs ----------------------------
    B, R, T = tokens.shape
    n = cfg.max_fast_seqlen

    @jax.jit
    def j_slow(p, tokens, key):
        x = da._slow_forward(
            p, cfg, tokens, dropout=cfg.dropout, dropout_rng=key,
            embed_mask_mode="row1_zero", semantic_start_id=0,
            semantic_end_id=0, activation_sharding=None, remat_policy="none",
            remat=cfg.use_gradient_checkpointing,
        )
        return jnp.sum(x.astype(jnp.float32))

    @jax.jit
    def slow_x(p, tokens, key):
        return da._slow_forward(
            p, cfg, tokens, dropout=cfg.dropout, dropout_rng=key,
            embed_mask_mode="row1_zero", semantic_start_id=0,
            semantic_end_id=0, activation_sharding=None, remat_policy="none",
            remat=cfg.use_gradient_checkpointing,
        )

    x = slow_x(params, tokens, rng)
    jax.block_until_ready(x)

    @jax.jit
    def j_token_head(p, x):
        return jnp.sum(da.token_head(p, cfg, x).astype(jnp.float32))

    @jax.jit
    def j_fast_trunk(p, x, tokens, key):
        h = da.project_fast_in(p, cfg, x)
        cb = tokens[:, 1:-1, 1:]
        cb = jnp.pad(cb, ((0, 0), (0, 0), (0, 1)))
        cb = cb + da.fast_codebook_offsets(cfg)[None, :, None]
        cb_embeds = p["fast_embeddings"][cb.transpose(0, 2, 1)]
        fast_seq = jnp.concatenate([h[:, :, None], cb_embeds], axis=2)
        fast_seq = fast_seq.reshape(B * T, n, cfg.fast_dim)
        fast_x = da.run_fast_trunk(
            p, cfg, fast_seq,
            dropout_rate=cfg.dropout, dropout_rng=key,
            remat=cfg.use_gradient_checkpointing,
        )
        return jnp.sum(rms_norm(fast_x, p["fast_norm"], cfg.norm_eps).astype(jnp.float32))

    @jax.jit
    def fast_out_arr(p, x, tokens, key):
        h = da.project_fast_in(p, cfg, x)
        cb = tokens[:, 1:-1, 1:]
        cb = jnp.pad(cb, ((0, 0), (0, 0), (0, 1)))
        cb = cb + da.fast_codebook_offsets(cfg)[None, :, None]
        cb_embeds = p["fast_embeddings"][cb.transpose(0, 2, 1)]
        fast_seq = jnp.concatenate([h[:, :, None], cb_embeds], axis=2)
        fast_seq = fast_seq.reshape(B * T, n, cfg.fast_dim)
        fast_x = da.run_fast_trunk(
            p, cfg, fast_seq,
            dropout_rate=cfg.dropout, dropout_rng=key,
            remat=cfg.use_gradient_checkpointing,
        )
        return rms_norm(fast_x, p["fast_norm"], cfg.norm_eps)

    fast_out = fast_out_arr(params, x, tokens, rng)
    jax.block_until_ready(fast_out)

    @jax.jit
    def j_cb_head(p, fast_out):
        logits = da.fast_output_logits(p, cfg, fast_out)
        return jnp.sum(logits.astype(jnp.float32))

    @jax.jit
    def logits_arrs(p, x, fast_out):
        tl = da.token_head(p, cfg, x)
        cl = da.fast_output_logits(p, cfg, fast_out).reshape(B, T, n, cfg.codebook_size)
        return tl, cl

    tl, cl = logits_arrs(params, x, fast_out)
    jax.block_until_ready((tl, cl))

    @jax.jit
    def j_ce(tl, cl, labels):
        return compute_losses(tl, cl, labels).total

    stages = {
        "slow_trunk_fwd": timed_scalar(j_slow, (params, tokens, rng), iters),
        "token_head_fwd": timed_scalar(j_token_head, (params, x), iters),
        "fast_trunk_fwd": timed_scalar(j_fast_trunk, (params, x, tokens, rng), iters),
        "codebook_head_fwd": timed_scalar(j_cb_head, (params, fast_out), iters),
        "ce_losses_fwd": timed_scalar(j_ce, (tl, cl, labels), iters),
    }
    out["forward_stage_ms"] = {k: round(v, 1) for k, v in stages.items()}
    out["component_ms"] = {
        "full_step": round(t_step, 1),
        "grad": round(t_grad, 1),
        "fwd": round(t_fwd, 1),
        "bwd_incl_remat": round(t_grad - t_fwd, 1),
        "remat_recompute_est": round(t_grad - 3.0 * t_fwd, 1),
        "optimizer_and_rest": round(t_step - t_grad, 1),
    }
    print(json.dumps(out), flush=True)

    # ---- optional xplane trace --------------------------------------------
    if args.trace:
        from smoltts_tpu.utils.profiling import device_op_summary, trace

        log_dir = "/tmp/smoltts_train_trace"
        with trace(log_dir):
            s_run = state
            for _ in range(3):
                s_run, m = step(s_run, batch, rng)
            float(m["loss"])
        ops = device_op_summary(log_dir, top_k=15)
        total = sum(us for _, us, _ in ops) or 1.0
        out["top_ops"] = [
            {"op": nme, "ms_total": round(us / 1e3, 2),
             "pct": round(100 * us / total, 1), "count": c}
            for nme, us, c in ops
        ]
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
