"""Chunked operating-point re-validation (VERDICT r4 #6).

r4 defended chunk=16 / bucket=256 on single best windows whose committed
repeats spanned 3x (340->689 vs the driver's 614->991) — noisy evidence.
This sweep measures every candidate (chunk, attend-bucket) with >= REPS
repeats after a shakedown, and reports MEDIANS plus the spread
((max-min)/median), so the default is defensible on clean-window medians
rather than lucky windows. One JSON line per candidate; a final line ranks
them by median.

Defended runtime config: int8 weights + kv8 + fused fast loop (bench.py).
Usage: python scripts/exp_oppoint.py [--reps 5] [--frames 64]
"""

from __future__ import annotations

import argparse
import json
import os
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

N_STREAMS = 64
PROMPT_LEN = 64
S = 1024


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument(
        "--candidates",
        type=str,
        default="8:256,16:256,32:256,16:512",
        help="comma-separated chunk:bucket pairs",
    )
    args = ap.parse_args()

    os.environ.setdefault("SMOLTTS_FUSED_FAST", "1")

    from smoltts_tpu.codec.config import MimiConfig
    from smoltts_tpu.codec.mimi import decode_stream_init, init_mimi_params
    from smoltts_tpu.config import smoltts_byte_150m
    from smoltts_tpu.lm.decode import init_decode_state
    from smoltts_tpu.lm.pipeline import (
        flush_cadence,
        make_chunk_step,
        make_flush_step,
        make_prefill_step,
    )
    from smoltts_tpu.lm.samplers import GenerationSettings
    from smoltts_tpu.models.dual_ar import init_params
    from smoltts_tpu.ops.quant import (
        fuse_decode_params,
        fuse_mimi_decode_params,
        quantize_decode_params,
        quantize_mimi_params,
    )
    from smoltts_tpu.tokenizer import TokenConfig

    cfg = smoltts_byte_150m().model_copy(
        update=dict(use_gradient_checkpointing=False, dropout=0.0)
    )
    token_cfg = TokenConfig.smoltts_v0()
    settings = GenerationSettings(default_temp=0.7, default_fast_temp=0.7, min_p=0.05)
    mimi_cfg = MimiConfig()

    params = quantize_decode_params(
        fuse_decode_params(init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16))
    )
    mimi_params = quantize_mimi_params(
        fuse_mimi_decode_params(init_mimi_params(mimi_cfg, dtype=jnp.bfloat16))
    )

    B = N_STREAMS
    rng_np = np.random.default_rng(0)
    prompt = np.zeros((B, cfg.num_rows, PROMPT_LEN), np.int32)
    prompt[:, 0] = rng_np.integers(0, 320, (B, PROMPT_LEN))
    prompt_len = jnp.full((B,), PROMPT_LEN, jnp.int32)
    prompt = jnp.asarray(prompt)

    prefill_step = make_prefill_step(cfg, token_cfg, settings, mimi_cfg)
    flush_step = make_flush_step()

    def measure(chunk, bucket, reps, frames):
        assert bucket >= PROMPT_LEN + frames + 1
        chunk_step = make_chunk_step(
            cfg, token_cfg, settings, mimi_cfg, chunk, attend_limit=bucket
        )

        def one_window():
            state = init_decode_state(cfg, B, S, dtype=jnp.int8, tail_len=2 * chunk)
            mstate = decode_stream_init(
                mimi_cfg, B, dtype=jnp.bfloat16, tail_len=4 * chunk, kv_dtype=jnp.int8
            )
            cadence = flush_cadence(state, mstate)
            assert chunk <= cadence
            key = jax.random.PRNGKey(1)
            state, mstate, key, out = prefill_step(
                params, mimi_params, state, mstate, prompt, prompt_len, key
            )
            jax.block_until_ready(out.pcm)
            t0 = time.perf_counter()
            since_flush = 0
            for _ in range(frames // chunk):
                if since_flush + chunk > cadence:
                    state, mstate = flush_step(state, mstate)
                    since_flush = 0
                state, mstate, key, out = chunk_step(
                    params, mimi_params, state, mstate, key
                )
                since_flush += chunk
            np.asarray(out.pcm)
            return (B * frames / 12.5) / (time.perf_counter() - t0)

        one_window()  # shakedown: compile + absorb the first-execution stall
        tps = [one_window() for _ in range(reps)]
        med = float(np.median(tps))
        row = {
            "chunk": chunk,
            "bucket": bucket,
            "median_audio_s_per_s": round(med, 1),
            "max": round(max(tps), 1),
            "min": round(min(tps), 1),
            "spread": round((max(tps) - min(tps)) / med, 3),
            "repeats": [round(t, 1) for t in tps],
        }
        print(json.dumps(row), flush=True)
        return row

    cands = []
    for pair in args.candidates.split(","):
        c, b = pair.split(":")
        cands.append(measure(int(c), int(b), args.reps, args.frames))
    ranked = sorted(cands, key=lambda r: -r["median_audio_s_per_s"])
    print(json.dumps({
        "ranked": [
            {k: r[k] for k in ("chunk", "bucket", "median_audio_s_per_s", "spread")}
            for r in ranked
        ],
        "device": str(jax.devices()[0]),
        "frames": args.frames, "reps": args.reps, "streams": B,
    }), flush=True)


if __name__ == "__main__":
    main()
