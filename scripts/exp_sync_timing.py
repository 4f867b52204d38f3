"""Instrument the synchronous serve cycle: per-phase wall time for
dispatch_step / take_due / fetch / account over a closed-loop run.

Usage: python scripts/exp_sync_timing.py [--frames 60] [--total-mult 2]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import os
import jax

_plat = os.environ.get("JAX_PLATFORMS", "")
if _plat and "cpu" not in _plat.split(","):
    jax.config.update("jax_platforms", _plat + ",cpu")
jax.config.update(
    "jax_compilation_cache_dir",
    str(Path(__file__).resolve().parent.parent / ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

FRAME_RATE = 12.5


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=64)
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--total-mult", type=int, default=2)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from smoltts_tpu.codec.config import MimiConfig
    from smoltts_tpu.codec.mimi import init_mimi_params
    from smoltts_tpu.config import smoltts_byte_150m
    from smoltts_tpu.lm.engine import DecodeEngine
    from smoltts_tpu.lm.samplers import GenerationSettings
    from smoltts_tpu.models.dual_ar import init_params
    from smoltts_tpu.ops.quant import (
        fuse_decode_params, fuse_mimi_decode_params,
        quantize_decode_params, quantize_mimi_params,
    )
    from smoltts_tpu.tokenizer import TokenConfig

    cfg = smoltts_byte_150m().model_copy(
        update=dict(use_gradient_checkpointing=False, dropout=0.0))
    token_cfg = TokenConfig.smoltts_v0()
    settings = GenerationSettings(default_temp=0.7, default_fast_temp=0.7, min_p=0.05)
    mimi_cfg = MimiConfig()

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = quantize_decode_params(fuse_decode_params(
            init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)))
        mimi_params = quantize_mimi_params(fuse_mimi_decode_params(
            init_mimi_params(mimi_cfg, dtype=jnp.bfloat16)))
        jax.block_until_ready((params, mimi_params))
    dev = jax.devices()[0]
    params = jax.device_put(params, dev)
    mimi_params = jax.device_put(mimi_params, dev)

    engine = DecodeEngine(
        params, cfg, token_cfg, settings,
        num_slots=args.streams, max_seq_len=1024, kv_dtype=jnp.int8,
        prompt_bucket=64, mimi_params=mimi_params, mimi_cfg=mimi_cfg,
        inflight=1, fetch_every=1, emit_int16=True, chunk_frames=args.chunk,
        admit_sizes=[1, 4], attend_buckets=[256],
    )
    t0 = time.perf_counter()
    engine.warm(parallel=6, buckets=[256])
    print(f"[warm] {time.perf_counter()-t0:.1f}s", flush=True)

    prompt = np.zeros((cfg.num_rows, 48), np.int32)
    prompt[0] = np.random.default_rng(0).integers(0, 320, 48)

    def run(n_streams, total, frames):
        t_disp = t_take = t_fetch = t_acct = 0.0
        n_disp = n_fetch = 0
        done_frames = [0]
        finished = [0]
        for _ in range(n_streams):
            engine.submit(prompt, max_frames=frames)
        launched = n_streams
        t0 = time.perf_counter()
        while finished[0] < total and engine.has_work():
            t = time.perf_counter(); engine.dispatch_step(); t_disp += time.perf_counter() - t
            n_disp += 1
            while True:
                t = time.perf_counter(); records = engine.take_due(); t_take += time.perf_counter() - t
                if not records:
                    break
                t = time.perf_counter(); fetched = engine.fetch(records); t_fetch += time.perf_counter() - t
                n_fetch += 1
                t = time.perf_counter(); out = engine.account(records, fetched); t_acct += time.perf_counter() - t
                done_frames[0] += len(out)
                for sid, fr in out:
                    if fr["finished"]:
                        finished[0] += 1
                        if launched < total:
                            engine.submit(prompt, max_frames=frames)
                            launched += 1
        dt = time.perf_counter() - t0
        aus = done_frames[0] / FRAME_RATE / dt
        print(f"  frames={done_frames[0]} dt={dt:.2f}s {aus:.0f} audio-s/s | "
              f"disp {t_disp:.2f}s/{n_disp} ({t_disp/max(n_disp,1)*1e3:.1f}ms) "
              f"take {t_take:.2f}s fetch {t_fetch:.2f}s/{n_fetch} "
              f"({t_fetch/max(n_fetch,1)*1e3:.1f}ms) acct {t_acct:.2f}s", flush=True)

    print("[shakedown]", flush=True)
    run(8, 16, 24)
    for i in range(args.reps):
        print(f"[rep {i}]", flush=True)
        run(args.streams, args.total_mult * args.streams, args.frames)


main()
