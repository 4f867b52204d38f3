"""Sweep EngineLoop (fetchers, max_ahead) under closed-loop load, best of N
reps per config (this host's runtime stalls 50x for ~25 s windows at random —
see PERF.md — so a single window is meaningless).

Usage: python scripts/exp_loop_sweep.py [--reps 3] [--frames 120]
"""

from __future__ import annotations

import argparse
import sys
import threading
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


def run_loop(engine, prompt, n_streams, total, frames, fetchers, max_ahead):
    from smoltts_tpu.lm.engine import EngineLoop

    loop = EngineLoop(engine, max_ahead=max_ahead, fetchers=fetchers)
    lock = threading.Lock()
    lats, steady_lats = [], []
    frames_done = [0]
    state = {"launched": 0, "completed": 0}
    all_done = threading.Event()
    len_rng = np.random.default_rng(7)

    def consume(q, t_submit, steady):
        n, first = 0, None
        while True:
            fr = q.get()
            if fr is None:
                break
            if first is None and "pcm" in fr:
                first = time.perf_counter() - t_submit
            n += 1
        nxt = False
        with lock:
            frames_done[0] += n
            if first is not None:
                lats.append(first * 1e3)
                if steady:
                    steady_lats.append(first * 1e3)
            state["completed"] += 1
            if state["launched"] < total:
                state["launched"] += 1
                nxt = True
            elif state["completed"] >= total:
                all_done.set()
        if nxt:
            start(True)

    def start(steady):
        budget = int(len_rng.integers(frames // 2, frames * 3 // 2 + 1))
        t = time.perf_counter()
        q = loop.submit(prompt, max_frames=budget)
        threading.Thread(target=consume, args=(q, t, steady), daemon=True).start()

    t0 = time.perf_counter()
    with lock:
        state["launched"] = n_streams
    for _ in range(n_streams):
        start(False)
    ok = all_done.wait(timeout=600)
    dt = time.perf_counter() - t0
    loop.stop()
    lats.sort()
    steady_lats.sort()

    def pct(arr, p):
        return arr[min(len(arr) - 1, int(p * len(arr)))] if arr else -1

    return dict(
        ok=ok,
        audio_s_per_s=frames_done[0] / FRAME_RATE / dt,
        p50=pct(lats, 0.5), p95=pct(lats, 0.95),
        steady_p50=pct(steady_lats, 0.5),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=64)
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--configs", nargs="*",
                    default=["3:3", "4:3", "2:3", "3:6", "4:6", "3:2"])
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

    # shakedown through the loop machinery itself
    t0 = time.perf_counter()
    r = run_loop(engine, prompt, 8, 16, 24, 2, 3)
    print(f"[shakedown] {time.perf_counter()-t0:.1f}s {r}", flush=True)

    total = 2 * args.streams
    for spec in args.configs:
        f, ma = (int(x) for x in spec.split(":"))
        best = None
        for i in range(args.reps):
            r = run_loop(engine, prompt, args.streams, total, args.frames, f, ma)
            print(f"  [f={f} ma={ma} rep{i}] {r}", flush=True)
            if best is None or r["audio_s_per_s"] > best["audio_s_per_s"]:
                best = r
        print(f"[f={f} ma={ma}] BEST {best}", flush=True)


main()
