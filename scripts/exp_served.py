"""Served-path instrumentation: where do the milliseconds go?

Runs the DecodeEngine under closed-loop load three ways and prints a
breakdown instead of a single number:

1. SYNC: engine.step() loop on one thread (dispatch+fetch serialized) —
   the lower bound that needs no thread reasoning.
2. LOOP: EngineLoop (dispatch thread + N fetchers) — the server's shape.
3. RAW: device-only rates for the same programs (chunk dispatch back to
   back without fetches; one fetch timed alone) — the physics ceiling.

Per phase it reports: dispatches/s, frames/s, audio-s/s, fetch call count
and mean/max duration, bytes fetched, and (LOOP) per-stream first-audio
percentiles. jax_log_compiles is ON so any compile inside a timed window
is visible in stderr.

Usage (TPU host): python scripts/exp_served.py [--streams 64] [--frames 160]
"""

from __future__ import annotations

import argparse
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

_plat = __import__("os").environ.get("JAX_PLATFORMS", "")
if _plat and "cpu" not in _plat.split(","):
    jax.config.update("jax_platforms", _plat + ",cpu")
jax.config.update(
    "jax_compilation_cache_dir",
    str(Path(__file__).resolve().parent.parent / ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_log_compiles", True)
import jax.numpy as jnp
import numpy as np

FRAME_RATE = 12.5


def build(streams: int, chunk: int, fetchers: int, max_ahead: int):
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
    # Host-side init + quantize, one transfer (bench.py's scheme): ~25 s
    # instead of ~140 s of device-side init compiles.
    cpu = jax.devices("cpu")[0] if any(
        d.platform == "cpu" for d in jax.devices("cpu")
    ) else None
    import contextlib
    with jax.default_device(cpu) if cpu is not None else contextlib.nullcontext():
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
        num_slots=streams, max_seq_len=1024, kv_dtype=jnp.int8,
        prompt_bucket=64, mimi_params=mimi_params, mimi_cfg=mimi_cfg,
        inflight=1, fetch_every=1, emit_int16=True, chunk_frames=chunk,
        admit_sizes=[1, 4], attend_buckets=[256],
    )
    t0 = time.perf_counter()
    engine.warm(parallel=6, buckets=[256])
    print(f"[warm] {time.perf_counter()-t0:.1f}s", flush=True)
    return engine


class FetchTimer:
    """Wraps DecodeEngine.fetch to record durations/bytes."""

    def __init__(self, engine):
        self.engine = engine
        self.durations = []
        self.bytes = 0
        self.lock = threading.Lock()
        self._orig = engine.fetch

        def timed(records):
            t0 = time.perf_counter()
            out = self._orig(records)
            dt = time.perf_counter() - t0
            nbytes = sum(
                sum(getattr(a, "nbytes", 0) for a in jax.tree.leaves(x)) for x in out
            )
            with self.lock:
                self.durations.append(dt)
                self.bytes += nbytes
            return out

        engine.fetch = timed

    def stats(self):
        with self.lock:
            d = sorted(self.durations)
            if not d:
                return "no fetches"
            return (f"fetches={len(d)} mean={np.mean(d)*1e3:.1f}ms "
                    f"p50={d[len(d)//2]*1e3:.1f}ms max={d[-1]*1e3:.1f}ms "
                    f"bytes={self.bytes/1e6:.1f}MB")

    def reset(self):
        with self.lock:
            self.durations, self.bytes = [], 0


def run_sync(engine, prompt, n_streams, total, frames):
    done_frames = [0]
    finished = [0]
    for _ in range(n_streams):
        engine.submit(prompt, max_frames=frames)
    launched = n_streams
    t0 = time.perf_counter()
    while finished[0] < total:
        out = engine.step()
        done_frames[0] += len(out)
        for sid, fr in out:
            if fr["finished"]:
                finished[0] += 1
                if launched < total:
                    engine.submit(prompt, max_frames=frames)
                    launched += 1
        if not engine.has_work() and finished[0] < total:
            break
    dt = time.perf_counter() - t0
    return done_frames[0], dt


def run_loop(engine, prompt, n_streams, total, frames, fetchers, max_ahead):
    from smoltts_tpu.lm.engine import EngineLoop

    loop = EngineLoop(engine, max_ahead=max_ahead, fetchers=fetchers)
    lock = threading.Lock()
    lats = []
    frames_done = [0]
    state = {"launched": 0, "completed": 0}
    all_done = threading.Event()

    def consume(q, t_submit):
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
            state["completed"] += 1
            if state["launched"] < total:
                state["launched"] += 1
                nxt = True
            elif state["completed"] >= total:
                all_done.set()
        if nxt:
            start()

    def start():
        t = time.perf_counter()
        q = loop.submit(prompt, max_frames=frames)
        threading.Thread(target=consume, args=(q, t), daemon=True).start()

    t0 = time.perf_counter()
    with lock:
        state["launched"] = n_streams
    for _ in range(n_streams):
        start()
    ok = all_done.wait(timeout=900)
    dt = time.perf_counter() - t0
    loop.stop()
    lats.sort()
    pct = lambda p: lats[min(len(lats) - 1, int(p * len(lats)))] if lats else -1
    return frames_done[0], dt, pct(0.5), pct(0.95), ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=64)
    ap.add_argument("--frames", type=int, default=160)
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--fetchers", type=int, default=3)
    ap.add_argument("--max-ahead", type=int, default=3)
    ap.add_argument("--total-mult", type=int, default=2)
    ap.add_argument("--phases", nargs="*", default=["raw", "sync", "loop"])
    args = ap.parse_args()

    engine = build(args.streams, args.chunk, args.fetchers, args.max_ahead)
    ft = FetchTimer(engine)
    prompt = np.zeros((engine.cfg.num_rows, 48), np.int32)
    prompt[0] = np.random.default_rng(0).integers(0, 320, 48)
    total = args.total_mult * args.streams

    # SHAKEDOWN: the first execution of each freshly loaded program stalls
    # for up to minutes on this runtime (PERF.md "first-execution stalls") —
    # absorb it before any timed phase.
    t0 = time.perf_counter()
    for _ in range(4):
        engine.submit(prompt, max_frames=6)
    while engine.has_work():
        engine.step()
    ft.reset()
    for k in engine.stats:
        engine.stats[k] = 0
    print(f"[shakedown] {time.perf_counter()-t0:.1f}s", flush=True)

    if "raw" in args.phases:
        # Physics: back-to-back chunk dispatches, one fence at the end.
        for _ in range(args.streams):
            engine.submit(prompt, max_frames=10**9)
        engine.dispatch_step()  # admission
        engine._queue.clear()
        N = 12
        t0 = time.perf_counter()
        for _ in range(N):
            engine.dispatch_step()
        recs = list(engine._queue)
        engine._queue.clear()
        last = recs[-1]
        np.asarray(last.payload[0])  # fence on codes only (tiny)
        dt_disp = time.perf_counter() - t0
        t0 = time.perf_counter()
        engine.fetch([last])
        dt_fetch = time.perf_counter() - t0
        frames = N * args.chunk * args.streams
        print(f"[raw] {N} chunk dispatches: {dt_disp:.3f}s "
              f"({frames/FRAME_RATE/dt_disp:.0f} audio-s/s device ceiling); "
              f"one record fetch: {dt_fetch*1e3:.1f}ms "
              f"({sum(a.nbytes for a in jax.tree.leaves(engine.fetch([last])))/1e6:.2f}MB)",
              flush=True)
        # Parallel-fetch scaling: do K concurrent device_gets overlap on
        # this runtime (EngineLoop fetchers>1 rationale) or serialize?
        # Distinct un-fetched records per arm (a re-fetch of an already
        # device_get'd jax.Array returns its cached host value — measuring
        # that "parallel" is measuring nothing).
        K = min(3, len(recs) // 2)
        t0 = time.perf_counter()
        for r in recs[:K]:
            engine.fetch([r])
        serial = time.perf_counter() - t0
        fresh = recs[K:2 * K]
        ths = [threading.Thread(target=engine.fetch, args=([r],)) for r in fresh]
        t0 = time.perf_counter()
        for t in ths:
            t.start()
        for t in ths:
            t.join()
        par = time.perf_counter() - t0
        print(f"[raw] {K} record fetches: serial {serial*1e3:.0f}ms, "
              f"parallel {par*1e3:.0f}ms (scaling x{serial/max(par,1e-9):.2f})",
              flush=True)
        # reset engine state: evict everything
        for sid in list(engine._streams):
            engine._release(sid)
        engine._pending.clear()
        engine._queue.clear()
        ft.reset()

    if "sync" in args.phases:
        nf, dt = run_sync(engine, prompt, args.streams, total, args.frames)
        print(f"[sync] {nf} frames in {dt:.1f}s = {nf/FRAME_RATE/dt:.0f} audio-s/s; "
              f"{ft.stats()}; stats={engine.stats}", flush=True)
        ft.reset()
        for k in engine.stats:
            engine.stats[k] = 0

    if "loop" in args.phases:
        nf, dt, p50, p95, ok = run_loop(
            engine, prompt, args.streams, total, args.frames,
            args.fetchers, args.max_ahead)
        print(f"[loop] ok={ok} {nf} frames in {dt:.1f}s = "
              f"{nf/FRAME_RATE/dt:.0f} audio-s/s; first-audio p50={p50:.0f}ms "
              f"p95={p95:.0f}ms; {ft.stats()}; stats={engine.stats}", flush=True)


if __name__ == "__main__":
    main()
