"""Isolate the engine chunk-dispatch cost: program vs host logic vs flush.

Measured r4 finding to explain: engine 8-frame chunk dispatches run ~25 ms/
frame while the pipeline 16-frame chunk runs ~5.3 ms/frame at the same
model/batch. Phases (each after shakedown, one fence per timed window):

  prog    - the jitted decode_vocode_chunk called directly in a loop
  disp    - engine.dispatch_step() loop (host bookkeeping + flush cadence)
  noflush - dispatch_step() with the flush suppressed
  flush   - the flush program alone
  single  - single-frame decode_vocode direct loop
  pipe    - pipeline make_chunk_step at the same chunk size (reference)

Usage: python scripts/exp_engine_raw.py [--chunk 8] [--tail 128]
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
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--tail", type=int, default=128)
    ap.add_argument("--mimi-tail", type=int, default=64)
    ap.add_argument("--reps", type=int, default=12)
    ap.add_argument("--phases", nargs="*",
                    default=["prog", "disp", "noflush", "flush", "single", "pipe"])
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

    B, K = args.streams, args.chunk
    engine = DecodeEngine(
        params, cfg, token_cfg, settings,
        num_slots=B, max_seq_len=1024, kv_dtype=jnp.int8,
        prompt_bucket=64, mimi_params=mimi_params, mimi_cfg=mimi_cfg,
        inflight=1, fetch_every=1, emit_int16=True, chunk_frames=K,
        admit_sizes=[1, 4], attend_buckets=[256], tail_len=args.tail,
    )
    t0 = time.perf_counter()
    engine.warm(parallel=6, buckets=[256])
    print(f"[warm] {time.perf_counter()-t0:.1f}s", flush=True)

    prompt = np.zeros((cfg.num_rows, 48), np.int32)
    prompt[0] = np.random.default_rng(0).integers(0, 320, 48)

    # occupy all slots, absorb first-execution stalls
    t0 = time.perf_counter()
    for _ in range(B):
        engine.submit(prompt, max_frames=10**9)
    engine.dispatch_step()
    for _ in range(3):
        engine.dispatch_step()
    recs = list(engine._queue)
    engine._queue.clear()
    np.asarray(recs[-1].payload[0])
    print(f"[shakedown] {time.perf_counter()-t0:.1f}s", flush=True)

    def fence():
        # cheap fence: fetch the tiny codes array of the last dispatch
        if engine._queue:
            np.asarray(engine._queue[-1].payload[0])
            engine._queue.clear()

    def report(label, frames, dt):
        per = dt / args.reps * 1e3
        print(f"[{label}] {args.reps} reps: {dt:.3f}s = {per:.1f} ms/dispatch, "
              f"{frames / FRAME_RATE / dt:.0f} audio-s/s", flush=True)

    if "prog" in args.phases:
        st, ms_, rng = engine.state, engine.mimi_state, engine.rng
        out = None
        t0 = time.perf_counter()
        for _ in range(args.reps):
            st, ms_, out, pcm, rng = engine._decode_vocode_chunk(
                engine.params, engine.mimi_params, st, ms_, rng, 256)
        np.asarray(out[0])
        report("prog", args.reps * K * B, time.perf_counter() - t0)

    if "disp" in args.phases:
        t0 = time.perf_counter()
        for _ in range(args.reps):
            engine.dispatch_step()
        fence()
        report("disp", args.reps * K * B, time.perf_counter() - t0)

    if "noflush" in args.phases:
        t0 = time.perf_counter()
        for _ in range(args.reps):
            engine._since_flush = 0  # suppress the cadence
            engine.dispatch_step()
        fence()
        report("noflush", args.reps * K * B, time.perf_counter() - t0)

    if "flush" in args.phases:
        t0 = time.perf_counter()
        for _ in range(args.reps):
            engine.state, engine.mimi_state = engine._flush(
                engine.state, engine.mimi_state)
        np.asarray(engine.state.pos)
        report("flush", args.reps * K * B, time.perf_counter() - t0)

    if "single" in args.phases:
        st, ms_, rng = engine.state, engine.mimi_state, engine.rng
        out = None
        t0 = time.perf_counter()
        for _ in range(args.reps):
            st, ms_, out, pcm, rng = engine._decode_vocode(
                engine.params, engine.mimi_params, st, ms_, rng, 256)
        np.asarray(out.audio_codes)
        report("single", args.reps * B, time.perf_counter() - t0)

    if "pipe" in args.phases:
        from smoltts_tpu.codec.mimi import decode_stream_init
        from smoltts_tpu.lm.decode import init_decode_state
        from smoltts_tpu.lm.pipeline import make_chunk_step

        chunk_step = make_chunk_step(
            cfg, token_cfg, settings, mimi_cfg, K, attend_limit=256)
        st = init_decode_state(cfg, B, 1024, dtype=jnp.int8, tail_len=2 * K)
        ms_ = decode_stream_init(
            mimi_cfg, B, dtype=jnp.bfloat16, tail_len=4 * K, kv_dtype=jnp.int8)
        key = jax.random.PRNGKey(1)
        st, ms_, key, out = chunk_step(params, mimi_params, st, ms_, key)  # compile
        np.asarray(out.pcm[0, :2, 0])
        t0 = time.perf_counter()
        for _ in range(args.reps):
            st, ms_, key, out = chunk_step(params, mimi_params, st, ms_, key)
        np.asarray(out.audio_codes)
        report("pipe", args.reps * K * B, time.perf_counter() - t0)


main()
