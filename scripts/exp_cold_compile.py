"""Staged cold-compile timing for the bench programs.

Answers, on this host (tunneled TPU runtime):
  1. How long does each bench program take to lower vs compile, cold?
  2. Do compiles overlap when issued from multiple Python threads
     (remote compile service => total ~= max instead of sum)?

Usage:
  COLD_CACHE=/tmp/jax_cache_cold python scripts/exp_cold_compile.py [--parallel]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

cache = os.environ.get("COLD_CACHE", "/tmp/jax_cache_cold")
import shutil

if os.environ.get("KEEP_CACHE") != "1":
    shutil.rmtree(cache, ignore_errors=True)

import jax

jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

PARALLEL = "--parallel" in sys.argv

T0 = time.perf_counter()


def mark(label):
    print(f"[{time.perf_counter() - T0:7.1f}s] {label}", flush=True)


def main():
    from smoltts_tpu.codec.config import MimiConfig
    from smoltts_tpu.codec.mimi import decode_stream_init, init_mimi_params
    from smoltts_tpu.config import smoltts_byte_150m
    from smoltts_tpu.lm.decode import init_decode_state
    from smoltts_tpu.lm.pipeline import (
        make_chunk_step,
        make_flush_step,
        make_prefill_step,
        make_stream_step,
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

    mark("imports done")
    cfg = smoltts_byte_150m().model_copy(
        update=dict(use_gradient_checkpointing=False, dropout=0.0)
    )
    token_cfg = TokenConfig.smoltts_v0()
    settings = GenerationSettings(default_temp=0.7, default_fast_temp=0.7, min_p=0.05)
    mimi_cfg = MimiConfig()

    os.environ.setdefault("SMOLTTS_FUSED_FAST", os.environ.get("EXP_FUSED", "1"))

    t = time.perf_counter()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    jax.block_until_ready(params)
    mark(f"init_params {time.perf_counter()-t:.1f}s")

    t = time.perf_counter()
    mimi_params = init_mimi_params(mimi_cfg, dtype=jnp.bfloat16)
    jax.block_until_ready(mimi_params)
    mark(f"init_mimi_params {time.perf_counter()-t:.1f}s")

    t = time.perf_counter()
    params = fuse_decode_params(params)
    mimi_params = fuse_mimi_decode_params(mimi_params)
    params = quantize_decode_params(params)
    mimi_params = quantize_mimi_params(mimi_params)
    jax.block_until_ready((params, mimi_params))
    mark(f"fuse+quantize {time.perf_counter()-t:.1f}s")

    B, S, PROMPT_LEN, BUCKET, CHUNK = 64, 1024, 64, 256, 16
    rng = np.random.default_rng(0)
    prompt = np.zeros((B, cfg.num_rows, PROMPT_LEN), np.int32)
    prompt[:, 0] = rng.integers(0, 320, (B, PROMPT_LEN))
    prompt = jnp.asarray(prompt)
    prompt_len = jnp.full((B,), PROMPT_LEN, jnp.int32)

    from smoltts_tpu.lm.pipeline import _split_lm, _split_mimi

    state = init_decode_state(cfg, B, S, dtype=jnp.int8, tail_len=128)
    mstate = decode_stream_init(
        mimi_cfg, B, dtype=jnp.bfloat16, tail_len=64, kv_dtype=jnp.int8
    )
    key = jax.random.PRNGKey(1)

    prefill_step = make_prefill_step(cfg, token_cfg, settings, mimi_cfg)
    stream_step = make_stream_step(cfg, token_cfg, settings, mimi_cfg, attend_limit=BUCKET)
    chunk_step = make_chunk_step(cfg, token_cfg, settings, mimi_cfg, CHUNK, attend_limit=BUCKET)
    flush_step = make_flush_step()

    # AOT: lower then compile, timed separately. The wrapped steps hide the
    # jitted fn; reach in via __wrapped__-style closure or just trace the
    # public callable with jax.jit? Simplest: time first full call (compile+run)
    # but separate lowering via jax.jit(...).lower on the inner jitted where
    # accessible. For wrapped (stream/chunk) we time the wrapped call.
    def timed(label, fn):
        t = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        dt = time.perf_counter() - t
        mark(f"{label} {dt:.1f}s")
        return out

    jobs = [
        ("prefill(compile+run)", lambda: prefill_step(
            params, mimi_params, state, mstate, prompt, prompt_len, key)),
        ("stream(compile+run)", lambda: stream_step(
            params, mimi_params, state, mstate, key)),
        ("chunk(compile+run)", lambda: chunk_step(
            params, mimi_params, state, mstate, key)),
        ("flush(compile+run)", lambda: flush_step(state, mstate)),
    ]
    if PARALLEL:
        from concurrent.futures import ThreadPoolExecutor

        t = time.perf_counter()
        with ThreadPoolExecutor(max_workers=4) as ex:
            futs = {ex.submit(fn): label for label, fn in jobs}
            for f in futs:
                f.result()
        mark(f"ALL PARALLEL {time.perf_counter()-t:.1f}s")
    else:
        for label, fn in jobs:
            timed(label, fn)
    mark("DONE")


main()
