"""Bisect the fused-fast-loop compile wedge (VERDICT r2 item 5).

Round 2 observed: embedding the Pallas fast-loop kernel
(ops/fast_loop.py) inside the large fused pipeline programs "wedges" this
host's remote-compile service, so the kernel shipped opt-in
(SMOLTTS_FUSED_FAST=1). Round 2's chunked "regression" later turned out to
be an environmental runtime stall (PERF.md), so the wedge deserves a retest
and, if real, a bisection: which containing program hangs —

  a) the standalone kernel                      (known good, 3/3 in r2)
  b) jit(decode_frame) with the kernel inside   (LM only)
  c) make_stream_step (LM + vocoder)            (the recorded bench path)
  d) make_chunk_step  (16-frame lax.scan)       (throughput path)

Each stage runs in a fresh subprocess with a hard timeout so a wedge can't
take the harness down; results print per stage. Run on the TPU host:
  python scripts/wedge_fast_loop.py [--timeout 420]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).parent.parent

STAGE_SRC = r'''
import sys, time
sys.path.insert(0, __REPO__)
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_wedge")
import jax.numpy as jnp
import numpy as np

from smoltts_tpu.codec.config import MimiConfig
from smoltts_tpu.codec.mimi import decode_stream_init, init_mimi_params
from smoltts_tpu.config import smoltts_byte_150m
from smoltts_tpu.lm.decode import decode_frame, init_decode_state
from smoltts_tpu.lm.samplers import GenerationSettings
from smoltts_tpu.models.dual_ar import init_params
from smoltts_tpu.ops.quant import (
    fuse_decode_params, fuse_mimi_decode_params,
    quantize_decode_params, quantize_mimi_params,
)
from smoltts_tpu.tokenizer import TokenConfig

stage = __STAGE__
cfg = smoltts_byte_150m().model_copy(
    update=dict(use_gradient_checkpointing=False, dropout=0.0))
token_cfg = TokenConfig.smoltts_v0()
settings = GenerationSettings(default_temp=0.7, default_fast_temp=0.7, min_p=0.05)
mimi_cfg = MimiConfig()
B, S = 64, 1024

params = quantize_decode_params(fuse_decode_params(
    init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)))
t0 = time.time()

if stage == "standalone":
    from smoltts_tpu.ops.fast_loop import fused_fast_micro_loop, supports_fused_fast
    assert supports_fused_fast(cfg, params), "gating rejected the 150M tree"
    hidden = jax.random.normal(jax.random.PRNGKey(1), (B, cfg.dim), jnp.bfloat16)
    fn = jax.jit(lambda h, r: fused_fast_micro_loop(params, cfg, h, r, settings))
    out = np.asarray(fn(hidden, jax.random.PRNGKey(2)))
    print(f"OK standalone: codes {out.shape} compile+run {time.time()-t0:.1f}s", flush=True)
elif stage == "decode_frame":
    state = init_decode_state(cfg, B, S, dtype=jnp.int8, tail_len=128)
    fn = jax.jit(lambda s, r: decode_frame(
        params, cfg, token_cfg, settings, s, r, attend_limit=256))
    s2, out = fn(state, jax.random.PRNGKey(2))
    np.asarray(out.audio_codes)
    print(f"OK decode_frame: compile+run {time.time()-t0:.1f}s", flush=True)
else:
    from smoltts_tpu.lm.pipeline import make_chunk_step, make_stream_step
    mimi_params = quantize_mimi_params(fuse_mimi_decode_params(
        init_mimi_params(mimi_cfg, dtype=jnp.bfloat16)))
    state = init_decode_state(cfg, B, S, dtype=jnp.int8, tail_len=128)
    mstate = decode_stream_init(mimi_cfg, B, dtype=jnp.bfloat16,
                                tail_len=64, kv_dtype=jnp.int8)
    if stage == "stream_step":
        step = make_stream_step(cfg, token_cfg, settings, mimi_cfg, attend_limit=256)
        state, mstate, rng, out = step(params, mimi_params, state, mstate,
                                       jax.random.PRNGKey(2))
        np.asarray(out.pcm[:2, :4, 0])
        print(f"OK stream_step: compile+run {time.time()-t0:.1f}s", flush=True)
    elif stage == "chunk_step":
        step = make_chunk_step(cfg, token_cfg, settings, mimi_cfg, 16, attend_limit=256)
        state, mstate, rng, out = step(params, mimi_params, state, mstate,
                                       jax.random.PRNGKey(2))
        np.asarray(out.pcm[:2, :4, 0])
        print(f"OK chunk_step: compile+run {time.time()-t0:.1f}s", flush=True)
'''


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--timeout", type=int, default=420)
    ap.add_argument("--stages", nargs="*",
                    default=["standalone", "decode_frame", "stream_step", "chunk_step"])
    args = ap.parse_args()

    results = {}
    for stage in args.stages:
        src = STAGE_SRC.replace("__REPO__", repr(str(REPO))).replace("__STAGE__", repr(stage))
        env = dict(os.environ, SMOLTTS_FUSED_FAST="1")
        t0 = time.time()
        try:
            p = subprocess.run([sys.executable, "-c", src], env=env,
                               capture_output=True, text=True, timeout=args.timeout)
            ok = p.returncode == 0
            tail = (p.stdout + p.stderr).strip().splitlines()[-1:] or [""]
            results[stage] = ("ok" if ok else f"rc={p.returncode}", tail[0])
        except subprocess.TimeoutExpired:
            results[stage] = ("WEDGED", f"no result in {args.timeout}s")
        print(f"[{stage}] {results[stage][0]} ({time.time()-t0:.0f}s): "
              f"{results[stage][1][:160]}", flush=True)
    wedged = [s for s, (r, _) in results.items() if r == "WEDGED"]
    print("WEDGED STAGES:", wedged or "none")


if __name__ == "__main__":
    main()
