"""Raw-GEMM calibration for the training-step anatomy (PERF.md).

Measures achieved TFLOP/s on THIS chip for the exact matmul shapes the
150M train step is made of (fast/slow trunk projections and FFN at
batch 16 x seq 768), plus a fused SwiGLU chain and a transformer-layer-
shaped composite. Purpose: separate "the step wastes time" from "these
shapes run at X% of paper peak on this part" — the step's model-FLOPs MFU
can only be judged against the raw ceiling, not the 197 TFLOP/s banner.

Usage: python scripts/exp_gemm.py [--iters 20]
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


def timed(fn, args, iters, flops):
    """Chained-dependency timing with a scalar fetch: block_until_ready is
    NOT a reliable fence on the tunneled runtime (profile_train.py), and
    independent matmuls would overlap — chain each iteration's input on the
    previous output so `iters` executions serialize, then fetch a scalar."""
    out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))  # warm/compile
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        o = None
        for _ in range(iters):
            o = fn(*args)
            args = (args[0] + o[0, 0] * 0, *args[1:])  # serialize on o
        float(jnp.sum(o.astype(jnp.float32)))
        times.append((time.perf_counter() - t0) / iters)
    dt = float(np.median(times))
    return round(flops / dt / 1e12, 1), round(dt * 1e3, 3)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()
    key = jax.random.PRNGKey(0)
    results = {"device": str(jax.devices()[0]), "dtype": "bf16"}

    def mk(*shape):
        nonlocal key
        key, sub = jax.random.split(key)
        return jax.random.normal(sub, shape, jnp.bfloat16)

    # The step's GEMM population (B*T = 12288 slow tokens, 98304 fast tokens)
    cases = {
        # fast trunk (98304 rows)
        "fast_ffn_up [98304,768]x[768,3072]": ((98304, 768), (768, 3072)),
        "fast_ffn_down [98304,3072]x[3072,768]": ((98304, 3072), (3072, 768)),
        "fast_qkv [98304,768]x[768,1280]": ((98304, 768), (768, 1280)),
        "fast_wo [98304,768]x[768,768]": ((98304, 768), (768, 768)),
        # slow trunk (12288 rows)
        "slow_ffn_up [12288,768]x[768,3072]": ((12288, 768), (768, 3072)),
        "slow_qkv [12288,768]x[768,1280]": ((12288, 768), (768, 1280)),
        # token head
        "head [12288,768]x[768,2368]": ((12288, 768), (768, 2368)),
        # square calibration point
        "square [8192,8192]x[8192,8192]": ((8192, 8192), (8192, 8192)),
    }
    jit_mm = jax.jit(lambda a, b: a @ b)
    for name, (sa, sb) in cases.items():
        a, b = mk(*sa), mk(*sb)
        fl = 2.0 * sa[0] * sa[1] * sb[1]
        tf, ms = timed(jit_mm, (a, b), args.iters, fl)
        results[name] = {"tflops": tf, "ms": ms}

    # Fused SwiGLU chain at fast shapes: w2(silu(x w1) * (x w3))
    x, w1, w3, w2 = mk(98304, 768), mk(768, 3072), mk(768, 3072), mk(3072, 768)
    f = jax.jit(lambda x, w1, w3, w2: (jax.nn.silu(x @ w1) * (x @ w3)) @ w2)
    fl = 2.0 * 98304 * 768 * 3072 * 3
    tf, ms = timed(f, (x, w1, w3, w2), args.iters, fl)
    results["fast_swiglu_chain"] = {"tflops": tf, "ms": ms}

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
