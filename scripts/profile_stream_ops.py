"""Per-op XLA profile of the bench-configured fused stream step.

Runs the exact program bench.py measures — int8 weights, attend bucket 256,
B=64 — under jax.profiler and prints the top device ops by total time, so
optimization effort goes where the time is.
"""

from __future__ import annotations

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

B = int(os.environ.get("B", "64"))
BUCKET = int(os.environ.get("BUCKET", "256"))
FRAMES = int(os.environ.get("FRAMES", "40"))
INT8 = os.environ.get("INT8", "1") != "0"


def main():
    from smoltts_tpu.codec.config import MimiConfig
    from smoltts_tpu.codec.mimi import decode_stream_init, init_mimi_params
    from smoltts_tpu.config import smoltts_byte_150m
    from smoltts_tpu.lm.decode import init_decode_state
    from smoltts_tpu.lm.pipeline import make_stream_step
    from smoltts_tpu.lm.samplers import GenerationSettings
    from smoltts_tpu.models.dual_ar import init_params
    from smoltts_tpu.tokenizer import TokenConfig
    from smoltts_tpu.utils.profiling import device_op_summary

    cfg = smoltts_byte_150m().model_copy(
        update=dict(use_gradient_checkpointing=False, dropout=0.0)
    )
    token_cfg = TokenConfig.smoltts_v0()
    settings = GenerationSettings(default_temp=0.7, default_fast_temp=0.7, min_p=0.05)
    mimi_cfg = MimiConfig()

    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    mimi_params = init_mimi_params(mimi_cfg, dtype=jnp.bfloat16)
    if INT8:
        from smoltts_tpu.ops.quant import quantize_decode_params, quantize_mimi_params

        params = quantize_decode_params(params)
        mimi_params = quantize_mimi_params(mimi_params)

    state = init_decode_state(cfg, B, 1024, dtype=jnp.bfloat16)
    mstate = decode_stream_init(mimi_cfg, B, dtype=jnp.bfloat16)
    step = make_stream_step(cfg, token_cfg, settings, mimi_cfg, attend_limit=BUCKET)
    rng = jax.random.PRNGKey(1)

    # warm up / compile
    for _ in range(3):
        state, mstate, rng, out = step(params, mimi_params, state, mstate, rng)
    jax.block_until_ready(out.pcm)

    log_dir = "/tmp/smoltts_stream_trace"
    with jax.profiler.trace(log_dir):
        for _ in range(FRAMES):
            state, mstate, rng, out = step(params, mimi_params, state, mstate, rng)
        jax.block_until_ready(out.pcm)

    rows = device_op_summary(log_dir, top_k=40)
    total = sum(r[1] for r in rows)
    print(f"B={B} bucket={BUCKET} int8={INT8} frames={FRAMES}")
    print(f"{'op':<60} {'total_ms':>9} {'count':>6} {'ms/frame':>9}")
    for name, ms, count in rows:
        print(f"{name[:60]:<60} {ms:9.3f} {count:6d} {ms / FRAMES:9.4f}")
    print(f"{'TOTAL(top40)':<60} {total:9.3f} {'':6} {total / FRAMES:9.4f}")


if __name__ == "__main__":
    main()
