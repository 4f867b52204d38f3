"""Per-component timing of the streaming frame step on real hardware.

Methodology note (axon tunnel): `jax.block_until_ready` is not a reliable
completion barrier over the tunnel and bulk device->host transfers are slow,
so every timed program returns a SCALAR (jnp.sum of its output) and the
timer fetches that scalar with float(...) — 4 bytes, forcing execution.
A null program measures the dispatch+fetch floor, which is subtracted.

Stages: slow trunk | fast micro-loop | LM frame | vocoder | full fused frame.
Also sweeps batch size to find the throughput-optimal stream count.
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
import numpy as np

S = 1024
ITERS = int(os.environ.get("ITERS", "30"))


def timed_scalar(fn_returning_scalar, args, iters=ITERS):
    """Median ms/iter, forcing completion by fetching a 4-byte scalar."""
    float(fn_returning_scalar(*args))  # warm/compile
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(iters):
            x = fn_returning_scalar(*args)
        float(x)
        times.append((time.perf_counter() - t0) / iters * 1e3)
    return float(np.median(times))


def main():
    from smoltts_tpu.codec.config import MimiConfig
    from smoltts_tpu.codec.mimi import decode_stream_init, init_mimi_params, mimi_decode_step
    from smoltts_tpu.config import smoltts_byte_150m
    from smoltts_tpu.lm.decode import (
        _decode_trunk,
        _fast_micro_loop,
        decode_frame,
        init_decode_state,
    )
    from smoltts_tpu.lm.pipeline import make_stream_step
    from smoltts_tpu.lm.samplers import GenerationSettings
    from smoltts_tpu.models.dual_ar import slow_dims
    from smoltts_tpu.models.layers import rope_cos_sin
    from smoltts_tpu.tokenizer import TokenConfig
    from smoltts_tpu.models.dual_ar import init_params

    cfg = smoltts_byte_150m().model_copy(
        update=dict(use_gradient_checkpointing=False, dropout=0.0)
    )
    token_cfg = TokenConfig.smoltts_v0()
    settings = GenerationSettings(default_temp=0.7, default_fast_temp=0.7, min_p=0.05)
    mimi_cfg = MimiConfig()

    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    mimi_params = init_mimi_params(mimi_cfg, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(1)

    print(f"device={jax.devices()[0]}")

    # Floor: null scalar program.
    zero = jnp.zeros(())
    null = jax.jit(lambda z: z + 1.0)
    t_floor = timed_scalar(null, (zero,))
    print(f"dispatch+fetch floor : {t_floor:7.3f} ms")

    for B in [int(x) for x in os.environ.get("SWEEP", "8,16,32,64,128").split(",")]:
        state = init_decode_state(cfg, B, S, dtype=jnp.bfloat16)
        mstate = decode_stream_init(mimi_cfg, B, dtype=jnp.bfloat16)

        # slow trunk single-position step
        x = jnp.zeros((B, 1, cfg.dim), jnp.bfloat16)

        def slow_only(p, st, xx):
            cos, sin = rope_cos_sin(st.pos[:, None], cfg.head_dim, cfg.rope_base)
            h, _, _, _, _ = _decode_trunk(
                p["layers"], xx, st.k, st.v, st.pos, slow_dims(cfg), cos, sin,
                causal_within=False, norm_eps=cfg.norm_eps,
            )
            return jnp.sum(h.astype(jnp.float32))

        t_slow = timed_scalar(jax.jit(slow_only), (params, state, x))

        # fast micro-loop
        h = jnp.zeros((B, cfg.dim), jnp.bfloat16)

        def fast_only(p, hh, k):
            return jnp.sum(_fast_micro_loop(p, cfg, hh, k, settings))

        t_fast = timed_scalar(jax.jit(fast_only), (params, h, key))

        # full LM frame
        def lm_frame(p, st, k):
            st2, out = decode_frame(p, cfg, token_cfg, settings, st, k)
            return jnp.sum(out.tokens)

        t_lm = timed_scalar(jax.jit(lm_frame), (params, state, key))

        # vocoder step
        codes = jnp.zeros((B, 8, 1), jnp.int32)

        def voc(mp, ms, c):
            _, pcm = mimi_decode_step(mp, mimi_cfg, ms, c)
            return jnp.sum(pcm.astype(jnp.float32))

        t_voc = timed_scalar(jax.jit(voc), (mimi_params, mstate, codes))

        # full fused frame (non-donating scalar variant)
        def full(p, mp, st, ms, k):
            # inline the stream step body without donation for timing
            st2, out = decode_frame(p, cfg, token_cfg, settings, st, k)
            ms2, pcm = mimi_decode_step(mp, mimi_cfg, ms, out.tokens[:, 1:, None])
            return jnp.sum(pcm.astype(jnp.float32)) + jnp.sum(out.tokens)

        t_full = timed_scalar(jax.jit(full), (params, mimi_params, state, mstate, key))

        tp = B * 0.08 / ((t_full) / 1e3)
        print(
            f"B={B:4d}  slow={t_slow:6.3f}  fast8={t_fast:6.3f}  lm={t_lm:6.3f}  "
            f"voc={t_voc:6.3f}  full={t_full:6.3f} ms  -> {tp:7.1f} audio-s/s"
        )


if __name__ == "__main__":
    main()
