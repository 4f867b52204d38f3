"""Benchmark: smoltts 150M streaming decode on one chip.

Measures the BASELINE.md driver metric — audio-seconds of speech produced per
wall-clock second per chip at 150M streaming decode (Mimi vocoder included),
plus p50 first-audio latency (prefill -> first 80 ms PCM chunk, compiled).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}
vs_baseline is value / 50 — the driver's >50x-realtime-per-chip target
(the reference publishes no numbers; BASELINE.md).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

import jax
import jax.numpy as jnp
import numpy as np

FRAME_RATE = 12.5
N_STREAMS = int(__import__("os").environ.get("BENCH_STREAMS", "16"))
N_FRAMES = int(__import__("os").environ.get("BENCH_FRAMES", "64"))
PROMPT_LEN = 64


def main():
    from smoltts_tpu.codec.config import MimiConfig
    from smoltts_tpu.codec.mimi import (
        decode_stream_init,
        init_mimi_params,
        mimi_decode_step,
    )
    from smoltts_tpu.config import smoltts_byte_150m
    from smoltts_tpu.lm.decode import decode_frame, init_decode_state, prefill
    from smoltts_tpu.lm.samplers import GenerationSettings
    from smoltts_tpu.models.dual_ar import init_params
    from smoltts_tpu.tokenizer import TokenConfig

    cfg = smoltts_byte_150m().model_copy(
        update=dict(use_gradient_checkpointing=False, dropout=0.0)
    )
    token_cfg = TokenConfig.smoltts_v0()
    settings = GenerationSettings(default_temp=0.7, default_fast_temp=0.7, min_p=0.05)
    mimi_cfg = MimiConfig()

    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    mimi_params = init_mimi_params(mimi_cfg, dtype=jnp.bfloat16)

    B = N_STREAMS
    rng = np.random.default_rng(0)
    prompt = np.zeros((B, cfg.num_rows, PROMPT_LEN), np.int32)
    prompt[:, 0] = rng.integers(0, 320, (B, PROMPT_LEN))
    prompt_len = jnp.full((B,), PROMPT_LEN, jnp.int32)
    prompt = jnp.asarray(prompt)

    S = 1024
    # NOTE: params must be jit ARGUMENTS, not closure captures — captured
    # arrays are baked into the HLO as constants (hundreds of MB at 150M).
    pf = jax.jit(
        lambda w, st, p, pl, r: prefill(w, cfg, token_cfg, settings, st, p, pl, r)
    )
    df = jax.jit(
        lambda w, st, r: decode_frame(w, cfg, token_cfg, settings, st, r),
        donate_argnums=(1,),
    )
    mstep = jax.jit(
        lambda w, ms, c: mimi_decode_step(w, mimi_cfg, ms, c),
        donate_argnums=(1,),
    )

    def run_stream(n_frames, time_first=False):
        """Prefill + n_frames decode+vocode steps; returns (first_audio_s, total_s)."""
        state = init_decode_state(cfg, B, S, dtype=jnp.bfloat16)
        mstate = decode_stream_init(mimi_cfg, B, dtype=jnp.bfloat16)
        key = jax.random.PRNGKey(1)
        t0 = time.perf_counter()
        state, out = pf(params, state, prompt, prompt_len, key)
        mstate, pcm = mstep(mimi_params, mstate, out.audio_codes[:, :, None])
        np.asarray(pcm[0, :4, 0])  # force first chunk to host
        t_first = time.perf_counter() - t0
        for i in range(n_frames - 1):
            key, sub = jax.random.split(key)
            state, out = df(params, state, sub)
            mstate, pcm = mstep(mimi_params, mstate, out.audio_codes[:, :, None])
        jax.block_until_ready(pcm)
        return t_first, time.perf_counter() - t0

    # Warmup / compile
    run_stream(3)
    # First-audio latency (median of 5)
    firsts = [run_stream(2)[0] for _ in range(5)]
    first_audio_ms = float(np.median(firsts) * 1e3)
    # Steady-state throughput
    _, total_s = run_stream(N_FRAMES)
    audio_s = B * N_FRAMES / FRAME_RATE
    throughput = audio_s / total_s

    result = {
        "metric": "audio_seconds_per_s_per_chip_150m_streaming",
        "value": round(throughput, 3),
        "unit": "audio_s/s",
        "vs_baseline": round(throughput / 50.0, 3),
        "extra": {
            "first_audio_ms_p50": round(first_audio_ms, 1),
            "streams": B,
            "frames": N_FRAMES,
            "platform": jax.devices()[0].platform,
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
