"""Experiment: isolate the chunked-path kv8 regression (VERDICT r2 item 2).

Measures the chunked scan pipeline (K frames/dispatch) throughput at the
bench shapes under {kv8 on/off} x {int8 weights on/off}, plus the streaming
path for reference. Prints one JSON line per config.
"""

from __future__ import annotations

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

N_STREAMS = 64
N_FRAMES = 64
CHUNK = 16
PROMPT_LEN = 64
BUCKET = 256
S = 1024


def main():
    from smoltts_tpu.codec.config import MimiConfig
    from smoltts_tpu.codec.mimi import decode_stream_init, init_mimi_params
    from smoltts_tpu.config import smoltts_byte_150m
    from smoltts_tpu.lm.decode import init_decode_state
    from smoltts_tpu.lm.pipeline import (
        flush_cadence,
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

    cfg = smoltts_byte_150m().model_copy(
        update=dict(use_gradient_checkpointing=False, dropout=0.0)
    )
    token_cfg = TokenConfig.smoltts_v0()
    settings = GenerationSettings(default_temp=0.7, default_fast_temp=0.7, min_p=0.05)
    mimi_cfg = MimiConfig()

    params0 = fuse_decode_params(init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16))
    mimi0 = fuse_mimi_decode_params(init_mimi_params(mimi_cfg, dtype=jnp.bfloat16))
    params_q = quantize_decode_params(params0)
    mimi_q = quantize_mimi_params(mimi0)

    B = N_STREAMS
    rng_np = np.random.default_rng(0)
    prompt = np.zeros((B, cfg.num_rows, PROMPT_LEN), np.int32)
    prompt[:, 0] = rng_np.integers(0, 320, (B, PROMPT_LEN))
    prompt_len = jnp.full((B,), PROMPT_LEN, jnp.int32)
    prompt = jnp.asarray(prompt)

    prefill_step = make_prefill_step(cfg, token_cfg, settings, mimi_cfg)
    stream_step = make_stream_step(cfg, token_cfg, settings, mimi_cfg, attend_limit=BUCKET)
    chunk_step = make_chunk_step(cfg, token_cfg, settings, mimi_cfg, CHUNK, attend_limit=BUCKET)
    flush_step = make_flush_step()

    def run_config(name, params, mimi_params, kv8, lm_tail, mimi_tail):
        kv_dtype = jnp.int8 if kv8 else jnp.bfloat16
        state = init_decode_state(cfg, B, S, dtype=kv_dtype, tail_len=lm_tail)
        mstate = decode_stream_init(
            mimi_cfg, B, dtype=jnp.bfloat16, tail_len=mimi_tail,
            kv_dtype=jnp.int8 if kv8 else None,
        )
        cadence = flush_cadence(state, mstate)
        key = jax.random.PRNGKey(1)
        state, mstate, key, out = prefill_step(
            params, mimi_params, state, mstate, prompt, prompt_len, key
        )
        jax.block_until_ready(out.pcm)
        # warmup chunk + flush
        state, mstate, key, out = chunk_step(params, mimi_params, state, mstate, key)
        state, mstate = flush_step(state, mstate)
        jax.block_until_ready(out.pcm)
        t0 = time.perf_counter()
        since_flush = 0
        for _ in range(N_FRAMES // CHUNK):
            if since_flush + CHUNK > cadence:
                state, mstate = flush_step(state, mstate)
                since_flush = 0
            state, mstate, key, out = chunk_step(params, mimi_params, state, mstate, key)
            since_flush += CHUNK
        np.asarray(out.pcm)
        dt = time.perf_counter() - t0
        tp = (B * N_FRAMES / 12.5) / dt
        print(json.dumps({
            "config": name, "chunked_audio_s_per_s": round(tp, 1),
            "ms_per_frame": round(dt / N_FRAMES * 1e3, 3),
            "kv8": kv8, "lm_tail": lm_tail, "mimi_tail": mimi_tail,
        }), flush=True)
        return tp

    # bench.py's chunked config: lm_tail=2*CHUNK, mimi_tail=4*CHUNK
    run_config("int8+kv8 (defended r2)", params_q, mimi_q, True, 2 * CHUNK, 4 * CHUNK)
    run_config("int8 only", params_q, mimi_q, False, 2 * CHUNK, 4 * CHUNK)
    run_config("bf16", params0, mimi0, False, 2 * CHUNK, 4 * CHUNK)
    run_config("kv8 only", params0, mimi0, True, 2 * CHUNK, 4 * CHUNK)
    # bigger tails (streaming-style), kv8 on
    run_config("int8+kv8 tails128/64", params_q, mimi_q, True, 128, 64)


if __name__ == "__main__":
    main()
