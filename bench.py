"""Benchmark: smoltts 150M streaming decode on one chip.

Measures the BASELINE.md driver metric — audio-seconds of speech produced per
wall-clock second per chip at 150M streaming decode (Mimi vocoder included) —
and p50 first-audio latency (prefill -> first 80 ms PCM chunk on host,
compiled). Uses the fused serving pipeline (smoltts_tpu/lm/pipeline.py): one
dispatch per 80 ms frame for streaming; a scan-chunked variant amortizing
dispatch overhead is reported as extra.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}
vs_baseline is value / 50 — the driver's >50x-realtime-per-chip target
(the reference publishes no numbers; BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

FRAME_RATE = 12.5
N_STREAMS = int(os.environ.get("BENCH_STREAMS", "64"))
N_FRAMES = int(os.environ.get("BENCH_FRAMES", "64"))
CHUNK = int(os.environ.get("BENCH_CHUNK", "16"))
PROMPT_LEN = 64
# Length bucketing: attention reads are bounded to the smallest bucket that
# covers every live position (the engine's scheme); the KV state itself
# stays allocated at S so bucket switches reuse the same buffers.
BUCKET = int(os.environ.get("BENCH_BUCKET", "256"))
assert BUCKET >= PROMPT_LEN + N_FRAMES + 1, "bucket must cover the whole run"


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
    from smoltts_tpu.tokenizer import TokenConfig

    cfg = smoltts_byte_150m().model_copy(
        update=dict(use_gradient_checkpointing=False, dropout=0.0)
    )
    token_cfg = TokenConfig.smoltts_v0()
    settings = GenerationSettings(default_temp=0.7, default_fast_temp=0.7, min_p=0.05)
    mimi_cfg = MimiConfig()

    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    mimi_params = init_mimi_params(mimi_cfg, dtype=jnp.bfloat16)

    # int8 weight-only decode is the DEFENDED configuration (BENCH_INT8=0
    # opts out): LM trunks + heads and the codec transformers run int8
    # (ops/quant.py), halving the per-frame HBM weight traffic. Quality is
    # gated by tests/test_int8_gate.py (CE delta, token KL, vocoder SNR).
    # Decode-path weight fusion (bit-exact): SwiGLU gate/up -> w13, codec
    # transformer q/k/v -> wqkv. Fewer, larger MXU ops per frame.
    from smoltts_tpu.ops.quant import fuse_decode_params, fuse_mimi_decode_params

    params = fuse_decode_params(params)
    mimi_params = fuse_mimi_decode_params(mimi_params)

    quantized = os.environ.get("BENCH_INT8", "1") != "0"
    if quantized:
        from smoltts_tpu.ops.quant import quantize_decode_params, quantize_mimi_params

        params = quantize_decode_params(params)
        mimi_params = quantize_mimi_params(mimi_params)

    B = N_STREAMS
    rng = np.random.default_rng(0)
    prompt = np.zeros((B, cfg.num_rows, PROMPT_LEN), np.int32)
    prompt[:, 0] = rng.integers(0, 320, (B, PROMPT_LEN))
    prompt_len = jnp.full((B,), PROMPT_LEN, jnp.int32)
    prompt = jnp.asarray(prompt)
    S = 1024

    prefill_step = make_prefill_step(cfg, token_cfg, settings, mimi_cfg)
    stream_step = make_stream_step(cfg, token_cfg, settings, mimi_cfg, attend_limit=BUCKET)
    chunk_step = make_chunk_step(cfg, token_cfg, settings, mimi_cfg, CHUNK, attend_limit=BUCKET)
    flush_step = make_flush_step()

    # kv8 (BENCH_KV8=0 opts out): int8 KV history/ring with per-vector
    # scales (ops/quant.py::quantize_kv) — the attention HBM reads halve.
    # Quality-gated by tests/test_kv8.py (greedy token agreement + PCM SNR).
    kv8 = os.environ.get("BENCH_KV8", "1") != "0"
    kv_dtype = jnp.int8 if kv8 else jnp.bfloat16

    def fresh_state(lm_tail=128, mimi_tail=64):
        return (
            init_decode_state(cfg, B, S, dtype=kv_dtype, tail_len=lm_tail),
            decode_stream_init(
                mimi_cfg,
                B,
                dtype=jnp.bfloat16,
                tail_len=mimi_tail,
                kv_dtype=jnp.int8 if kv8 else None,
            ),
        )

    def run_streaming(n_frames):
        state, mstate = fresh_state()
        cadence = flush_cadence(state, mstate)
        key = jax.random.PRNGKey(1)
        t0 = time.perf_counter()
        state, mstate, key, out = prefill_step(
            params, mimi_params, state, mstate, prompt, prompt_len, key
        )
        np.asarray(out.pcm[0, :4, 0])  # first audible chunk reaches the host
        t_first = time.perf_counter() - t0
        since_flush = 0
        for _ in range(n_frames - 1):
            if since_flush >= cadence:
                state, mstate = flush_step(state, mstate)
                since_flush = 0
            state, mstate, key, out = stream_step(params, mimi_params, state, mstate, key)
            since_flush += 1
        np.asarray(out.pcm)  # fetch the final chunk: forces the full chain
        return t_first, time.perf_counter() - t0

    def run_chunked(n_frames):
        # Chunked scans carry the ring tails (double-buffered per frame), so
        # size them to the chunk window: carry bytes scale with tail_len.
        state, mstate = fresh_state(lm_tail=2 * CHUNK, mimi_tail=4 * CHUNK)
        cadence = flush_cadence(state, mstate)
        assert CHUNK <= cadence, "chunk must fit within one flush window"
        key = jax.random.PRNGKey(1)
        state, mstate, key, out = prefill_step(
            params, mimi_params, state, mstate, prompt, prompt_len, key
        )
        jax.block_until_ready(out.pcm)
        t0 = time.perf_counter()
        since_flush = 0
        for _ in range(n_frames // CHUNK):
            if since_flush + CHUNK > cadence:
                state, mstate = flush_step(state, mstate)
                since_flush = 0
            state, mstate, key, out = chunk_step(params, mimi_params, state, mstate, key)
            since_flush += CHUNK
        np.asarray(out.pcm)
        return time.perf_counter() - t0

    def run_served(engine, n_streams, wave=8, admit_every=4, frames_per_stream=N_FRAMES):
        """The SERVED number: the continuous-batching DecodeEngine (attend-
        bucketed, vocoder fused) under staggered admission churn. Returns
        (audio_s/s, first-audio p50 ms, p95 ms) measured per stream from
        submit() to its first emitted PCM frame. The engine is reused across
        warmup and measurement (same compiled programs, like a real server)."""
        prompt_np = np.asarray(prompt[0])
        submitted_at, first_at, done = {}, {}, set()
        waves = [min(wave, n_streams - i) for i in range(0, n_streams, wave)]
        t0 = time.perf_counter()
        frames_total = 0
        step = 0
        while waves or engine.has_work():
            if waves and step % admit_every == 0:
                for _ in range(waves.pop(0)):
                    sid = engine.submit(prompt_np, max_frames=frames_per_stream)
                    submitted_at[sid] = time.perf_counter()
            for sid, frame in engine.step():
                frames_total += 1
                if sid not in first_at and "pcm" in frame:
                    first_at[sid] = time.perf_counter()
                if frame["finished"]:
                    done.add(sid)
            step += 1
        elapsed = time.perf_counter() - t0
        lats = sorted(
            (first_at[sid] - submitted_at[sid]) * 1e3 for sid in first_at
        )
        p50 = lats[len(lats) // 2]
        p95 = lats[min(len(lats) - 1, int(0.95 * len(lats)))]
        return (frames_total / FRAME_RATE) / elapsed, p50, p95

    # Warmup / compile all programs, including the periodic flush (which
    # otherwise compiles inside the timed region on first firing).
    run_streaming(2)
    _st, _ms = fresh_state()
    flush_step(_st, _ms)
    run_chunked(3 * CHUNK)
    del _st, _ms

    firsts = [run_streaming(2)[0] for _ in range(5)]
    first_audio_ms = float(np.median(firsts) * 1e3)

    _, stream_s = run_streaming(N_FRAMES)
    stream_tp = (B * N_FRAMES / FRAME_RATE) / stream_s

    chunk_s = run_chunked(N_FRAMES)
    chunk_tp = (B * N_FRAMES / FRAME_RATE) / chunk_s

    # Served path: one engine; compile warmup (short run), then the measured
    # staggered-admission churn run at full concurrency.
    from smoltts_tpu.lm.engine import DecodeEngine

    # fetch_every=8 batches result fetches: one host<->device round trip per
    # 8 frames (the tunnel RTT otherwise caps the engine at ~1/RTT steps/s).
    engine = DecodeEngine(
        params, cfg, token_cfg, settings,
        num_slots=B, max_seq_len=S, kv_dtype=kv_dtype,
        prompt_bucket=PROMPT_LEN, mimi_params=mimi_params, mimi_cfg=mimi_cfg,
        inflight=2, fetch_every=int(os.environ.get("BENCH_FETCH_EVERY", "2")),
        emit_int16=True,  # PCM16 conversion on device: 4x cheaper fetches
        # Adaptive chunked dispatch: K frames per program while no admissions
        # wait (single-frame during admission waves) — dispatch/fetch
        # overhead drops K-fold, the host-link bottleneck for SERVED.
        chunk_frames=int(os.environ.get("BENCH_SERVED_CHUNK", "8")),
    )
    # Warmup must cover EVERY program the measured run hits: admission,
    # decode, the first batched result fetch (transfer-path setup on
    # tunneled runtimes is expensive once), and the periodic ring flush.
    run_served(engine, B, wave=8, admit_every=1, frames_per_stream=40)
    served_tp, served_p50, served_p95 = run_served(engine, B)

    result = {
        "metric": "audio_seconds_per_s_per_chip_150m_streaming",
        "value": round(stream_tp, 3),
        "unit": "audio_s/s",
        "vs_baseline": round(stream_tp / 50.0, 3),
        "extra": {
            "first_audio_ms_p50": round(first_audio_ms, 1),
            "served_audio_s_per_s": round(served_tp, 3),
            "served_first_audio_ms_p50": round(served_p50, 1),
            "served_first_audio_ms_p95": round(served_p95, 1),
            "served_vs_pipeline": round(served_tp / stream_tp, 3),
            "chunked_audio_s_per_s": round(chunk_tp, 3),
            "chunk_frames": CHUNK,
            "attend_bucket": BUCKET,
            "streams": B,
            "frames": N_FRAMES,
            "int8_weights": quantized,
            "int8_kv": kv8,
            "platform": jax.devices()[0].platform,
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
