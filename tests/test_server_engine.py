"""Server with continuous batching: two concurrent /stream requests share
decode slots; /metrics reports counters."""

import http.client
import json
import socket
import threading
import time

import pytest

import jax

from smoltts_tpu import SmolTTS
from smoltts_tpu.codec.config import MimiConfig
from smoltts_tpu.codec.mimi import init_mimi_params
from smoltts_tpu.config import tiny_debug_config
from smoltts_tpu.io.checkpoint_interop import save_params
from smoltts_tpu.lm.samplers import GenerationSettings
from smoltts_tpu.models.dual_ar import init_params
from smoltts_tpu.server.app import build_app, build_engine_loop
from smoltts_tpu.server.tts_core import TTSCore
from smoltts_tpu.tokenizer import save_byte_level_tokenizer


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    d = tmp_path_factory.mktemp("ckpt")
    cfg = tiny_debug_config()
    save_params(init_params(cfg, jax.random.PRNGKey(0)), cfg, d)
    save_byte_level_tokenizer(d, cfg.codebook_size)
    tts = SmolTTS(
        d,
        generation_settings=GenerationSettings(
            default_temp=0.7, default_fast_temp=0.7, max_new_tokens=3
        ),
    )
    tts.codec_config = MimiConfig(
        num_filters=8, upsampling_ratios=[4, 3, 2], hidden_size=32,
        num_hidden_layers=2, num_attention_heads=2, head_dim=16,
        intermediate_size=64, codebook_size=2048, codebook_dim=16,
        num_quantizers=8, upsample_groups=32, frame_rate=500.0,
    )
    tts.codec_params = init_mimi_params(tts.codec_config, seed=0)
    core = TTSCore(tts)
    loop = build_engine_loop(core, num_slots=2)
    app = build_app(core, engine_loop=loop)
    port = _free_port()
    th = threading.Thread(target=app.run, args=("127.0.0.1", port), daemon=True)
    th.start()
    for _ in range(100):
        try:
            with socket.create_connection(("127.0.0.1", port), timeout=0.2):
                break
        except OSError:
            time.sleep(0.05)
    yield port
    loop.stop()


def _stream(port, text):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=180)
    conn.request(
        "POST",
        "/v1/text-to-speech/0/stream",
        json.dumps({"text": text}),
        {"Content-Type": "application/json"},
    )
    r = conn.getresponse()
    return r.status, r.read()


def test_concurrent_streams_and_metrics(server):
    results = {}

    def worker(i):
        results[i] = _stream(server, f"request number {i}")

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    spf = 48  # samples_per_frame for the tiny codec (hop 24 * 2) at int16
    for i, (status, body) in results.items():
        assert status == 200, i
        assert len(body) % (spf * 2) == 0
        assert len(body) > 0

    conn = http.client.HTTPConnection("127.0.0.1", server, timeout=30)
    conn.request("GET", "/metrics")
    m = json.loads(conn.getresponse().read())
    assert m["requests"] == 3
    assert m["frames"] >= 3
    assert "first_audio_ms_p50" in m
