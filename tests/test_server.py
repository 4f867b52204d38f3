"""HTTP server tests: boot the real asyncio server on a random port with a
tiny random model and exercise the OpenAI + ElevenLabs routes over a socket
(end-to-end through the real transport, including chunked streaming)."""

import http.client
import json
import socket
import threading
import time

import numpy as np
import pytest

import jax

from smoltts_tpu import SmolTTS
from smoltts_tpu.codec.config import MimiConfig
from smoltts_tpu.codec.mimi import init_mimi_params
from smoltts_tpu.config import tiny_debug_config
from smoltts_tpu.io.checkpoint_interop import save_params
from smoltts_tpu.lm.samplers import GenerationSettings
from smoltts_tpu.models.dual_ar import init_params
from smoltts_tpu.server.app import build_app
from smoltts_tpu.server.settings import ServerSettings
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
            default_temp=0.7, default_fast_temp=0.7, max_new_tokens=4
        ),
    )
    tts.codec_config = MimiConfig()
    tts.codec_params = init_mimi_params(tts.codec_config, seed=0)
    core = TTSCore(tts)
    app = build_app(core)
    port = _free_port()
    th = threading.Thread(target=app.run, args=("127.0.0.1", port), daemon=True)
    th.start()
    for _ in range(100):
        try:
            with socket.create_connection(("127.0.0.1", port), timeout=0.2):
                break
        except OSError:
            time.sleep(0.05)
    return port


def _post(port, path, body) -> http.client.HTTPResponse:
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
    conn.request(
        "POST", path, json.dumps(body), {"Content-Type": "application/json"}
    )
    return conn.getresponse()


def test_health_and_index(server):
    conn = http.client.HTTPConnection("127.0.0.1", server, timeout=30)
    conn.request("GET", "/health")
    r = conn.getresponse()
    assert r.status == 200
    assert json.loads(r.read())["sampling_rate"] == 24_000
    conn.request("GET", "/")
    r = conn.getresponse()
    assert r.status == 200
    assert b"smoltts" in r.read()


def test_openai_route(server):
    r = _post(server, "/v1/audio/speech", {"input": "Hello.", "voice": "0"})
    assert r.status == 200
    assert r.getheader("Content-Type") == "audio/wav"
    body = r.read()
    assert body[:4] == b"RIFF"


def test_openai_validation(server):
    r = _post(server, "/v1/audio/speech", {"voice": "0"})
    assert r.status == 422
    r = _post(server, "/v1/audio/speech", {"input": "x", "response_format": "ogg"})
    assert r.status == 422


def test_elevenlabs_blocking_pcm(server):
    r = _post(server, "/v1/text-to-speech/0?output_format=pcm_24000", {"text": "Hi"})
    assert r.status == 200
    assert r.getheader("X-Sample-Rate") == "24000"
    body = r.read()
    assert len(body) % 2 == 0  # int16 PCM


def test_elevenlabs_wav_resampled(server):
    r = _post(server, "/v1/text-to-speech/0?output_format=wav_16000", {"text": "Hi"})
    assert r.status == 200
    assert r.getheader("Content-Type") == "audio/wav"
    assert r.getheader("X-Sample-Rate") == "16000"


def test_elevenlabs_stream(server):
    r = _post(server, "/v1/text-to-speech/0/stream", {"text": "Hi"})
    assert r.status == 200
    assert r.getheader("X-Sample-Rate") == "24000"
    body = r.read()  # http.client reassembles chunked encoding
    assert len(body) % 2 == 0


def test_unknown_route_and_method(server):
    conn = http.client.HTTPConnection("127.0.0.1", server, timeout=30)
    conn.request("GET", "/nope")
    r = conn.getresponse()
    assert r.status == 404
    r.read()  # drain before reusing the connection
    conn.request("GET", "/v1/audio/speech")
    r = conn.getresponse()
    assert r.status == 405
    r.read()


def test_settings_validation(tmp_path):
    with pytest.raises(Exception):
        ServerSettings(model_id="a", checkpoint_dir="b")
    with pytest.raises(Exception):
        ServerSettings()
    s = ServerSettings(checkpoint_dir=str(tmp_path))
    assert s.get_checkpoint_dir() == tmp_path
    assert s.generation.to_settings().max_new_tokens == 1024
