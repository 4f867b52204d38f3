"""End-to-end SmolTTS API test: checkpoint dir -> text -> PCM, plus streaming
and voice cloning, with random weights (shapes/rates asserted, not audio)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from smoltts_tpu import SmolTTS
from smoltts_tpu.config import tiny_debug_config
from smoltts_tpu.io.checkpoint_interop import save_params
from smoltts_tpu.io.wav import pcm_to_wav_bytes, wav_header
from smoltts_tpu.models.dual_ar import init_params
from smoltts_tpu.tokenizer import save_byte_level_tokenizer


@pytest.fixture(scope="module")
def checkpoint_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("ckpt")
    cfg = tiny_debug_config()  # full 2048 vocab surface, tiny dims
    params = init_params(cfg, jax.random.PRNGKey(0))
    save_params(params, cfg, d)
    save_byte_level_tokenizer(d, cfg.codebook_size)

    # Tiny random Mimi weights via the torch-free initializer, saved in a
    # side-file our loader understands? load_mimi expects HF keys — instead
    # construct SmolTTS and inject params directly in tests.
    return d


def make_tts(checkpoint_dir):
    from smoltts_tpu.codec.mimi import init_mimi_params
    from smoltts_tpu.codec.config import MimiConfig
    from smoltts_tpu.lm.samplers import GenerationSettings

    tts = SmolTTS(
        checkpoint_dir,
        generation_settings=GenerationSettings(
            default_temp=0.7, default_fast_temp=0.7, max_new_tokens=6
        ),
    )
    tts.codec_config = MimiConfig()
    tts.codec_params = init_mimi_params(tts.codec_config, seed=0)
    return tts


def test_call_returns_pcm(checkpoint_dir):
    tts = make_tts(checkpoint_dir)
    pcm = tts("Hello world.", voice="heart")
    assert pcm.dtype in (np.float32, np.float64) or pcm.size == 0
    # Whole frames only: multiple of 1920 samples (80 ms @ 24 kHz)
    assert pcm.size % tts.codec_config.samples_per_frame == 0
    assert tts.sampling_rate == 24_000


def test_stream_chunks(checkpoint_dir):
    tts = make_tts(checkpoint_dir)
    chunks = list(tts.stream("Hi."))
    for c in chunks:
        assert c.size == tts.codec_config.samples_per_frame


def test_create_speaker(checkpoint_dir):
    tts = make_tts(checkpoint_dir)
    hop = tts.codec_config.samples_per_frame
    sample = {"text": "ref text", "audio": np.zeros(hop * 3, np.float32)}
    prompt = tts.create_speaker([sample], system_prompt="clone this voice")
    assert prompt.shape[0] == tts.config.num_rows
    # system turn + user turn + 3 audio frames + im_end rows present
    assert prompt.shape[1] > 3
    # audio rows carry semantic-offset codes in row 0
    assert (prompt[0] >= 0).all()


def test_wav_io():
    pcm = np.sin(np.linspace(0, 100, 24_000)).astype(np.float32)
    wav = pcm_to_wav_bytes(pcm, 24_000)
    assert wav[:4] == b"RIFF" and wav[8:12] == b"WAVE"
    assert len(wav) == 44 + 2 * pcm.size
    hdr = wav_header(24_000)
    assert len(hdr) == 44


def test_quantized_int8_api(checkpoint_dir):
    """SmolTTS(quantize="int8") quantizes the LM decode weights and still
    produces PCM end to end."""
    from smoltts_tpu.codec.config import MimiConfig
    from smoltts_tpu.codec.mimi import init_mimi_params
    from smoltts_tpu.lm.samplers import GenerationSettings
    from smoltts_tpu.ops.quant import QTensor

    tts = SmolTTS(
        checkpoint_dir,
        generation_settings=GenerationSettings(
            default_temp=0.0, default_fast_temp=0.0, max_new_tokens=3
        ),
        quantize="int8",
    )
    tts.codec_config = MimiConfig()
    tts.codec_params = init_mimi_params(tts.codec_config, seed=0)
    assert isinstance(tts.params["layers"]["wqkv"], QTensor)
    assert tts.params["layers"]["wqkv"].q.dtype == jnp.int8
    pcm = tts("Hi.", voice="heart")
    assert pcm.ndim == 1 and np.all(np.isfinite(pcm))

    with pytest.raises(ValueError):
        SmolTTS(checkpoint_dir, quantize="int4")
