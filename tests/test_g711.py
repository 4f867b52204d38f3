"""G.711 mu-law codec: round-trip fidelity, device/host bit-exactness, the
engine's ulaw emit format, and the server's ulaw_8000 transcode route."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from smoltts_tpu.io.g711 import ulaw_decode_np, ulaw_encode_jnp, ulaw_encode_np


def test_roundtrip_snr_speechlike():
    rng = np.random.default_rng(0)
    w = rng.standard_normal(24_000)
    x = np.convolve(w, np.ones(8) / 8.0, mode="same") * 0.4
    pcm16 = np.round(np.clip(x, -1, 1) * 32767).astype(np.int16)
    y = ulaw_decode_np(ulaw_encode_np(pcm16)).astype(np.float64)
    ref = pcm16.astype(np.float64)
    snr = 10 * np.log10((ref**2).mean() / ((ref - y) ** 2).mean())
    assert snr > 30.0, snr  # telephony-grade


def test_extremes_and_zero():
    pcm = np.array([0, 1, -1, 32767, -32768, 1000, -1000], np.int16)
    dec = ulaw_decode_np(ulaw_encode_np(pcm))
    # zero maps near zero, extremes near full scale, signs preserved
    assert abs(int(dec[0])) <= 8
    assert dec[3] > 31000 and dec[4] < -31000
    assert np.all(np.sign(dec[5:]) == np.sign(pcm[5:]))


def test_known_wire_vectors_g711():
    """Pin the wire bytes against the published G.711 mapping (Sun g711.c /
    ffmpeg 16-bit variant: BIAS 0x84, clip 32635, output = uval ^ mask with
    mask 0xFF for positive, 0x7F for negative). Catches sign-convention
    inversions that internal round-trips cannot (review finding: the encoder
    previously emitted 0x7F for +0 — polarity-inverted on every standard
    telephony decoder)."""
    # +0 is the canonical mu-law silence byte 0xFF; -1 lands in the negative
    # zero-segment as 0x7F.
    enc = ulaw_encode_np(np.array([0, -1, 8, -8], np.int16))
    assert enc[0] == 0xFF, hex(enc[0])
    assert enc[1] == 0x7F, hex(enc[1])
    # wire 0xFE decodes to +8, 0x7E to -8 (Sun ulaw2linear)
    dec = ulaw_decode_np(np.array([0xFF, 0x7F, 0xFE, 0x7E], np.uint8))
    assert list(dec) == [0, 0, 8, -8], list(dec)
    # full-scale positives keep the wire sign bit SET (pre-complement 0)
    assert ulaw_encode_np(np.array([32767], np.int16))[0] & 0x80
    assert not (ulaw_encode_np(np.array([-32768], np.int16))[0] & 0x80)


def test_device_encoder_bit_exact_vs_host():
    rng = np.random.default_rng(1)
    x = np.clip(rng.standard_normal(4096) * 0.3, -1, 1).astype(np.float32)
    host = ulaw_encode_np(np.round(x.astype(np.float64) * 32767).astype(np.int16))
    dev = np.asarray(jax.jit(ulaw_encode_jnp)(jnp.asarray(x)))
    assert np.array_equal(host, dev)


def test_engine_ulaw_emit():
    from smoltts_tpu.codec.config import MimiConfig
    from smoltts_tpu.codec.mimi import init_mimi_params
    from smoltts_tpu.config import ModelType, tiny_debug_config
    from smoltts_tpu.lm.engine import DecodeEngine
    from smoltts_tpu.lm.samplers import GenerationSettings
    from smoltts_tpu.models.dual_ar import init_params
    from smoltts_tpu.tokenizer import ByteTokenizer, TokenConfig

    CB = 32
    cfg = tiny_debug_config(codebook_size=CB, vocab_size=256 + 64 + CB)
    token_cfg = TokenConfig.from_tokenizer(ModelType.smoltts_v0(), ByteTokenizer(CB), cfg)
    mimi_cfg = MimiConfig(
        num_filters=8, hidden_size=32, num_hidden_layers=1,
        num_attention_heads=2, head_dim=16, intermediate_size=64,
        num_quantizers=8, codebook_size=CB, codebook_dim=16,
        sliding_window=16, upsample_groups=32,
    )
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    mimi_params = init_mimi_params(mimi_cfg, dtype=jnp.float32)
    rngp = np.random.default_rng(0)
    prompt = np.zeros((cfg.num_rows, 6), np.int32)
    prompt[0] = token_cfg.semantic_start_id + rngp.integers(0, CB, 6)
    prompt[1:] = rngp.integers(0, CB, (cfg.num_rows - 1, 6))

    def frames_with(emit_format):
        eng = DecodeEngine(
            params, cfg, token_cfg,
            GenerationSettings(default_temp=0.0, default_fast_temp=0.0),
            num_slots=2, max_seq_len=64, prompt_bucket=8,
            mimi_params=mimi_params, mimi_cfg=mimi_cfg,
            emit_format=emit_format,
        )
        eng.submit(prompt, max_frames=3)
        out = []
        while eng.has_work():
            out.extend(eng.step())
        return [fr["pcm"] for _, fr in out if "pcm" in fr]

    f32 = frames_with("f32")
    ul = frames_with("ulaw")
    assert len(f32) == len(ul) == 3
    assert ul[0].dtype == np.uint8
    for a, b in zip(f32, ul):
        expect = ulaw_encode_np(
            np.round(np.clip(np.asarray(a, np.float64), -1, 1) * 32767).astype(np.int16)
        )
        got = np.asarray(b)
        # identical greedy decode -> identical PCM -> identical mu-law bytes
        assert np.array_equal(expect, got)


def test_server_ulaw_8000_route():
    from smoltts_tpu.server.tts_core import transcode

    t = np.arange(4800) / 24000.0
    pcm = (0.4 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    data, media = transcode(pcm, "ulaw_8000")
    assert media == "audio/basic"
    assert len(data) == 1600  # 0.2 s at 8 kHz, 1 byte per sample
    dec = ulaw_decode_np(np.frombuffer(data, np.uint8)).astype(np.float64) / 32767
    # still a 440 Hz tone after resample + mu-law
    spec = np.abs(np.fft.rfft(dec * np.hanning(len(dec))))
    assert abs(np.argmax(spec) * 8000 / len(dec) - 440) < 15
