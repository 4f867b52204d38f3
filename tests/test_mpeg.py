"""MPEG Layer I encoder tests: valid framing, round-trip fidelity through
the bitstream (parse -> dequantize -> synthesize), and the server transcoding
path (mp3_* -> audio/mpeg, resampled)."""

import numpy as np
import pytest

from smoltts_tpu.io.mpeg import (
    _FRAME_SAMPLES,
    analyze,
    decode_mpeg_audio,
    encode_mpeg_audio,
    synthesize,
)


def tone(freq, rate, seconds=0.5, amp=0.5):
    t = np.arange(int(rate * seconds)) / rate
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float64)


def snr_db(ref, got):
    err = ref - got
    return 10 * np.log10((ref**2).mean() / max((err**2).mean(), 1e-20))


def test_filterbank_near_perfect_reconstruction():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(_FRAME_SAMPLES * 20) * 0.3
    y = synthesize(analyze(x))
    # Index bookkeeping already absorbs the window delay: aligned at lag 0
    # (the last ~512 samples are inside the synthesis tail, excluded).
    n = len(x) - 600
    assert snr_db(x[:n], y[:n]) > 40.0


def test_header_fields_and_frame_size_layer2():
    # 24 kHz auto-selects MPEG-2 LSF Layer II.
    data = encode_mpeg_audio(tone(440, 24_000), 24_000, bitrate_kbps=128)
    assert data[0] == 0xFF and (data[1] & 0xE0) == 0xE0  # sync
    assert (data[1] >> 3) & 0b11 == 0b10  # MPEG-2 LSF for 24 kHz
    assert (data[1] >> 1) & 0b11 == 0b10  # Layer II
    # frame length = floor(144 * 128000 / 24000) = 768 bytes; second sync
    assert data[768] == 0xFF and (data[769] & 0xE0) == 0xE0


def test_header_fields_and_frame_size_layer1():
    # Layer I stays available as an explicit fallback at the MPEG-1 rates.
    data = encode_mpeg_audio(tone(1000, 44_100), 44_100, bitrate_kbps=128, layer=1)
    assert data[0] == 0xFF and (data[1] & 0xE0) == 0xE0
    assert (data[1] >> 3) & 0b11 == 0b11  # MPEG-1
    assert (data[1] >> 1) & 0b11 == 0b11  # Layer I
    n = 4 * (12 * 128000 // 44100)
    assert data[n] == 0xFF and (data[n + 1] & 0xE0) == 0xE0


def test_header_fields_and_frame_size_layer2_mpeg1():
    # 44.1 kHz now auto-selects MPEG-1 Layer II (the mp3_44100_* family).
    data = encode_mpeg_audio(tone(1000, 44_100), 44_100, bitrate_kbps=128)
    assert data[0] == 0xFF and (data[1] & 0xE0) == 0xE0
    assert (data[1] >> 3) & 0b11 == 0b11  # MPEG-1
    assert (data[1] >> 1) & 0b11 == 0b10  # Layer II
    n = 144 * 128000 // 44100
    assert data[n] == 0xFF and (data[n + 1] & 0xE0) == 0xE0


@pytest.mark.parametrize(
    "rate,kbps",
    [(44_100, 128), (44_100, 64), (48_000, 128), (32_000, 96), (48_000, 320)],
)
def test_layer2_mpeg1_roundtrip_tone_snr(rate, kbps):
    # Spans all three MPEG-1 table selections: B.2c (44.1@64 mono->48),
    # B.2a (48k), B.2b (44.1@128, 32k@96).
    x = tone(1000, rate)
    data = encode_mpeg_audio(x, rate, bitrate_kbps=kbps)
    y, got_rate = decode_mpeg_audio(data)
    assert got_rate == rate
    n = min(len(x), len(y)) - 600
    assert snr_db(x[:n], y[:n]) > 30.0


def test_layer2_mpeg1_roundtrip_speechlike():
    rng = np.random.default_rng(5)
    w = rng.standard_normal(44_100)
    x = np.convolve(w, np.ones(8) / 8.0, mode="same") * 0.4
    data = encode_mpeg_audio(x, 44_100, bitrate_kbps=128)
    y, _ = decode_mpeg_audio(data)
    n = len(x) - 600
    assert snr_db(x[:n], y[:n]) > 18.0


@pytest.mark.parametrize("rate,kbps", [(16_000, 96), (22_050, 128), (24_000, 128)])
def test_layer2_roundtrip_tone_snr(rate, kbps):
    x = tone(440, rate)
    data = encode_mpeg_audio(x, rate, bitrate_kbps=kbps)
    y, got_rate = decode_mpeg_audio(data)
    assert got_rate == rate
    n = min(len(x), len(y)) - 600
    assert snr_db(x[:n], y[:n]) > 30.0


def test_layer2_roundtrip_speechlike():
    rng = np.random.default_rng(3)
    w = rng.standard_normal(24_000)
    x = np.convolve(w, np.ones(8) / 8.0, mode="same") * 0.4
    data = encode_mpeg_audio(x, 24_000, bitrate_kbps=160)
    y, _ = decode_mpeg_audio(data)
    n = len(x) - 600
    assert snr_db(x[:n], y[:n]) > 22.0


def test_layer2_bitrate_scales_quality():
    x = tone(523, 24_000)
    snrs = []
    for kbps in (48, 96, 160):
        y, _ = decode_mpeg_audio(encode_mpeg_audio(x, 24_000, bitrate_kbps=kbps))
        n = min(len(x), len(y)) - 600
        snrs.append(snr_db(x[:n], y[:n]))
    assert snrs[0] < snrs[-1] and snrs[-1] > 40.0


# Layer I needs ~8 bits/sample for clean tones; scale the bitrate with fs.
@pytest.mark.parametrize("rate,kbps", [(16_000, 192), (24_000, 192), (44_100, 320)])
def test_roundtrip_tone_snr(rate, kbps):
    x = tone(440 if rate < 40_000 else 1000, rate)
    layer = 1 if rate == 44_100 else None  # explicit Layer I on MPEG-1 rates
    data = encode_mpeg_audio(x, rate, bitrate_kbps=kbps, layer=layer)
    y, got_rate = decode_mpeg_audio(data)
    assert got_rate == rate
    n = min(len(x), len(y)) - 600
    assert snr_db(x[:n], y[:n]) > 30.0


def test_roundtrip_speechlike_noise():
    rng = np.random.default_rng(1)
    # pink-ish: lowpassed noise, speech-band energy
    w = rng.standard_normal(24_000)
    x = np.convolve(w, np.ones(8) / 8.0, mode="same") * 0.4
    data = encode_mpeg_audio(x, 24_000, bitrate_kbps=256)
    y, _ = decode_mpeg_audio(data)
    n = len(x) - 600
    assert snr_db(x[:n], y[:n]) > 20.0


def test_unsupported_rate_raises():
    with pytest.raises(NotImplementedError):
        encode_mpeg_audio(np.zeros(384), 11_025)


def test_transcode_mp3_route(monkeypatch):
    """The route's Layer II FALLBACK path (SMOLTTS_MP3_ENCODER=layer2);
    the LAME Layer III default is covered by tests/test_mp3_native.py."""
    from smoltts_tpu.server.tts_core import transcode

    monkeypatch.setenv("SMOLTTS_MP3_ENCODER", "layer2")
    pcm = tone(440, 24_000, seconds=0.2)
    data, media_type = transcode(pcm.astype(np.float32), "mp3_24000_128")
    assert media_type == "audio/mpeg"
    assert data[0] == 0xFF
    # resampling path: 44.1 kHz MPEG-1 Layer II output
    data2, _ = transcode(pcm.astype(np.float32), "mp3_44100_128")
    assert (data2[1] >> 3) & 0b11 == 0b11  # MPEG-1 for 44.1 kHz
    assert (data2[1] >> 1) & 0b11 == 0b10  # Layer II
