"""G.711 mu-law codec — host (numpy) and on-device (jnp) encoders.

Serves two purposes:
1. Format parity: the ElevenLabs API exposes `ulaw_8000` as an output
   format (audio/basic); the reference's server delegates unsupported
   formats to NotImplemented (mlx .../server/tts_core.py) — here it is a
   first-class transcode target (server/tts_core.py).
2. Serving-transfer compression: on hosts where the device->host link is
   the serving bottleneck (this bench host's tunnel moves ~5-20 MB/s while
   the chip decodes >1000 audio-s/s), emitting mu-law from the device
   halves the per-frame PCM bytes vs int16 (DecodeEngine(emit_format=
   "ulaw")) at telephony-grade fidelity (~38 dB SNR on speech).

The integer algorithm is the standard G.711 segment encoding (bias 0x84,
clip 32635, 8 exponent segments, 4-bit mantissa, ones-complement output),
so the bytes decode in any telephony stack.
"""

from __future__ import annotations

import numpy as np

_BIAS = 0x84
_CLIP = 32635


def ulaw_encode_np(pcm16: np.ndarray) -> np.ndarray:
    """int16 PCM -> uint8 mu-law (G.711)."""
    x = pcm16.astype(np.int32)
    neg = x < 0
    a = np.clip(np.where(neg, -x, x), 0, _CLIP) + _BIAS
    # exponent: position of the highest set bit above bit 7 (a >= 0x84 > 0)
    exp = (np.floor(np.log2(a)).astype(np.int32) - 7).clip(0, 7)
    mant = (a >> (exp + 3)) & 0x0F
    # Pre-complement sign nibble is 0x80 for NEGATIVE samples, so after the
    # ones complement the wire sign bit is 1 for positives (+0 -> 0xFF, the
    # standard mu-law silence byte) — matches Sun g711.c / ffmpeg.
    byte = (np.where(neg, 0x80, 0x00) | (exp << 4) | mant).astype(np.uint8)
    return np.invert(byte)  # wire byte is the ones complement (G.711)


def ulaw_decode_np(b: np.ndarray) -> np.ndarray:
    """uint8 mu-law -> int16 PCM (G.711 inverse)."""
    u = np.invert(b.astype(np.uint8)).astype(np.int32)
    sign = u & 0x80  # pre-complement sign: set = negative (G.711)
    exp = (u >> 4) & 0x07
    mant = u & 0x0F
    mag = ((mant << 3) + _BIAS) << exp
    mag = mag - _BIAS
    return np.where(sign != 0, -mag, mag).astype(np.int16)


def ulaw_encode_jnp(pcm_float):
    """float PCM [-1, 1] -> uint8 mu-law, on device (jnp).

    Same segment arithmetic as ulaw_encode_np (int16 quantization first),
    pinned bit-exact against it by tests/test_g711.py.
    """
    import jax.numpy as jnp

    x = jnp.clip(pcm_float.astype(jnp.float32), -1.0, 1.0)
    x = jnp.round(x * 32767.0).astype(jnp.int32)
    neg = x < 0
    a = jnp.clip(jnp.where(neg, -x, x), 0, _CLIP) + _BIAS
    exp = jnp.clip(jnp.floor(jnp.log2(a.astype(jnp.float32))).astype(jnp.int32) - 7, 0, 7)
    mant = (a >> (exp + 3)) & 0x0F
    byte = jnp.where(neg, 0x80, 0x00) | (exp << 4) | mant
    return (~byte & 0xFF).astype(jnp.uint8)


def resample_to_8k(pcm: np.ndarray, rate: int) -> np.ndarray:
    """Polyphase-free resample to 8 kHz via the host audio helper."""
    from smoltts_tpu.native.audio_io import resample

    return resample(pcm, rate, 8000)
