"""WAV (RIFF) writer — float PCM to 16-bit WAV bytes.

Same surface as the reference's hand-rolled writer (mlx .../io/wav.py:4-37).
"""

from __future__ import annotations

import struct

import numpy as np


def pcm_to_int16(pcm: np.ndarray) -> np.ndarray:
    if np.asarray(pcm).dtype == np.int16:  # already device-converted (engine)
        return np.asarray(pcm)
    try:
        from smoltts_tpu.native.audio_io import f32_to_i16, native_audio_available

        if native_audio_available():
            return f32_to_i16(np.asarray(pcm)).reshape(np.asarray(pcm).shape)
    except Exception:
        pass
    x = np.clip(np.asarray(pcm, dtype=np.float32), -1.0, 1.0)
    return (x * 32767.0).astype(np.int16)


def pcm_to_wav_bytes(pcm: np.ndarray, sample_rate: int = 24_000, num_channels: int = 1) -> bytes:
    data = pcm_to_int16(pcm).tobytes()
    byte_rate = sample_rate * num_channels * 2
    block_align = num_channels * 2
    header = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    fmt = b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, num_channels, sample_rate, byte_rate, block_align, 16
    )
    return header + fmt + b"data" + struct.pack("<I", len(data)) + data


def wav_header(sample_rate: int = 24_000, num_channels: int = 1, data_size: int = 0xFFFFFFFF - 100) -> bytes:
    """A WAV header alone (for streaming responses of unknown length)."""
    byte_rate = sample_rate * num_channels * 2
    block_align = num_channels * 2
    return (
        b"RIFF"
        + struct.pack("<I", 36 + data_size)
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, num_channels, sample_rate, byte_rate, block_align, 16)
        + b"data"
        + struct.pack("<I", data_size)
    )
