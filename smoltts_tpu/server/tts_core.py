"""Audio transcoding + model glue behind the HTTP routes.

Capability parity with the reference server core
(mlx_inference/src/smoltts_mlx/server/tts_core.py:15-84): blocking generation
to pcm/wav/mp3 at a requested sample rate, and raw-PCM16 streaming. The
implementation differs: transcoding is a table of pure functions over float32
PCM, resampling prefers the native C sinc resampler, and MP3 is produced by
this repo's own numpy MPEG encoder (smoltts_tpu/io/mpeg.py) instead of pydub.

Format strings follow the ElevenLabs convention ``<codec>_<rate>[_<kbps>]``,
e.g. ``pcm_24000``, ``wav_16000``, ``mp3_44100_128``.
"""

from __future__ import annotations

from typing import Iterator, Tuple, Union

import numpy as np

from smoltts_tpu.io.wav import pcm_to_int16, pcm_to_wav_bytes

NATIVE_RATE = 24_000


def resample_pcm(pcm: np.ndarray, rate_in: int, rate_out: int) -> np.ndarray:
    """Sample-rate conversion: native windowed-sinc when the C extension is
    built, scipy FFT resample otherwise (the reference's approach)."""
    if rate_in == rate_out or pcm.size == 0:
        return pcm
    try:
        from smoltts_tpu.native.audio_io import native_audio_available, resample

        if native_audio_available():
            return resample(pcm, rate_in, rate_out)
    except Exception:
        pass
    from scipy import signal

    return signal.resample(pcm, int(len(pcm) * rate_out / rate_in))


def _as_pcm(pcm: np.ndarray, rate: int, _spec: Tuple[str, ...]) -> Tuple[bytes, str]:
    return pcm_to_int16(pcm).tobytes(), "audio/x-pcm"


def _as_wav(pcm: np.ndarray, rate: int, _spec: Tuple[str, ...]) -> Tuple[bytes, str]:
    return pcm_to_wav_bytes(pcm, sample_rate=rate), "audio/wav"


def _as_mp3(pcm: np.ndarray, rate: int, spec: Tuple[str, ...]) -> Tuple[bytes, str]:
    """mp3_{rate}_{kbps}: genuine MPEG-1/2 Layer III via the system LAME
    library when present (the reference's own encoder — it shells to LAME
    through pydub, mlx .../server/tts_core.py:69-82), falling back to the
    from-scratch Layer II encoder (io/mpeg.py) when no native codec exists.
    SMOLTTS_MP3_ENCODER=layer2 forces the fallback (tests/benchmarks)."""
    import os

    kbps = int(spec[2]) if len(spec) > 2 else 128
    if os.environ.get("SMOLTTS_MP3_ENCODER") != "layer2":
        from smoltts_tpu.io.mp3 import encode_mp3_lame

        data = encode_mp3_lame(pcm, rate, bitrate_kbps=kbps)
        if data is not None:
            return data, "audio/mpeg"
    try:
        from smoltts_tpu.io.mpeg import encode_mpeg_audio
    except ImportError as e:  # pragma: no cover - encoder ships with the repo
        raise NotImplementedError(f"mpeg transcoding unavailable: {e}")
    return encode_mpeg_audio(pcm, rate, bitrate_kbps=kbps), "audio/mpeg"


def _as_ulaw(pcm: np.ndarray, rate: int, _spec: Tuple[str, ...]) -> Tuple[bytes, str]:
    """G.711 mu-law (the ElevenLabs `ulaw_8000` output format family)."""
    from smoltts_tpu.io.g711 import ulaw_encode_np

    return ulaw_encode_np(pcm_to_int16(pcm)).tobytes(), "audio/basic"


_TRANSCODERS = {"pcm": _as_pcm, "wav": _as_wav, "mp3": _as_mp3, "ulaw": _as_ulaw}


def transcode(pcm: np.ndarray, output_format: str) -> Tuple[bytes, str]:
    """float32 PCM @ 24 kHz -> (encoded bytes, media type) per format spec."""
    spec = tuple(output_format.split("_"))
    encode = _TRANSCODERS.get(spec[0])
    if encode is None or len(spec) < 2:
        raise NotImplementedError(f"Format {output_format} not yet supported")
    rate = int(spec[1])
    mono = resample_pcm(np.asarray(pcm, np.float32).reshape(-1), NATIVE_RATE, rate)
    return encode(mono, rate, spec)


class TTSCore:
    """Binds a loaded SmolTTS model to the transcoding table for the routes."""

    def __init__(self, model, settings=None):
        self.model = model
        self.settings = settings

    def generate_audio(
        self,
        input_text: str,
        voice: Union[str, int],
        response_format: str = "wav_24000",
    ) -> Tuple[bytes, str]:
        pcm = self.model(input_text, str(voice))
        return transcode(pcm, response_format or "pcm_24000")

    def stream_audio(self, input_text: str, voice: Union[str, int]) -> Iterator[bytes]:
        for chunk in self.model.stream(input_text, str(voice)):
            if chunk is not None:
                yield pcm_to_int16(chunk).tobytes()
