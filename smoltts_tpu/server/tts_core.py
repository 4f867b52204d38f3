"""TTS core: generation + transcoding behind the HTTP routes.

Semantics per the reference TTSCore (mlx .../server/tts_core.py:15-84):
voice resolution, blocking generate -> formatted bytes (raw 16-bit PCM, WAV;
MP3 requires pydub and 501s when unavailable), scipy resampling when the
requested rate differs from 24 kHz, and a raw-PCM16 streaming generator.
"""

from __future__ import annotations

import io
import time
from typing import Iterator, Tuple, Union

import numpy as np

from smoltts_tpu.io.wav import pcm_to_int16, pcm_to_wav_bytes


def _resample(pcm: np.ndarray, in_rate: int, out_rate: int) -> np.ndarray:
    """Native windowed-sinc resampler; scipy FFT resample as fallback
    (the reference's path, tts_core.py:56-58)."""
    try:
        from smoltts_tpu.native.audio_io import native_audio_available, resample

        if native_audio_available():
            return resample(pcm, in_rate, out_rate)
    except Exception:
        pass
    from scipy import signal

    return signal.resample(pcm, int(len(pcm) * out_rate / in_rate))


class TTSCore:
    def __init__(self, model, settings=None):
        self.model = model
        self.settings = settings

    def resolve_speaker_id(self, voice: Union[str, int]) -> int:
        if isinstance(voice, int):
            return voice
        if isinstance(voice, str) and voice.isnumeric():
            return int(voice)
        return 0

    def generate_audio(
        self, input_text: str, voice: Union[str, int], response_format: str = "wav_24000"
    ) -> Tuple[bytes, str]:
        pcm = self.model(input_text, str(voice))
        t0 = time.time()
        out = self.format_audio_chunk(np.asarray(pcm).flatten(), response_format or "pcm_24000")
        print(f"Took {time.time() - t0:.2f}s to transcode")
        return out

    def stream_audio(self, input_text: str, voice: Union[str, int]) -> Iterator[bytes]:
        for pcm_chunk in self.model.stream(input_text, str(voice)):
            if pcm_chunk is not None:
                yield pcm_to_int16(pcm_chunk).tobytes()

    def format_audio_chunk(
        self, pcm_data: np.ndarray, output_format: str = "pcm_24000"
    ) -> Tuple[bytes, str]:
        sample_rate = int(output_format.split("_")[1])
        pcm_data = np.asarray(pcm_data, np.float32).flatten()

        if sample_rate != 24_000 and pcm_data.size:
            pcm_data = _resample(pcm_data, 24_000, sample_rate)

        if output_format.startswith("pcm_"):
            return pcm_to_int16(pcm_data).tobytes(), "audio/x-pcm"
        if output_format.startswith("wav_"):
            return pcm_to_wav_bytes(pcm_data, sample_rate=sample_rate), "audio/wav"
        if output_format.startswith("mp3_"):
            try:
                from pydub import AudioSegment  # type: ignore
            except ImportError as e:
                raise NotImplementedError(f"mp3 transcoding unavailable: {e}")
            bitrate = output_format.split("_")[-1]
            seg = AudioSegment(
                data=pcm_to_int16(pcm_data).tobytes(),
                sample_width=2,
                frame_rate=sample_rate,
                channels=1,
            )
            buf = io.BytesIO()
            seg.export(buf, format="mp3", bitrate=f"{bitrate}k")
            return buf.getvalue(), "audio/mpeg"
        raise NotImplementedError(f"Format {output_format} not yet supported")
