"""smoltts_tpu — TPU-native DualAR text-to-speech framework.

High-level API mirroring the reference `SmolTTS`
(mlx_inference/src/smoltts_mlx/__init__.py:25-151): load a DualAR checkpoint
plus the Mimi codec, synthesize PCM with `__call__`, stream 80 ms chunks with
`.stream()`, and build voice-cloning prompts with `.create_speaker()`.
"""

from __future__ import annotations

from pathlib import Path
from typing import Iterator, List, Optional, Union

import numpy as np

from smoltts_tpu.config import DualARConfig, ModelType  # noqa: F401
from smoltts_tpu.tokenizer import ByteTokenizer, TokenConfig, load_tokenizer

__version__ = "0.1.0"

# The reference's hardcoded Kokoro voice registry (__init__.py:122-139).
VOICES = [
    "heart",
    "bella",
    "nova",
    "sky",
    "sarah",
    "michael",
    "fenrir",
    "liam",
    "emma",
    "isabella",
    "fable",
]


class SmolTTS:
    """End-to-end text-to-speech over a DualAR LM + Mimi vocoder."""

    def __init__(
        self,
        checkpoint_dir: Union[str, Path],
        mimi_path: Optional[Union[str, Path]] = None,
        dtype=None,
        generation_settings=None,
        quantize: Optional[str] = None,
    ):
        """`quantize="int8"` enables weight-only int8 decode for the LM
        trunks + heads (ops/quant.py): halves per-frame HBM weight traffic;
        embeddings and norms stay in bf16. `quantize="int8+kv8"` additionally
        stores the KV history/ring in int8 with per-vector scales
        (quality-gated by tests/test_kv8.py)."""
        import jax
        import jax.numpy as jnp

        from smoltts_tpu.codec.config import MimiConfig
        from smoltts_tpu.codec.mimi import load_mimi
        from smoltts_tpu.io.checkpoint_interop import load_params
        from smoltts_tpu.lm.prompt import PromptEncoder
        from smoltts_tpu.lm.samplers import GenerationSettings

        if quantize not in (None, "int8", "int8+kv8"):
            # Validate before the (potentially multi-GB) checkpoint load.
            raise ValueError(
                f"unknown quantize mode {quantize!r} (use 'int8' or 'int8+kv8')"
            )
        self.kv_dtype = jnp.int8 if quantize == "int8+kv8" else jnp.bfloat16

        checkpoint_dir = Path(checkpoint_dir)
        self.config = DualARConfig.from_json_file(checkpoint_dir / "config.json")
        self.tokenizer = load_tokenizer(checkpoint_dir)
        self.model_type = ModelType.smoltts_v0()
        self.token_config = TokenConfig.from_tokenizer(
            self.model_type, self.tokenizer, self.config
        )
        self.params = load_params(checkpoint_dir, self.config, dtype=dtype)
        # Decode-path weight fusion (bit-exact; this params tree only ever
        # decodes — training loads its own).
        from smoltts_tpu.ops.quant import fuse_decode_params

        self.params = fuse_decode_params(self.params)
        if quantize in ("int8", "int8+kv8"):
            from smoltts_tpu.ops.quant import quantize_decode_params

            self.params = quantize_decode_params(self.params)
        self.prompt_encoder = PromptEncoder.from_config(
            self.tokenizer, self.config, self.token_config, self.model_type
        )
        self.generation_settings = generation_settings or GenerationSettings()

        self.codec_params = None
        self.codec_config = MimiConfig()
        if mimi_path is None:
            candidate = checkpoint_dir / "mimi.safetensors"
            mimi_path = candidate if candidate.exists() else None
        if mimi_path is not None:
            self.codec_params, self.codec_config = load_mimi(mimi_path, dtype=dtype)
            from smoltts_tpu.ops.quant import fuse_mimi_decode_params

            self.codec_params = fuse_mimi_decode_params(self.codec_params)

        self.sampling_rate = self.codec_config.sampling_rate
        self._rng = jax.random.PRNGKey(0)
        self._jnp = jnp

        # Voice registry: the reference hardcodes 11 Kokoro voices and leaves
        # speaker caching as a TODO (__init__.py:60-62, tts_core.py:20). Here
        # both are loadable from the checkpoint dir: voices.json maps names
        # to speaker ids; speakers/<name>.npy holds saved conditioning
        # prompts (see save_speaker / create_speaker).
        self.voices = list(VOICES)
        self._speaker_dir = checkpoint_dir / "speakers"
        self._speaker_cache: dict = {}
        voices_path = checkpoint_dir / "voices.json"
        if voices_path.exists():
            import json

            with open(voices_path) as f:
                self.voices = json.load(f)

    # ------------------------------------------------------------------

    def _next_rng(self):
        import jax

        self._rng, sub = jax.random.split(self._rng)
        return sub

    def get_speaker(self, name: str) -> Optional[np.ndarray]:
        """Saved conditioning prompt for a cloned voice, if any."""
        if name in self._speaker_cache:
            return self._speaker_cache[name]
        path = self._speaker_dir / f"{name}.npy"
        if path.exists():
            prompt = np.load(path)
            self._speaker_cache[name] = prompt
            return prompt
        return None

    def save_speaker(self, name: str, prompt: np.ndarray) -> None:
        """Persist a create_speaker() conditioning prompt under the checkpoint."""
        self._speaker_dir.mkdir(parents=True, exist_ok=True)
        np.save(self._speaker_dir / f"{name}.npy", np.asarray(prompt, np.int32))
        self._speaker_cache[name] = np.asarray(prompt, np.int32)

    def _get_prompt(
        self, text: str, voice: str, sysprompt: Optional[np.ndarray] = None
    ) -> np.ndarray:
        if sysprompt is None:
            sysprompt = self.get_speaker(voice)
        if sysprompt is None:
            voice_id = self.voices.index(voice) if voice in self.voices else 0
            sysprompt = self.prompt_encoder.encode_text_turn(
                "system", f"<|speaker:{voice_id}|>"
            )
        user = self.prompt_encoder.encode_text_turn("user", text)
        assistant_prefix = self.prompt_encoder.encode_text_turn("assistant")
        return np.concatenate([sysprompt, user, assistant_prefix], axis=1)

    def __call__(
        self,
        input: str,
        voice: Optional[str] = "heart",
        speaker: Optional[np.ndarray] = None,
    ) -> np.ndarray:
        """Synthesize `input` -> flattened PCM float array."""
        from smoltts_tpu.codec.mimi import mimi_decode
        from smoltts_tpu.lm.generate import generate_blocking

        prompt = self._get_prompt(input, voice or "heart", sysprompt=speaker)
        codes, n_frames, _ = generate_blocking(
            self.params,
            self.config,
            self.token_config,
            self.generation_settings,
            [prompt],
            rng=self._next_rng(),
        )
        n = int(n_frames[0])
        if n == 0 or self.codec_params is None:
            return np.zeros((0,), np.float32)
        pcm = mimi_decode(
            self.codec_params, self.codec_config, self._jnp.asarray(codes[:, :, :n])
        )
        return np.asarray(pcm).flatten()

    def stream(
        self, input: str, voice: Optional[str] = "heart"
    ) -> Iterator[np.ndarray]:
        """Yield 80 ms PCM chunks as frames decode (reference __init__.py:83-95).

        Uses the fused LM-frame + vocoder pipeline: one device dispatch per
        chunk. Like the reference, every generated frame is vocoded."""
        import jax

        from smoltts_tpu.codec.mimi import decode_stream_init
        from smoltts_tpu.lm.decode import init_decode_state
        from smoltts_tpu.lm.generate import pad_prompts
        from smoltts_tpu.lm.pipeline import (
            flush_cadence,
            make_flush_step,
            make_prefill_step,
            make_stream_step,
        )

        if self.codec_params is None:
            raise RuntimeError("no Mimi weights loaded; pass mimi_path")
        prompt = self._get_prompt(input, voice or "heart")
        prefill_step = make_prefill_step(
            self.config, self.token_config, self.generation_settings, self.codec_config
        )
        stream_step = make_stream_step(
            self.config, self.token_config, self.generation_settings, self.codec_config
        )
        kv8 = self.kv_dtype == self._jnp.int8
        state = init_decode_state(
            self.config, 1, self.config.max_seq_len, dtype=self.kv_dtype
        )
        mstate = decode_stream_init(
            self.codec_config, batch=1, kv_dtype=self._jnp.int8 if kv8 else None
        )
        padded, lens = pad_prompts([prompt])
        rng = self._next_rng()
        state, mstate, rng, out = prefill_step(
            self.params,
            self.codec_params,
            state,
            mstate,
            self._jnp.asarray(padded),
            self._jnp.asarray(lens),
            rng,
        )
        yield np.asarray(out.pcm).flatten()
        flush_step = make_flush_step()
        cadence = flush_cadence(state, mstate)
        since_flush = 0
        for _ in range(self.generation_settings.max_new_tokens - 1):
            if bool(np.asarray(out.finished)[0]):
                break
            if since_flush >= cadence:
                state, mstate = flush_step(state, mstate)
                since_flush = 0
            state, mstate, rng, out = stream_step(
                self.params, self.codec_params, state, mstate, rng
            )
            since_flush += 1
            yield np.asarray(out.pcm).flatten()

    def create_speaker(
        self, samples: List[dict], system_prompt: Optional[str] = None
    ) -> np.ndarray:
        """Build a voice-cloning conditioning prompt from (text, audio) samples
        by Mimi-encoding the reference audio (reference __init__.py:97-118)."""
        from smoltts_tpu.codec.mimi import mimi_encode

        if self.codec_params is None:
            raise RuntimeError("no Mimi weights loaded; pass mimi_path")
        turns = []
        for sample in samples:
            if "audio" not in sample or "text" not in sample:
                raise ValueError(
                    f"Sample must contain both 'text' and 'audio' but got {sample.keys()}"
                )
            user_prompt = self.prompt_encoder.encode_text_turn("user", sample["text"])
            audio = np.asarray(sample["audio"], np.float32).reshape(1, -1)
            codes = mimi_encode(
                self.codec_params,
                self.codec_config,
                self._jnp.asarray(audio),
                num_quantizers=8,
            )
            vq = self.prompt_encoder.encode_vq(np.asarray(codes)[0])
            turns.append(user_prompt)
            turns.append(vq)
        if system_prompt is not None:
            turns = [self.prompt_encoder.encode_text_turn("system", system_prompt), *turns]
        return np.concatenate(turns, axis=1)
