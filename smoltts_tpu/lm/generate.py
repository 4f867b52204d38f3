"""Generation drivers over the jitted prefill/decode-frame kernels.

Two drivers, same semantics as the reference generation loop
(mlx .../lm/generate.py:174-216), batched over B streams:

- `generate_frames` — host-side iterator yielding one FrameOutput per 80 ms
  frame (for streaming synthesis); decode state is donated between steps so
  the KV cache updates in place.
- `generate_blocking` — drains the iterator and returns stacked audio codes
  plus wall-clock metrics (prefill ms, frames/s, x-realtime at 12.5 Hz).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from smoltts_tpu.config import DualARConfig
from smoltts_tpu.lm.decode import (
    DecodeState,
    FrameOutput,
    flush_kv,
    init_decode_state,
    make_decode_fns,
)
from smoltts_tpu.lm.samplers import GenerationSettings
from smoltts_tpu.tokenizer import TokenConfig

FRAME_RATE = 12.5  # Mimi frames/s (README.md:24)


@dataclass
class GenerationMetrics:
    prefill_ms: float = 0.0
    decode_s: float = 0.0
    frames: int = 0

    @property
    def frames_per_s(self) -> float:
        return self.frames / self.decode_s if self.decode_s > 0 else 0.0

    @property
    def x_realtime(self) -> float:
        return self.frames_per_s / FRAME_RATE


def pad_prompts(prompts: List[np.ndarray], pad_to_multiple: int = 64) -> Tuple[np.ndarray, np.ndarray]:
    """Right-pad [R, T_i] prompts to a common bucketed length -> ([B, R, T], [B])."""
    lens = np.array([p.shape[-1] for p in prompts], dtype=np.int32)
    T = int(max(lens))
    T = ((T + pad_to_multiple - 1) // pad_to_multiple) * pad_to_multiple
    R = prompts[0].shape[0]
    out = np.zeros((len(prompts), R, T), dtype=np.int32)
    for i, p in enumerate(prompts):
        out[i, :, : p.shape[-1]] = p
    return out, lens


class FrameGenerator:
    """Batched, KV-cached frame generator (host loop over jitted steps)."""

    def __init__(
        self,
        params,
        cfg: DualARConfig,
        token_cfg: TokenConfig,
        settings: GenerationSettings,
        prompts: List[np.ndarray],
        rng: Optional[jax.Array] = None,
        max_seq_len: Optional[int] = None,
        kv_dtype=jnp.bfloat16,
    ):
        self.cfg = cfg
        self.settings = settings
        self.params = params
        self.metrics = GenerationMetrics()
        self._prefill_fn, self._decode_fn = make_decode_fns(cfg, token_cfg, settings)
        self.rng = rng if rng is not None else jax.random.PRNGKey(0)

        prompt, prompt_len = pad_prompts(prompts)
        B = prompt.shape[0]
        S = max_seq_len or cfg.max_seq_len
        state = init_decode_state(cfg, B, S, dtype=kv_dtype)

        t0 = time.perf_counter()
        self.rng, sub = jax.random.split(self.rng)
        self.state, first = self._prefill_fn(
            params, state, jnp.asarray(prompt), jnp.asarray(prompt_len), sub
        )
        jax.block_until_ready(first.tokens)
        self.metrics.prefill_ms = (time.perf_counter() - t0) * 1e3
        self._first: Optional[FrameOutput] = first
        self._emitted = 0
        # Ring-tail flush cadence: consolidate before the tail wraps.
        self._flush_fn = jax.jit(flush_kv)
        self._since_flush = 0
        self._tail_len = int(self.state.tail_len)

    def __iter__(self) -> Iterator[FrameOutput]:
        return self

    def __next__(self) -> FrameOutput:
        if self._first is not None:
            out, self._first = self._first, None
            self._emitted += 1
            return out
        if self._emitted >= self.settings.max_new_tokens:
            raise StopIteration
        if bool(np.asarray(self.state.finished).all()):
            raise StopIteration
        if self._since_flush >= self._tail_len - 1:
            self.state = self._flush_fn(self.state)
            self._since_flush = 0
        self.rng, sub = jax.random.split(self.rng)
        self.state, out = self._decode_fn(self.params, self.state, sub)
        self._since_flush += 1
        self._emitted += 1
        return out


def generate_blocking(
    params,
    cfg: DualARConfig,
    token_cfg: TokenConfig,
    settings: GenerationSettings,
    prompts: List[np.ndarray],
    rng: Optional[jax.Array] = None,
    verbose: bool = False,
) -> Tuple[np.ndarray, np.ndarray, GenerationMetrics]:
    """Generate to completion. Returns (audio_codes [B, ncb, T], n_frames [B],
    metrics). Frames after a stream finishes are zero-filled."""
    gen = FrameGenerator(params, cfg, token_cfg, settings, prompts, rng=rng)
    frames: List[np.ndarray] = []
    valid: List[np.ndarray] = []
    t0 = time.perf_counter()
    for out in gen:
        frames.append(np.asarray(out.audio_codes))
        valid.append(np.asarray(out.is_audio))
    gen.metrics.decode_s = time.perf_counter() - t0
    gen.metrics.frames = len(frames)

    codes = np.stack(frames, axis=-1)  # [B, ncb, T]
    valid_arr = np.stack(valid, axis=-1)  # [B, T]
    codes = codes * valid_arr[:, None, :]
    n_frames = valid_arr.sum(axis=-1).astype(np.int32)
    if verbose:
        m = gen.metrics
        print(
            f"prefill {m.prefill_ms:.1f}ms | {m.frames} frames in {m.decode_s:.2f}s "
            f"({m.frames_per_s:.1f} frames/s, {m.x_realtime:.1f}x realtime/stream)"
        )
    return codes, n_frames, gen.metrics


def make_device_generator(
    cfg: DualARConfig,
    token_cfg: TokenConfig,
    settings: GenerationSettings,
    num_frames: int,
):
    """Fully-on-device generation: prefill + lax.scan over `num_frames` frames,
    one dispatch total. Used for throughput benchmarking and training-free
    eval; returns a jitted fn of (params, state, prompt, prompt_len, rng) ->
    (audio_codes [B, ncb, num_frames], is_audio [B, num_frames], finished)."""
    from smoltts_tpu.lm.decode import decode_frame, prefill

    def run(params, state, prompt, prompt_len, rng):
        # The whole generation scans inside one program, so the ring tail
        # must cover it (size the state with tail_len >= num_frames).
        assert state.k_tail.shape[3] >= num_frames, (
            f"device generator needs tail_len >= num_frames "
            f"({state.k_tail.shape[3]} < {num_frames})"
        )
        rng, sub = jax.random.split(rng)
        state, first = prefill(
            params, cfg, token_cfg, settings, state, prompt, prompt_len, sub
        )

        def step(carry, _):
            state, rng = carry
            rng, sub = jax.random.split(rng)
            state, out = decode_frame(params, cfg, token_cfg, settings, state, sub)
            return (state, rng), (out.audio_codes, out.is_audio)

        (state, _), (codes, is_audio) = jax.lax.scan(
            step, (state, rng), None, length=num_frames - 1
        )
        all_codes = jnp.concatenate(
            [first.audio_codes[None], codes], axis=0
        )  # [T, B, ncb]
        all_valid = jnp.concatenate([first.is_audio[None], is_audio], axis=0)
        return (
            all_codes.transpose(1, 2, 0),
            all_valid.transpose(1, 0),
            state.finished,
        )

    from smoltts_tpu.lm.pipeline import _donate_names

    return jax.jit(run, donate_argnames=_donate_names("state"))
