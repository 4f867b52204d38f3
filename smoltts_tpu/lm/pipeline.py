"""Fused serving pipeline: LM frame step + Mimi vocoder in single dispatches.

The reference hot loop takes 9 host syncs per frame (SURVEY.md §3.3); the
plain jitted path here takes 2-3 dispatches per frame, which still dominates
wall-clock through a remote/tunneled runtime. This module collapses the
whole 80 ms pipeline:

- `make_stream_step` — ONE jitted program per frame: slow step + fast
  micro-loop + sampling + RVQ decode + upsample + codec transformer + SEANet
  -> 1920 PCM samples per stream. Minimal-latency streaming.
- `make_chunk_step` — `lax.scan` over K frames inside one program (LM and
  vocoder advance together) -> [B, K*1920] PCM per dispatch. Throughput mode:
  dispatch overhead amortizes K-fold; latency granularity K*80 ms.

Like the reference streaming path (SmolTTS.stream, __init__.py:83-95), every
frame — audio or not — is pushed through the vocoder; `is_audio` flags let
the caller drop silence frames.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from smoltts_tpu.codec.config import MimiConfig
from smoltts_tpu.codec.mimi import MimiStreamState, flush_mimi_state, mimi_decode_step
from smoltts_tpu.config import DualARConfig
from smoltts_tpu.lm.decode import DecodeState, decode_frame, prefill
from smoltts_tpu.lm.samplers import GenerationSettings
from smoltts_tpu.tokenizer import TokenConfig


def _donate_names(*names):
    """Buffer donation is opt-in (SMOLTTS_DONATE=1): through the tunneled
    TPU runtime used here a donated dispatch costs ~2 s (the relay re-stages
    donated buffers); on a direct-attached TPU donation halves state memory."""
    import os

    return names if os.environ.get("SMOLTTS_DONATE") == "1" else ()




# --------------------------------------------------------------------------
# History-splitting wrappers
# --------------------------------------------------------------------------
#
# This runtime (like any jit without donation) materializes a fresh output
# buffer even for values that pass through a program unchanged — measured
# ~640 GB/s, i.e. ~1 ms per 336 MB KV history per step. The per-frame step
# programs therefore take the big read-only buffers (LM KV history, codec
# transformer ring) as INPUTS ONLY and return states with those fields set
# to None; thin host-side wrappers splice the originals back in. Only
# prefill/admission and the periodic flush programs output fresh histories.


def _split_lm(state: DecodeState):
    """Split out the read-only history buffers. In kv8 mode the per-vector
    scales ride along as (k, k_scale) / (v, v_scale) tuples (pytrees), so
    every split/merge call site is mode-agnostic."""
    k = (state.k, state.k_scale)
    v = (state.v, state.v_scale)
    return k, v, state._replace(k=None, v=None, k_scale=None, v_scale=None)


def _merge_lm(k, v, rest: DecodeState) -> DecodeState:
    return rest._replace(k=k[0], v=v[0], k_scale=k[1], v_scale=v[1])


def _split_mimi(ms: MimiStreamState):
    t = ms.transformer
    k = (t.k, t.k_scale)
    v = (t.v, t.v_scale)
    return k, v, ms._replace(
        transformer=t._replace(k=None, v=None, k_scale=None, v_scale=None)
    )


def _merge_mimi(k, v, ms: MimiStreamState) -> MimiStreamState:
    return ms._replace(
        transformer=ms.transformer._replace(
            k=k[0], v=v[0], k_scale=k[1], v_scale=v[1]
        )
    )


class StreamStepOutput(NamedTuple):
    pcm: jnp.ndarray  # [B, samples, 1]
    audio_codes: jnp.ndarray  # [B, ncb] (or [B, ncb, K] chunked)
    is_audio: jnp.ndarray  # [B] (or [B, K])
    finished: jnp.ndarray  # [B]


def make_stream_step(
    cfg: DualARConfig,
    token_cfg: TokenConfig,
    settings: GenerationSettings,
    mimi_cfg: MimiConfig,
    attend_limit: Optional[int] = None,
):
    """(lm_params, mimi_params, state, mimi_state, rng) ->
    (state', mimi_state', rng', StreamStepOutput) — one dispatch per frame.

    The PRNG key is split INSIDE the program and threaded through the
    return value: a host-side jax.random.split per frame costs ~15 ms
    through a tunneled runtime and serializes the dispatch pipeline.

    `attend_limit` statically bounds slow-trunk attention reads (length
    bucketing): the engine compiles one program per bucket and switches as
    positions grow; state shapes are identical across buckets."""

    def step(lm_params, mimi_params, lm_k, lm_v, ring_k, ring_v, rest, mimi_rest, rng):
        state = _merge_lm(lm_k, lm_v, rest)
        mimi_state = _merge_mimi(ring_k, ring_v, mimi_rest)
        rng, sub = jax.random.split(rng)
        state, out = decode_frame(
            lm_params, cfg, token_cfg, settings, state, sub, attend_limit=attend_limit
        )
        mimi_state, pcm = mimi_decode_step(
            mimi_params, mimi_cfg, mimi_state, out.audio_codes[:, :, None]
        )
        _, _, rest = _split_lm(state)
        _, _, mimi_rest = _split_mimi(mimi_state)
        return rest, mimi_rest, rng, StreamStepOutput(
            pcm=pcm,
            audio_codes=out.audio_codes,
            is_audio=out.is_audio,
            finished=out.finished,
        )

    jitted = jax.jit(step)

    def wrapped(lm_params, mimi_params, state, mimi_state, rng):
        lm_k, lm_v, rest = _split_lm(state)
        ring_k, ring_v, mimi_rest = _split_mimi(mimi_state)
        rest, mimi_rest, rng, out = jitted(
            lm_params, mimi_params, lm_k, lm_v, ring_k, ring_v, rest, mimi_rest, rng
        )
        return _merge_lm(lm_k, lm_v, rest), _merge_mimi(ring_k, ring_v, mimi_rest), rng, out

    return wrapped


def make_prefill_step(
    cfg: DualARConfig,
    token_cfg: TokenConfig,
    settings: GenerationSettings,
    mimi_cfg: MimiConfig,
):
    """Prefill + first frame + first PCM chunk in one dispatch
    (minimizes first-audio latency)."""

    def step(lm_params, mimi_params, state, mimi_state, prompt, prompt_len, rng):
        rng, sub = jax.random.split(rng)
        state, out = prefill(
            lm_params, cfg, token_cfg, settings, state, prompt, prompt_len, sub
        )
        mimi_state, pcm = mimi_decode_step(
            mimi_params, mimi_cfg, mimi_state, out.audio_codes[:, :, None]
        )
        return state, mimi_state, rng, StreamStepOutput(
            pcm=pcm,
            audio_codes=out.audio_codes,
            is_audio=out.is_audio,
            finished=out.finished,
        )

    return jax.jit(step, donate_argnames=_donate_names("state", "mimi_state"))


def make_chunk_step(
    cfg: DualARConfig,
    token_cfg: TokenConfig,
    settings: GenerationSettings,
    mimi_cfg: MimiConfig,
    frames_per_chunk: int,
    attend_limit: Optional[int] = None,
):
    """K frames of LM + vocoder per dispatch via lax.scan (throughput mode).

    With `attend_limit`, the caller guarantees max(pos) + frames_per_chunk
    <= attend_limit before the dispatch."""

    def step(lm_params, mimi_params, lm_k, lm_v, ring_k, ring_v, rest, mimi_rest, rng):
        def body(carry, _):
            rest, mimi_rest, rng = carry
            state = _merge_lm(lm_k, lm_v, rest)
            mimi_state = _merge_mimi(ring_k, ring_v, mimi_rest)
            rng, sub = jax.random.split(rng)
            state, out = decode_frame(
                lm_params, cfg, token_cfg, settings, state, sub, attend_limit=attend_limit
            )
            mimi_state, pcm = mimi_decode_step(
                mimi_params, mimi_cfg, mimi_state, out.audio_codes[:, :, None]
            )
            _, _, rest = _split_lm(state)
            _, _, mimi_rest = _split_mimi(mimi_state)
            return (rest, mimi_rest, rng), (pcm, out.audio_codes, out.is_audio)

        (rest, mimi_rest, rng), (pcm, codes, is_audio) = jax.lax.scan(
            body, (rest, mimi_rest, rng), None, length=frames_per_chunk
        )
        # pcm: [K, B, spf, 1] -> [B, K*spf, 1]
        K, B, spf, _ = pcm.shape
        pcm = pcm.transpose(1, 0, 2, 3).reshape(B, K * spf, 1)
        return rest, mimi_rest, rng, StreamStepOutput(
            pcm=pcm,
            audio_codes=codes.transpose(1, 2, 0),
            is_audio=is_audio.transpose(1, 0),
            finished=rest.finished,
        )

    jitted = jax.jit(step)

    def wrapped(lm_params, mimi_params, state, mimi_state, rng):
        lm_k, lm_v, rest = _split_lm(state)
        ring_k, ring_v, mimi_rest = _split_mimi(mimi_state)
        rest, mimi_rest, rng, out = jitted(
            lm_params, mimi_params, lm_k, lm_v, ring_k, ring_v, rest, mimi_rest, rng
        )
        return _merge_lm(lm_k, lm_v, rest), _merge_mimi(ring_k, ring_v, mimi_rest), rng, out

    return wrapped


def make_flush_step():
    """Jitted combined flush of the LM ring tail and the codec transformer
    ring tail (one dispatch). Serving loops call this every
    `flush_every` frames, where flush_every <= min(lm tail_len,
    mimi tail_len // 2) - 1 (2 codec tokens per frame)."""
    from smoltts_tpu.lm.decode import flush_kv

    def step(state: DecodeState, mimi_state: Optional[MimiStreamState]):
        state = flush_kv(state)
        if mimi_state is not None:
            mimi_state = flush_mimi_state(mimi_state)
        return state, mimi_state

    return jax.jit(step)


def flush_cadence(state: DecodeState, mimi_state: Optional[MimiStreamState]) -> int:
    """Max frames between flushes for the given state shapes."""
    frames = int(state.tail_len) - 1
    if mimi_state is not None:
        frames = min(frames, int(mimi_state.transformer.tail_len) // 2 - 1)
    return max(frames, 1)
