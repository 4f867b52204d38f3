"""Decode-path correctness: KV-cached incremental decoding must agree with
the full training forward (prefill logits == forward logits at the last
position; greedy incremental generation == greedy re-scoring), and the fast
micro-loop must agree with the dense fast trunk under teacher forcing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smoltts_tpu.config import tiny_debug_config
from smoltts_tpu.lm.decode import (
    decode_frame,
    init_decode_state,
    prefill,
)
from smoltts_tpu.lm.generate import FrameGenerator, generate_blocking
from smoltts_tpu.lm.samplers import GenerationSettings
from smoltts_tpu.models.dual_ar import forward_train, init_params
from smoltts_tpu.tokenizer import TokenConfig
from smoltts_tpu.config import DualARConfig, ModelType
from smoltts_tpu.tokenizer import ByteTokenizer


CB = 32


def make_cfg(**kw):
    return tiny_debug_config(codebook_size=CB, vocab_size=256 + 64 + CB, **kw)


def make_token_cfg(cfg):
    tok = ByteTokenizer(cfg.codebook_size)
    return TokenConfig.from_tokenizer(ModelType.smoltts_v0(), tok, cfg)


def audio_prompt(cfg, token_cfg, T, seed=0):
    """A prompt of audio frames (row0 semantic, codebook rows random)."""
    rng = np.random.default_rng(seed)
    R = cfg.num_rows
    p = np.zeros((R, T), dtype=np.int32)
    codes0 = rng.integers(0, cfg.codebook_size, T)
    p[0] = token_cfg.semantic_start_id + codes0
    if cfg.duplicate_code_0:
        p[1] = codes0
        p[2:] = rng.integers(0, cfg.codebook_size, (R - 2, T))
    else:
        p[1:] = rng.integers(0, cfg.codebook_size, (R - 1, T))
    return p


@pytest.mark.parametrize("duplicate_code_0", [True, False])
def test_prefill_logits_match_forward(duplicate_code_0):
    cfg = make_cfg(duplicate_code_0=duplicate_code_0)
    token_cfg = make_token_cfg(cfg)
    params = init_params(cfg, jax.random.PRNGKey(0))
    settings = GenerationSettings(default_temp=0.0, default_fast_temp=0.0)

    T = 7
    prompt = audio_prompt(cfg, token_cfg, T)
    state = init_decode_state(cfg, 1, 64, dtype=jnp.float32)
    state, first = prefill(
        params,
        cfg,
        token_cfg,
        settings,
        state,
        jnp.asarray(prompt[None]),
        jnp.asarray([T], jnp.int32),
        jax.random.PRNGKey(1),
    )
    out = forward_train(
        params,
        cfg,
        jnp.asarray(prompt[None]),
        embed_mask_mode="semantic_range",
        semantic_start_id=token_cfg.semantic_start_id,
        semantic_end_id=token_cfg.semantic_end_id,
    )
    full_argmax = int(np.argmax(np.asarray(out.token_logits)[0, -1]))
    assert int(first.slow_token[0]) == full_argmax


@pytest.mark.parametrize("duplicate_code_0", [True, False])
def test_incremental_matches_rescoring(duplicate_code_0):
    """Greedy decode then re-score the produced sequence with the training
    forward: every decoded slow token must equal the forward argmax at its
    position, and every fast code must match the dense fast-trunk argmax."""
    cfg = make_cfg(duplicate_code_0=duplicate_code_0)
    token_cfg = make_token_cfg(cfg)
    params = init_params(cfg, jax.random.PRNGKey(2))
    settings = GenerationSettings(
        default_temp=0.0, default_fast_temp=0.0, max_new_tokens=6
    )

    T = 5
    prompt = audio_prompt(cfg, token_cfg, T, seed=3)
    gen = FrameGenerator(
        params,
        cfg,
        token_cfg,
        settings,
        [prompt],
        max_seq_len=64,
        kv_dtype=jnp.float32,
    )
    frames = [np.asarray(f.tokens)[0] for f in gen]  # each [R]
    assert len(frames) >= 2

    # Build the full sequence [R, T + n_frames] and re-score it with
    # decode-style embedding semantics.
    seq = np.concatenate([prompt] + [f[:, None] for f in frames], axis=1)
    out = forward_train(
        params,
        cfg,
        jnp.asarray(seq[None]),
        embed_mask_mode="semantic_range",
        semantic_start_id=token_cfg.semantic_start_id,
        semantic_end_id=token_cfg.semantic_end_id,
    )
    token_logits = np.asarray(out.token_logits)[0]
    cb_logits = np.asarray(out.codebook_logits)[0]

    for j, frame in enumerate(frames):
        pos = T - 1 + j  # forward position whose prediction produced frame j
        assert int(frame[0]) == int(np.argmax(token_logits[pos])), f"frame {j} slow"
        # Dense fast trunk at position `pos` is teacher-forced with the codes
        # of the NEXT input frame (which is exactly `frame` rows 1..): its
        # argmax at each level must reproduce the sampled codes.
        for lvl in range(cfg.max_fast_seqlen):
            assert int(frame[1 + lvl]) == int(np.argmax(cb_logits[pos, lvl])), (
                f"frame {j} level {lvl}"
            )


def test_batched_generation_and_finish():
    cfg = make_cfg()
    token_cfg = make_token_cfg(cfg)
    params = init_params(cfg, jax.random.PRNGKey(4))
    settings = GenerationSettings(
        default_temp=0.8, default_fast_temp=0.8, min_p=0.1, max_new_tokens=4
    )
    prompts = [
        audio_prompt(cfg, token_cfg, 4, seed=5),
        audio_prompt(cfg, token_cfg, 6, seed=6),
    ]
    codes, n_frames, metrics = generate_blocking(
        params, cfg, token_cfg, settings, prompts, rng=jax.random.PRNGKey(7)
    )
    B, ncb, Tgen = codes.shape
    assert B == 2 and ncb == cfg.num_codebooks
    assert Tgen <= settings.max_new_tokens
    assert metrics.prefill_ms > 0
    assert (codes >= 0).all() and (codes < cfg.codebook_size).all()


def test_finished_streams_emit_im_end():
    """Once a stream samples <|im_end|> it must keep emitting it."""
    cfg = make_cfg()
    token_cfg = make_token_cfg(cfg)
    params = init_params(cfg, jax.random.PRNGKey(8))
    settings = GenerationSettings(default_temp=0.0, default_fast_temp=0.0)

    state = init_decode_state(cfg, 2, 32, dtype=jnp.float32)
    prompt = np.stack(
        [audio_prompt(cfg, token_cfg, 4, seed=9), audio_prompt(cfg, token_cfg, 4, seed=10)]
    )
    state, out = prefill(
        params,
        cfg,
        token_cfg,
        settings,
        state,
        jnp.asarray(prompt),
        jnp.asarray([4, 4], jnp.int32),
        jax.random.PRNGKey(0),
    )
    # Force slot 0 finished, then step: its slow token must be im_end.
    state = state._replace(finished=jnp.asarray([True, False]))
    state, out = decode_frame(
        params, cfg, token_cfg, settings, state, jax.random.PRNGKey(1)
    )
    assert int(out.slow_token[0]) == token_cfg.im_end_id
    assert bool(out.finished[0])
    assert not bool(out.is_audio[0])


def test_attend_limit_bucketing_is_exact():
    """decode_frame with a static attend_limit >= max(pos)+1 must produce
    bit-identical results to the unbucketed step (greedy)."""
    cfg = make_cfg()
    token_cfg = make_token_cfg(cfg)
    params = init_params(cfg, jax.random.PRNGKey(4))
    settings = GenerationSettings(default_temp=0.0, default_fast_temp=0.0)

    T, S, B = 6, 64, 2
    prompts = np.stack(
        [audio_prompt(cfg, token_cfg, T, seed=5), audio_prompt(cfg, token_cfg, T, seed=6)]
    )
    def run(attend_limit):
        state = init_decode_state(cfg, B, S, dtype=jnp.float32)
        state, out = prefill(
            params, cfg, token_cfg, settings, state,
            jnp.asarray(prompts), jnp.full((B,), T, jnp.int32), jax.random.PRNGKey(7),
        )
        frames = [np.asarray(out.tokens)]
        for i in range(5):
            state, out = decode_frame(
                params, cfg, token_cfg, settings, state, jax.random.PRNGKey(8 + i),
                attend_limit=attend_limit,
            )
            frames.append(np.asarray(out.tokens))
        return np.stack(frames)

    full = run(None)
    bucketed = run(16)  # covers T + 5 frames = 11 positions
    np.testing.assert_array_equal(full, bucketed)


def test_flush_equivalence():
    """Greedy decode with a tiny ring tail (forcing mid-generation flushes)
    must match decode with a large tail (no flush)."""
    from smoltts_tpu.lm.decode import flush_kv, init_decode_state as init_st

    cfg = make_cfg()
    token_cfg = make_token_cfg(cfg)
    params = init_params(cfg, jax.random.PRNGKey(9))
    settings = GenerationSettings(default_temp=0.0, default_fast_temp=0.0)
    T, B, N = 6, 2, 9
    prompts = np.stack(
        [audio_prompt(cfg, token_cfg, T, seed=1), audio_prompt(cfg, token_cfg, T, seed=2)]
    )

    def run(tail_len, flush_every):
        state = init_st(cfg, B, 64, dtype=jnp.float32, tail_len=tail_len)
        state, out = prefill(
            params, cfg, token_cfg, settings, state,
            jnp.asarray(prompts), jnp.full((B,), T, jnp.int32), jax.random.PRNGKey(3),
        )
        frames = [np.asarray(out.tokens)]
        since = 0
        for i in range(N):
            if since >= flush_every:
                state = flush_kv(state)
                since = 0
            state, out = decode_frame(
                params, cfg, token_cfg, settings, state, jax.random.PRNGKey(10 + i)
            )
            since += 1
            frames.append(np.asarray(out.tokens))
        return np.stack(frames)

    big = run(tail_len=32, flush_every=10**9)
    small = run(tail_len=4, flush_every=3)
    np.testing.assert_array_equal(big, small)
