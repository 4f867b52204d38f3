"""Engine + slot-batched vocoder: streamed PCM must equal the single-stream
fused pipeline output (greedy), including across slot reuse."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from smoltts_tpu.codec.config import MimiConfig
from smoltts_tpu.codec.mimi import decode_stream_init, init_mimi_params
from smoltts_tpu.config import ModelType, tiny_debug_config
from smoltts_tpu.lm.decode import init_decode_state
from smoltts_tpu.lm.engine import DecodeEngine
from smoltts_tpu.lm.generate import pad_prompts
from smoltts_tpu.lm.pipeline import make_prefill_step, make_stream_step
from smoltts_tpu.lm.samplers import GenerationSettings
from smoltts_tpu.models.dual_ar import init_params
from smoltts_tpu.tokenizer import ByteTokenizer, TokenConfig


def setup():
    cfg = tiny_debug_config(codebook_size=32, vocab_size=256 + 64 + 32)
    tok = ByteTokenizer(32)
    token_cfg = TokenConfig.from_tokenizer(ModelType.smoltts_v0(), tok, cfg)
    params = init_params(cfg, jax.random.PRNGKey(0))
    mimi_cfg = MimiConfig(
        num_filters=8, upsampling_ratios=[4, 3, 2], hidden_size=32,
        num_hidden_layers=2, num_attention_heads=2, head_dim=16,
        intermediate_size=64, codebook_size=32, codebook_dim=16,
        num_quantizers=8, upsample_groups=32, frame_rate=500.0,
    )
    mimi_params = init_mimi_params(mimi_cfg, seed=1)
    return cfg, token_cfg, params, mimi_cfg, mimi_params


def audio_prompt(cfg, token_cfg, T, seed):
    rng = np.random.default_rng(seed)
    p = np.zeros((cfg.num_rows, T), dtype=np.int32)
    c0 = rng.integers(0, cfg.codebook_size, T)
    p[0] = token_cfg.semantic_start_id + c0
    p[1] = c0
    p[2:] = rng.integers(0, cfg.codebook_size, (cfg.num_rows - 2, T))
    return p


def single_stream_pcm(cfg, token_cfg, params, mimi_cfg, mimi_params, prompt, n_frames, settings):
    prefill_step = make_prefill_step(cfg, token_cfg, settings, mimi_cfg)
    stream_step = make_stream_step(cfg, token_cfg, settings, mimi_cfg)
    state = init_decode_state(cfg, 1, 64, dtype=jnp.float32)
    mstate = decode_stream_init(mimi_cfg, 1)
    padded, lens = pad_prompts([prompt], pad_to_multiple=8)
    state, mstate, rng, out = prefill_step(
        params, mimi_params, state, mstate, jnp.asarray(padded), jnp.asarray(lens),
        jax.random.PRNGKey(0),
    )
    pcm = [np.asarray(out.pcm)[0, :, 0]]
    for _ in range(n_frames - 1):
        state, mstate, rng, out = stream_step(params, mimi_params, state, mstate, rng)
        pcm.append(np.asarray(out.pcm)[0, :, 0])
    return pcm


@pytest.mark.slow
def test_engine_pcm_matches_single_stream():
    cfg, token_cfg, params, mimi_cfg, mimi_params = setup()
    settings = GenerationSettings(default_temp=0.0, default_fast_temp=0.0, max_new_tokens=4)
    prompts = [audio_prompt(cfg, token_cfg, 6, s) for s in range(3)]

    refs = [
        single_stream_pcm(cfg, token_cfg, params, mimi_cfg, mimi_params, p, 4, settings)
        for p in prompts
    ]

    engine = DecodeEngine(
        params, cfg, token_cfg, settings, num_slots=2, max_seq_len=64,
        kv_dtype=jnp.float32, prompt_bucket=8,
        mimi_params=mimi_params, mimi_cfg=mimi_cfg,
    )
    sids = [engine.submit(p) for p in prompts]  # 3 streams on 2 slots
    collected = {sid: [] for sid in sids}
    for _ in range(30):
        for sid, frame in engine.step():
            assert "pcm" in frame
            collected[sid].append(frame["pcm"])
        if not engine.has_work():
            break
    assert not engine.has_work()

    for sid, ref in zip(sids, refs):
        got = collected[sid]
        assert len(got) == len(ref)
        for g, r in zip(got, ref):
            np.testing.assert_allclose(g, r, rtol=2e-4, atol=1e-5)


@pytest.mark.slow
def test_engine_emit_int16():
    """emit_int16=True converts PCM on device; values match the float path
    to 1 LSB of int16 (the serving/bench configuration)."""
    cfg, token_cfg, params, mimi_cfg, mimi_params = setup()
    settings = GenerationSettings(default_temp=0.0, default_fast_temp=0.0, max_new_tokens=3)
    prompt = audio_prompt(cfg, token_cfg, 6, 0)
    ref = single_stream_pcm(cfg, token_cfg, params, mimi_cfg, mimi_params, prompt, 3, settings)

    engine = DecodeEngine(
        params, cfg, token_cfg, settings, num_slots=1, max_seq_len=64,
        kv_dtype=jnp.float32, prompt_bucket=8,
        mimi_params=mimi_params, mimi_cfg=mimi_cfg, emit_int16=True,
    )
    sid = engine.submit(prompt)
    got = []
    for _ in range(20):
        for s, frame in engine.step():
            assert frame["pcm"].dtype == np.int16
            got.append(frame["pcm"])
        if not engine.has_work():
            break
    assert len(got) == len(ref)
    for g, r in zip(got, ref):
        expect = np.clip(np.asarray(r, np.float32), -1, 1) * 32767.0
        np.testing.assert_allclose(g.astype(np.float32), expect, atol=1.0)
