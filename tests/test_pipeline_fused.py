"""Fused-pipeline tests: the single-dispatch stream step and the scan-chunked
step must reproduce the unfused decode_frame + mimi_decode_step composition
exactly (greedy)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from smoltts_tpu.codec.config import MimiConfig
from smoltts_tpu.codec.mimi import decode_stream_init, init_mimi_params, mimi_decode_step
from smoltts_tpu.config import ModelType, tiny_debug_config
from smoltts_tpu.lm.decode import decode_frame, init_decode_state, prefill
from smoltts_tpu.lm.pipeline import make_chunk_step, make_prefill_step, make_stream_step
from smoltts_tpu.lm.samplers import GenerationSettings
from smoltts_tpu.models.dual_ar import init_params
from smoltts_tpu.tokenizer import ByteTokenizer, TokenConfig


def setup():
    cfg = tiny_debug_config(codebook_size=32, vocab_size=256 + 64 + 32)
    tok = ByteTokenizer(32)
    token_cfg = TokenConfig.from_tokenizer(ModelType.smoltts_v0(), tok, cfg)
    params = init_params(cfg, jax.random.PRNGKey(0))
    mimi_cfg = MimiConfig(
        num_filters=8,
        upsampling_ratios=[4, 3, 2],
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=2,
        head_dim=16,
        intermediate_size=64,
        codebook_size=32,
        codebook_dim=16,
        num_quantizers=8,
        upsample_groups=32,
        frame_rate=500.0,
    )
    mimi_params = init_mimi_params(mimi_cfg, seed=1)
    return cfg, token_cfg, params, mimi_cfg, mimi_params


def audio_prompt(cfg, token_cfg, T, seed=0):
    rng = np.random.default_rng(seed)
    p = np.zeros((1, cfg.num_rows, T), dtype=np.int32)
    c0 = rng.integers(0, cfg.codebook_size, T)
    p[0, 0] = token_cfg.semantic_start_id + c0
    p[0, 1] = c0
    p[0, 2:] = rng.integers(0, cfg.codebook_size, (cfg.num_rows - 2, T))
    return p


def test_fused_equals_unfused():
    cfg, token_cfg, params, mimi_cfg, mimi_params = setup()
    settings = GenerationSettings(default_temp=0.0, default_fast_temp=0.0)
    T = 5
    prompt = jnp.asarray(audio_prompt(cfg, token_cfg, T))
    lens = jnp.asarray([T], jnp.int32)

    # Unfused reference path.
    state = init_decode_state(cfg, 1, 64, dtype=jnp.float32)
    mstate = decode_stream_init(mimi_cfg, 1)
    state, out = prefill(params, cfg, token_cfg, settings, state, prompt, lens, jax.random.PRNGKey(1))
    mstate, pcm0 = mimi_decode_step(mimi_params, mimi_cfg, mstate, out.audio_codes[:, :, None])
    ref_pcm = [np.asarray(pcm0)]
    for i in range(3):
        state, out = decode_frame(params, cfg, token_cfg, settings, state, jax.random.PRNGKey(2 + i))
        mstate, pcm = mimi_decode_step(mimi_params, mimi_cfg, mstate, out.audio_codes[:, :, None])
        ref_pcm.append(np.asarray(pcm))

    # Fused per-frame path.
    prefill_step = make_prefill_step(cfg, token_cfg, settings, mimi_cfg)
    stream_step = make_stream_step(cfg, token_cfg, settings, mimi_cfg)
    state = init_decode_state(cfg, 1, 64, dtype=jnp.float32)
    mstate = decode_stream_init(mimi_cfg, 1)
    state, mstate, _, o = prefill_step(params, mimi_params, state, mstate, prompt, lens, jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(o.pcm), ref_pcm[0], rtol=1e-5, atol=1e-6)
    for i in range(3):
        state, mstate, _, o = stream_step(params, mimi_params, state, mstate, jax.random.PRNGKey(2 + i))
        np.testing.assert_allclose(np.asarray(o.pcm), ref_pcm[1 + i], rtol=1e-5, atol=1e-6)

    # Chunked path: 3 frames in one dispatch after the same prefill.
    chunk_step = make_chunk_step(cfg, token_cfg, settings, mimi_cfg, frames_per_chunk=3)
    state = init_decode_state(cfg, 1, 64, dtype=jnp.float32)
    mstate = decode_stream_init(mimi_cfg, 1)
    state, mstate, _, o = prefill_step(params, mimi_params, state, mstate, prompt, lens, jax.random.PRNGKey(1))
    state, mstate, _, chunk = chunk_step(params, mimi_params, state, mstate, jax.random.PRNGKey(9))
    got = np.asarray(chunk.pcm).reshape(1, 3, -1, 1)
    # Greedy: rng differences don't matter; frames must match the unfused ones.
    for i in range(3):
        np.testing.assert_allclose(got[:, i], ref_pcm[1 + i], rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_smoltts_stream_uses_fused_path(tmp_path):
    from smoltts_tpu import SmolTTS
    from smoltts_tpu.io.checkpoint_interop import save_params
    from smoltts_tpu.tokenizer import save_byte_level_tokenizer

    cfg = tiny_debug_config()
    save_params(init_params(cfg, jax.random.PRNGKey(0)), cfg, tmp_path)
    save_byte_level_tokenizer(tmp_path, cfg.codebook_size)
    tts = SmolTTS(
        tmp_path,
        generation_settings=GenerationSettings(
            default_temp=0.0, default_fast_temp=0.0, max_new_tokens=3
        ),
    )
    tts.codec_config = MimiConfig()
    tts.codec_params = init_mimi_params(tts.codec_config, seed=0)
    chunks = list(tts.stream("Hello"))
    assert 1 <= len(chunks) <= 3
    for c in chunks:
        assert c.size == tts.codec_config.samples_per_frame
