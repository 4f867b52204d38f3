"""Decode-path weight fusion must be BIT-EXACT: fusing SwiGLU w1/w3 into one
w13 dot (and the codec transformer's q/k/v into wqkv) only concatenates
output columns — every output element's reduction is unchanged
(ops/quant.py::fuse_decode_params / fuse_mimi_decode_params)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smoltts_tpu.lm.decode import decode_frame, init_decode_state, prefill
from smoltts_tpu.lm.samplers import GenerationSettings
from smoltts_tpu.models.dual_ar import init_params
from smoltts_tpu.ops.quant import (
    fuse_decode_params,
    fuse_mimi_decode_params,
    quantize_decode_params,
)

from tests.test_decode import audio_prompt, make_cfg, make_token_cfg


def _decode_frames(params, cfg, token_cfg, n_frames=6):
    settings = GenerationSettings(default_temp=0.0, default_fast_temp=0.0)
    state = init_decode_state(cfg, 1, 64, tail_len=16)
    prompt = jnp.asarray(audio_prompt(cfg, token_cfg, 7)[None])
    state, out = prefill(
        params, cfg, token_cfg, settings, state, prompt,
        jnp.array([7], jnp.int32), jax.random.PRNGKey(1),
    )
    frames = [np.asarray(out.tokens)]
    for _ in range(n_frames):
        state, out = decode_frame(
            params, cfg, token_cfg, settings, state, jax.random.PRNGKey(2)
        )
        frames.append(np.asarray(out.tokens))
    return np.stack(frames)


def test_w13_fusion_bit_exact():
    cfg = make_cfg()
    token_cfg = make_token_cfg(cfg)
    params = init_params(cfg, jax.random.PRNGKey(0))
    fused = fuse_decode_params(params)
    assert "w13" in fused["layers"] and "w1" not in fused["layers"]
    # Idempotent.
    assert fuse_decode_params(fused)["layers"] is fused["layers"]
    np.testing.assert_array_equal(
        _decode_frames(params, cfg, token_cfg),
        _decode_frames(fused, cfg, token_cfg),
    )


def test_w13_fusion_int8_bit_exact():
    """Fusion composes with int8 weights in either order, bit-exactly."""
    cfg = make_cfg()
    token_cfg = make_token_cfg(cfg)
    params = init_params(cfg, jax.random.PRNGKey(0))
    q_then_f = fuse_decode_params(quantize_decode_params(params))
    f_then_q = quantize_decode_params(fuse_decode_params(params))
    np.testing.assert_array_equal(
        _decode_frames(q_then_f, cfg, token_cfg),
        _decode_frames(f_then_q, cfg, token_cfg),
    )


@pytest.mark.slow
def test_mimi_wqkv_fusion_bit_exact():
    from smoltts_tpu.codec.mimi import (
        decode_stream_init,
        init_mimi_params,
        mimi_decode,
        mimi_decode_step,
    )
    from tests.test_mimi_parity import small_cfg

    cfg = small_cfg()
    params = init_mimi_params(cfg, seed=2)
    fused = fuse_mimi_decode_params(params)
    assert "wqkv" in fused["decoder_transformer"]["layers"]
    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(0, cfg.codebook_size, (1, cfg.num_quantizers, 6)))

    # Batch mode.
    np.testing.assert_array_equal(
        np.asarray(mimi_decode(params, cfg, codes)),
        np.asarray(mimi_decode(fused, cfg, codes)),
    )

    # Streaming mode.
    def stream(p):
        st = decode_stream_init(cfg, 1, tail_len=16)
        out = []
        for t in range(codes.shape[-1]):
            st, pcm = mimi_decode_step(p, cfg, st, codes[:, :, t : t + 1])
            out.append(np.asarray(pcm))
        return np.concatenate(out, axis=1)

    np.testing.assert_array_equal(stream(params), stream(fused))
