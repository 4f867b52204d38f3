"""Shape/feature-surface tests for configurations the oracle can't cover
(the reference's non-depthwise training path is broken upstream; see
tests/test_dual_ar_parity.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smoltts_tpu.config import tiny_debug_config
from smoltts_tpu.models.dual_ar import forward_train, init_params


@pytest.mark.parametrize("duplicate_code_0", [True, False])
@pytest.mark.parametrize("depthwise", [True, False])
@pytest.mark.parametrize("tie", [True, False])
def test_forward_shapes(duplicate_code_0, depthwise, tie):
    cfg = tiny_debug_config(
        duplicate_code_0=duplicate_code_0,
        depthwise_wte=depthwise,
        depthwise_output=depthwise,
        tie_word_embeddings=tie,
        codebook_size=32,
        vocab_size=256 + 64 + 32,
    )
    params = init_params(cfg, jax.random.PRNGKey(0))
    B, T = 2, 6
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 32, (B, cfg.num_rows, T)).astype(np.int32)
    out = forward_train(params, cfg, jnp.asarray(tokens))
    assert out.token_logits.shape == (B, T, cfg.vocab_size)
    assert out.codebook_logits.shape == (B, T, cfg.max_fast_seqlen, cfg.codebook_size)
    assert out.hidden_states.shape == (B, T, cfg.dim)
    assert np.isfinite(np.asarray(out.token_logits)).all()
    assert np.isfinite(np.asarray(out.codebook_logits)).all()


def test_grad_checkpointing_matches():
    cfg = tiny_debug_config(codebook_size=32, vocab_size=352)
    params = init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, 32, (1, cfg.num_rows, 5)).astype(np.int32))

    cfg_ckpt = cfg.model_copy(update=dict(use_gradient_checkpointing=True))

    def loss(p, c):
        out = forward_train(p, c, tokens, train=True, dropout_rng=None)
        return out.token_logits.sum() + out.codebook_logits.sum()

    g1 = jax.grad(loss)(params, cfg)
    g2 = jax.grad(loss)(params, cfg_ckpt)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)
