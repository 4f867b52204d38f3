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


@pytest.mark.slow
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


def test_sdpa_blockwise_matches_eager():
    """Blockwise online-softmax attention == eager SDPA (fp32, causal), and
    their gradients agree."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from smoltts_tpu.models.layers import sdpa, sdpa_blockwise

    B, T, H, n_kv, hd = 2, 768, 6, 2, 32
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, T, H, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, T, n_kv, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, T, n_kv, hd)), jnp.float32)

    ref = sdpa(q, k, v, None, is_causal=True)  # routes to blockwise at T=768
    eager = sdpa(q[:, :256], k[:, :256], v[:, :256], None, is_causal=True)
    # cross-check the router: short seq goes eager; recompute full eager inline
    def eager_full(q, k, v):
        g = H // n_kv
        qg = q.reshape(B, T, n_kv, g, hd)
        logits = jnp.einsum("bqhgd,bkhd->bhgqk", qg, k).astype(jnp.float32) * hd**-0.5
        causal = jnp.tril(jnp.ones((T, T), bool))
        logits = jnp.where(causal, logits, -jnp.inf)
        p = jax.nn.softmax(logits, axis=-1)
        return jnp.einsum("bhgqk,bkhd->bqhgd", p, v).reshape(B, T, H * hd)

    full = eager_full(q, k, v)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(full), rtol=2e-5, atol=2e-5)

    def loss_block(q, k, v):
        return jnp.sum(sdpa_blockwise(q, k, v) ** 2)

    def loss_eager(q, k, v):
        return jnp.sum(eager_full(q, k, v) ** 2)

    g1 = jax.grad(loss_block, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_eager, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4)


def test_sdpa_blockwise_dropout_statistics():
    """Prob-dropout in the blockwise path keeps the expected output scale
    and is deterministic in the rng."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from smoltts_tpu.models.layers import sdpa_blockwise

    B, T, H, n_kv, hd = 2, 512, 4, 2, 32
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((B, T, H, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, T, n_kv, hd)), jnp.float32)
    v = jnp.asarray(np.abs(rng.standard_normal((B, T, n_kv, hd))), jnp.float32)

    base = np.asarray(sdpa_blockwise(q, k, v))
    key = jax.random.PRNGKey(0)
    d1 = np.asarray(sdpa_blockwise(q, k, v, dropout_rate=0.1, dropout_rng=key))
    d2 = np.asarray(sdpa_blockwise(q, k, v, dropout_rate=0.1, dropout_rng=key))
    np.testing.assert_array_equal(d1, d2)  # deterministic in rng
    # E[dropped] == base; average over everything should agree within ~1%
    assert abs(d1.mean() - base.mean()) / abs(base.mean()) < 0.02


def test_fast_fold_parity(monkeypatch):
    """Block-diagonal frame folding (models/dual_ar.py::run_fast_trunk) is
    numerically identical to the unfolded per-frame fast trunk: each token
    attends only within its own frame, so softmax rows are unchanged.
    The fold exists because [N, h, 8, 8] attention tensors pad their minor
    dim 8 -> 128 on TPU (16x HBM-traffic expansion; PERF.md step anatomy)."""
    cfg = tiny_debug_config(codebook_size=32, vocab_size=352)
    params = init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    # B*T = 2*24 = 48: divisible by 16 -> fold engages at F=16.
    tokens = jnp.asarray(rng.integers(0, 32, (2, cfg.num_rows, 24)).astype(np.int32))

    monkeypatch.setenv("SMOLTTS_FAST_FOLD", "1")
    ref = forward_train(params, cfg, tokens)
    monkeypatch.setenv("SMOLTTS_FAST_FOLD", "16")
    folded = forward_train(params, cfg, tokens)

    np.testing.assert_allclose(
        np.asarray(folded.codebook_logits, np.float32),
        np.asarray(ref.codebook_logits, np.float32),
        rtol=2e-2, atol=2e-2,
    )
    # Mean abs deviation must be at bf16 rounding scale, not structural.
    diff = np.abs(
        np.asarray(folded.codebook_logits, np.float32)
        - np.asarray(ref.codebook_logits, np.float32)
    )
    assert diff.mean() < 1e-3
