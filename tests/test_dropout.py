"""Unit tests for the RBG dropout-mask path (models/layers.py::dropout_keep).

The rest of the suite runs dropout=0, so key handling, the uint32 threshold,
and jit/remat determinism of the sdpa dropout paths are pinned here on the
CPU tier (ADVICE r3). Reference semantics being matched: attention-prob
dropout after softmax, torch SDPA style (rq_transformer.py:559-566).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smoltts_tpu.models.layers import dropout_keep, sdpa, sdpa_blockwise


def test_keep_rate_statistics():
    for rate in (0.1, 0.5, 0.9):
        keep = dropout_keep(jax.random.PRNGKey(0), rate, (512, 512))
        frac = float(jnp.mean(keep.astype(jnp.float32)))
        # 512*512 draws: binomial std ~ 0.001, allow 5 sigma + generator slack
        assert abs(frac - (1.0 - rate)) < 0.01, (rate, frac)


def test_threshold_edges():
    # rate=0 keeps everything (threshold clamps to 2^32-1, losing only the
    # single all-ones bit pattern); rate ~1 keeps (almost) nothing.
    keep0 = dropout_keep(jax.random.PRNGKey(1), 0.0, (1024,))
    assert float(jnp.mean(keep0.astype(jnp.float32))) > 0.999
    keep1 = dropout_keep(jax.random.PRNGKey(1), 0.999999, (1024,))
    assert float(jnp.mean(keep1.astype(jnp.float32))) < 0.001


def test_deterministic_for_fixed_key():
    a = dropout_keep(jax.random.PRNGKey(7), 0.3, (64, 64))
    b = dropout_keep(jax.random.PRNGKey(7), 0.3, (64, 64))
    assert jnp.array_equal(a, b)
    c = dropout_keep(jax.random.PRNGKey(8), 0.3, (64, 64))
    assert not jnp.array_equal(a, c)
    # jit vs eager draw the same bits (the mask is part of the program
    # semantics — remat recompute must reproduce it).
    d = jax.jit(lambda k: dropout_keep(k, 0.3, (64, 64)))(jax.random.PRNGKey(7))
    assert jnp.array_equal(a, d)


def _qkv(B=2, T=512, H=4, n_kv=2, hd=16, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(ks[0], (B, T, H, hd), jnp.float32)
    k = jax.random.normal(ks[1], (B, T, n_kv, hd), jnp.float32)
    v = jax.random.normal(ks[2], (B, T, n_kv, hd), jnp.float32)
    return q, k, v


def test_sdpa_dropout_under_jit():
    q, k, v = _qkv(T=64)
    rng = jax.random.PRNGKey(3)
    f = jax.jit(
        lambda q, k, v, r: sdpa(
            q, k, v, None, is_causal=True, dropout_rate=0.2, dropout_rng=r
        )
    )
    out1 = f(q, k, v, rng)
    out2 = f(q, k, v, rng)
    assert jnp.array_equal(out1, out2)
    assert np.isfinite(np.asarray(out1)).all()
    # Dropout actually perturbs the output vs the no-dropout path.
    base = sdpa(q, k, v, None, is_causal=True)
    assert not np.allclose(np.asarray(out1), np.asarray(base))


def test_sdpa_blockwise_dropout_jit_and_remat_grad():
    q, k, v = _qkv(T=512)
    rng = jax.random.PRNGKey(5)

    def loss(q, k, v, r):
        out = sdpa_blockwise(q, k, v, dropout_rate=0.1, dropout_rng=r)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    # Forward deterministic under jit for a fixed key.
    f = jax.jit(loss)
    l1, l2 = float(f(q, k, v, rng)), float(f(q, k, v, rng))
    assert l1 == l2
    # Backward runs through the per-q-block jax.checkpoint: the recompute
    # must regenerate the same mask bits (grad finite + deterministic).
    g = jax.jit(jax.grad(loss))
    g1 = g(q, k, v, rng)
    g2 = g(q, k, v, rng)
    assert np.isfinite(np.asarray(g1)).all()
    assert jnp.array_equal(g1, g2)


def test_sdpa_blockwise_dropout_mean_preserving():
    # E[dropout(p)] = p: averaging outputs over many keys approaches the
    # undropped output (inverted-scaling check on the real attention path).
    q, k, v = _qkv(B=1, T=512, H=2, n_kv=2, hd=8)
    base = np.asarray(sdpa_blockwise(q, k, v))
    f = jax.jit(
        lambda r: sdpa_blockwise(q, k, v, dropout_rate=0.3, dropout_rng=r)
    )
    acc = np.zeros_like(base, np.float64)
    N = 24
    for i in range(N):
        acc += np.asarray(f(jax.random.PRNGKey(100 + i)), np.float64)
    err = np.abs(acc / N - base).mean() / (np.abs(base).mean() + 1e-9)
    assert err < 0.15, err


def test_sdpa_dropout_cols_mean_preserving_and_iid():
    """dropout_cols (the frame-folded fast trunk's column-limited keep
    draw, models/layers.py::sdpa): over the VALID (block-diagonal) entries
    the keep distribution must stay iid Bernoulli — E[dropout(p)] = p —
    while bits are drawn for only `n` columns per row instead of F*n."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from smoltts_tpu.models.layers import sdpa

    n, F = 8, 4  # 32-token folded sequence of 4 frames
    T = n * F
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(2, T, 2, 16)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2, T, 2, 16)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(2, T, 2, 16)).astype(np.float32))
    idx = jnp.arange(T)
    blk = idx // n
    mask = (blk[:, None] == blk[None, :]) & (idx[:, None] >= idx[None, :])

    base = np.asarray(sdpa(q, k, v, mask))
    f = jax.jit(
        lambda r: sdpa(
            q, k, v, mask, dropout_rate=0.3, dropout_rng=r, dropout_cols=n
        )
    )
    acc = np.zeros_like(base, np.float64)
    N = 48
    for i in range(N):
        out = np.asarray(f(jax.random.PRNGKey(200 + i)), np.float64)
        assert not np.array_equal(out, base)  # dropout actually engaged
        acc += out
    err = np.abs(acc / N - base).mean() / (np.abs(base).mean() + 1e-9)
    assert err < 0.15, err
