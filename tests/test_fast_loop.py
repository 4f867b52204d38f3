"""Fused fast-micro-loop Pallas kernel vs the XLA loop (interpret mode on
CPU): exact greedy agreement, support gating, and batch padding."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from smoltts_tpu.config import tiny_debug_config
from smoltts_tpu.lm.decode import _fast_micro_loop
from smoltts_tpu.lm.samplers import GenerationSettings
from smoltts_tpu.models.dual_ar import init_params
from smoltts_tpu.ops.fast_loop import fused_fast_micro_loop, supports_fused_fast
from smoltts_tpu.ops.quant import quantize_decode_params

CB = 64


def setup(**kw):
    cfg = tiny_debug_config(codebook_size=CB, vocab_size=256 + 64 + CB, **kw)
    params = quantize_decode_params(
        init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    )
    return cfg, params


def test_supports_gating():
    cfg, params = setup()
    assert supports_fused_fast(cfg, params)
    # dense params -> fall back to the XLA loop
    dense = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    assert not supports_fused_fast(cfg, dense)
    cfg2, params2 = setup(duplicate_code_0=False)
    assert not supports_fused_fast(cfg2, params2)


@pytest.mark.parametrize(
    "B",
    # one size in the fast tier; the redundant batched sizes ride the slow
    # tier (each param costs ~18-25 s of CPU-tier compile; batched coverage
    # also comes from test_greedy_matches_through_many_hiddens)
    [1, pytest.param(4, marks=pytest.mark.slow),
     pytest.param(8, marks=pytest.mark.slow)],
)
def test_greedy_matches_xla_loop(B):
    cfg, params = setup()
    settings = GenerationSettings(default_temp=0.0, default_fast_temp=0.0)
    hidden = jax.random.normal(jax.random.PRNGKey(1 + B), (B, cfg.dim), jnp.float32)
    ref = np.asarray(_fast_micro_loop(params, cfg, hidden, jax.random.PRNGKey(2), settings))
    got = np.asarray(
        fused_fast_micro_loop(
            params, cfg, hidden, jax.random.PRNGKey(2), settings, interpret=True
        )
    )
    np.testing.assert_array_equal(ref, got)


@pytest.mark.slow
def test_w13_fused_tree_matches_unfused():
    """The bench/engine path fuses w1/w3 -> w13 before quantizing; the kernel
    splits the fused weight back into exact w1/w3 views."""
    from smoltts_tpu.ops.quant import fuse_decode_params

    cfg, params = setup()
    fused = quantize_decode_params(
        fuse_decode_params(init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32))
    )
    assert supports_fused_fast(cfg, fused)
    settings = GenerationSettings(default_temp=0.0, default_fast_temp=0.0)
    hidden = jax.random.normal(jax.random.PRNGKey(5), (4, cfg.dim), jnp.float32)
    ref = np.asarray(
        fused_fast_micro_loop(
            params, cfg, hidden, jax.random.PRNGKey(2), settings, interpret=True
        )
    )
    got = np.asarray(
        fused_fast_micro_loop(
            fused, cfg, hidden, jax.random.PRNGKey(2), settings, interpret=True
        )
    )
    np.testing.assert_array_equal(ref, got)


def test_greedy_matches_through_many_hiddens():
    """A batch of diverse hidden states: every level of every row agrees."""
    cfg, params = setup()
    settings = GenerationSettings(default_temp=0.0, default_fast_temp=0.0)
    rng = np.random.default_rng(0)
    hidden = jnp.asarray(rng.standard_normal((16, cfg.dim)) * 2.0, jnp.float32)
    ref = np.asarray(_fast_micro_loop(params, cfg, hidden, jax.random.PRNGKey(3), settings))
    got = np.asarray(
        fused_fast_micro_loop(
            params, cfg, hidden, jax.random.PRNGKey(3), settings, interpret=True
        )
    )
    assert (ref == got).all()
