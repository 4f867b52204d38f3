"""Pallas sampling-kernel tests (interpreter mode): exact for degenerate
cases, statistical for the categorical distribution."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from smoltts_tpu.ops.sampling import sample_categorical_pallas


def test_min_p_one_is_greedy():
    """min_p=1.0 keeps only the max logit -> argmax regardless of noise."""
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((4, 256)), jnp.float32)
    seeds = jnp.arange(4, dtype=jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        out = sample_categorical_pallas(logits, seeds, temperature=0.8, min_p=1.0)
    np.testing.assert_array_equal(np.asarray(out), np.argmax(np.asarray(logits), -1))


def test_one_hot_distribution():
    """A near-one-hot distribution samples the hot index."""
    logits = np.full((2, 128), -100.0, np.float32)
    logits[0, 7] = 100.0
    logits[1, 100] = 100.0
    with pltpu.force_tpu_interpret_mode():
        out = sample_categorical_pallas(
            jnp.asarray(logits), jnp.asarray([1, 2], jnp.int32), temperature=1.0
        )
    np.testing.assert_array_equal(np.asarray(out), [7, 100])


@pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="interpret-mode prng_random_bits returns zeros; needs real TPU",
)
def test_categorical_statistics():
    """Empirical frequencies over many seeds track softmax probabilities."""
    logits_row = np.array([2.0, 1.0, 0.0, -1.0] + [-30.0] * 124, np.float32)
    B = 512
    logits = jnp.asarray(np.tile(logits_row, (B, 1)))
    seeds = jnp.arange(B, dtype=jnp.int32) * 7919
    out = np.asarray(sample_categorical_pallas(logits, seeds, temperature=1.0))
    probs = np.exp(logits_row - logits_row.max())
    probs /= probs.sum()
    freq = np.bincount(out, minlength=128) / B
    # Top-4 categories carry ~all mass; match within statistical noise.
    np.testing.assert_allclose(freq[:4], probs[:4], atol=0.08)
    assert freq[4:].sum() < 0.01


def test_min_p_filters_tail():
    """With min_p, indices below the threshold are never sampled."""
    logits_row = np.array([5.0, 4.9, 0.0, -1.0] + [-5.0] * 124, np.float32)
    B = 256
    logits = jnp.asarray(np.tile(logits_row, (B, 1)))
    seeds = jnp.arange(B, dtype=jnp.int32) * 104729
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(
            sample_categorical_pallas(logits, seeds, temperature=1.0, min_p=0.5)
        )
    # threshold = max + log(0.5): keeps 5.0 and 4.9 only
    assert set(np.unique(out)) <= {0, 1}


def test_dispatcher_xla_fallback():
    from smoltts_tpu.ops.sampling import sample_categorical

    logits = jnp.asarray(np.random.default_rng(0).standard_normal((3, 64)), jnp.float32)
    out = sample_categorical(
        logits, jax.random.PRNGKey(0), temperature=0.7, min_p=0.1, use_pallas=False
    )
    assert out.shape == (3,)
    out_greedy = sample_categorical(
        logits, jax.random.PRNGKey(0), temperature=0.0, use_pallas=True
    )
    np.testing.assert_array_equal(np.asarray(out_greedy), np.argmax(np.asarray(logits), -1))
