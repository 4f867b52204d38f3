"""Pallas kernel parity tests (run in interpreter mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from smoltts_tpu.ops.attention import (
    decode_attention_pallas,
    decode_attention_xla,
)


@pytest.mark.parametrize("B,H,n_kv,S,hd", [(2, 8, 4, 64, 64), (3, 12, 4, 128, 64), (1, 8, 8, 32, 64)])
def test_decode_attention_parity(B, H, n_kv, S, hd):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, n_kv, S, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, n_kv, S, hd)), jnp.float32)
    pos = jnp.asarray(rng.integers(0, S, (B,)), jnp.int32)

    ref = decode_attention_xla(q, k, v, pos)
    with pltpu.force_tpu_interpret_mode():
        got = decode_attention_pallas(q, k, v, pos)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_decode_attention_bf16():
    rng = np.random.default_rng(1)
    B, H, n_kv, S, hd = 2, 12, 4, 64, 64
    q = jnp.asarray(rng.standard_normal((B, H, hd)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, n_kv, S, hd)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, n_kv, S, hd)), jnp.bfloat16)
    pos = jnp.asarray([5, 63], jnp.int32)
    ref = decode_attention_xla(q, k, v, pos)
    with pltpu.force_tpu_interpret_mode():
        got = decode_attention_pallas(q, k, v, pos)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), rtol=2e-2, atol=2e-2
    )


def test_pos_zero_attends_only_first():
    """pos=0 must attend exclusively to cache slot 0."""
    B, H, n_kv, S, hd = 1, 4, 2, 16, 64
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.standard_normal((B, H, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, n_kv, S, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, n_kv, S, hd)), jnp.float32)
    pos = jnp.zeros((B,), jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        got = decode_attention_pallas(q, k, v, pos)
    expect = np.asarray(v[:, :, 0]).reshape(B, n_kv, 1, hd)
    expect = np.broadcast_to(expect, (B, n_kv, H // n_kv, hd)).reshape(B, H * hd)
    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-5, atol=1e-5)
