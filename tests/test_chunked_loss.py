"""The fused time-chunked fast-trunk loss (train/loss.py::forward_train_loss)
must reproduce the dense path's losses AND gradients exactly (same math,
fp32 CE accumulation; only the reduction order differs)."""

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

from smoltts_tpu.config import tiny_debug_config
from smoltts_tpu.models.dual_ar import forward_train, init_params
from smoltts_tpu.tokenizer import TokenConfig
from smoltts_tpu.train.data import collate, synthetic_dataset
from smoltts_tpu.train.loss import compute_losses, forward_train_loss

B, T = 2, 16


def _setup(**cfg_overrides):
    cfg = tiny_debug_config(**cfg_overrides)
    token_cfg = TokenConfig.smoltts_v0(codebook_size=cfg.codebook_size)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    rows = synthetic_dataset(B, cfg, token_cfg, seq_len=T, seed=0)
    batch = collate(
        [r["ground_truth"] for r in rows], token_cfg.pad_id, max_len=T,
        duplicate_code_0=cfg.duplicate_code_0, num_codebooks=cfg.num_codebooks,
    )
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    return cfg, params, batch


def _dense_losses(params, cfg, batch):
    out = forward_train(params, cfg, batch["tokens"], train=False)
    return compute_losses(
        out.token_logits, out.codebook_logits, batch["labels"], per_codebook=True
    )


@pytest.mark.parametrize("chunk_t", [4, 8, 16])
def test_losses_match_dense(chunk_t):
    cfg, params, batch = _setup()
    ref = _dense_losses(params, cfg, batch)
    got = forward_train_loss(
        params, cfg, batch["tokens"], batch["labels"],
        train=False, chunk_t=chunk_t, per_codebook=True,
    )
    np.testing.assert_allclose(float(got.total), float(ref.total), rtol=1e-6)
    np.testing.assert_allclose(float(got.base), float(ref.base), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(got.per_codebook), np.asarray(ref.per_codebook), rtol=1e-5
    )


def test_gradients_match_dense():
    cfg, params, batch = _setup()

    def dense(p):
        return _dense_losses(p, cfg, batch).total

    def chunked(p):
        return forward_train_loss(
            p, cfg, batch["tokens"], batch["labels"], train=False, chunk_t=4
        ).total

    g_ref = jax.grad(dense)(params)
    g_got = jax.grad(chunked)(params)
    flat_ref, _ = jax.flatten_util.ravel_pytree(g_ref)
    flat_got, _ = jax.flatten_util.ravel_pytree(g_got)
    np.testing.assert_allclose(
        np.asarray(flat_got), np.asarray(flat_ref), rtol=1e-4, atol=1e-7
    )


def test_remat_train_path_runs_and_matches():
    # With remat on (the production recipe) the chunk bodies recompute in
    # backward; dropout 0 so the dense comparison stays exact.
    cfg, params, batch = _setup(use_gradient_checkpointing=True, dropout=0.0)

    def chunked(p):
        return forward_train_loss(
            p, cfg, batch["tokens"], batch["labels"], train=True, chunk_t=4,
            dropout_rng=jax.random.PRNGKey(1),
        ).total

    def dense(p):
        out = forward_train(
            p, cfg, batch["tokens"], train=True, dropout_rng=jax.random.PRNGKey(1)
        )
        return compute_losses(out.token_logits, out.codebook_logits, batch["labels"]).total

    v_got, g_got = jax.jit(jax.value_and_grad(chunked))(params)
    v_ref, g_ref = jax.jit(jax.value_and_grad(dense))(params)
    np.testing.assert_allclose(float(v_got), float(v_ref), rtol=1e-6)
    flat_ref, _ = jax.flatten_util.ravel_pytree(g_ref)
    flat_got, _ = jax.flatten_util.ravel_pytree(g_got)
    np.testing.assert_allclose(
        np.asarray(flat_got), np.asarray(flat_ref), rtol=1e-4, atol=1e-7
    )


def test_trainer_integration_fast_chunk_t():
    from smoltts_tpu.config import TrainingConfig
    from smoltts_tpu.train.trainer import init_train_state, make_train_step

    cfg, params, batch = _setup(use_gradient_checkpointing=True, dropout=0.0)
    state0, tx = init_train_state(params, TrainingConfig(fast_chunk_t=0))
    step0 = make_train_step(cfg, TrainingConfig(fast_chunk_t=0), tx, donate=False)
    _, m0 = step0(state0, batch, jax.random.PRNGKey(2))
    state1, tx1 = init_train_state(params, TrainingConfig(fast_chunk_t=4))
    step1 = make_train_step(cfg, TrainingConfig(fast_chunk_t=4), tx1, donate=False)
    _, m1 = step1(state1, batch, jax.random.PRNGKey(2))
    np.testing.assert_allclose(float(m1["loss"]), float(m0["loss"]), rtol=1e-6)
    np.testing.assert_allclose(
        float(m1["grad_norm"]), float(m0["grad_norm"]), rtol=1e-4
    )
