"""Training-stack tests: loss parity vs torch CE, collation semantics vs the
reference collate_fn, optimizer schedule, and a short loss-goes-down run on
synthetic data, plus a sharded (DP x TP) step on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smoltts_tpu.config import TrainingConfig, tiny_debug_config
from smoltts_tpu.models.dual_ar import forward_train, init_params
from smoltts_tpu.tokenizer import TokenConfig
from smoltts_tpu.train.data import IGNORE_INDEX, batch_iterator, collate, synthetic_dataset
from smoltts_tpu.train.loss import compute_losses, masked_cross_entropy
from smoltts_tpu.train.optim import decay_mask, lr_schedule
from smoltts_tpu.train.trainer import init_train_state, make_train_step, validate, make_eval_step


def make_cfg(**kw):
    return tiny_debug_config(codebook_size=32, vocab_size=256 + 64 + 32, **kw)


def test_masked_ce_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((4, 7, 11)).astype(np.float32)
    labels = rng.integers(0, 11, (4, 7))
    labels[0, :3] = -100
    ours = float(masked_cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    ref = torch.nn.functional.cross_entropy(
        torch.from_numpy(logits).view(-1, 11),
        torch.from_numpy(labels).view(-1),
        ignore_index=-100,
    )
    np.testing.assert_allclose(ours, float(ref), rtol=1e-5)


def test_collate_matches_reference_semantics():
    cfg = make_cfg()
    token_cfg = TokenConfig.smoltts_v0(cfg.codebook_size)
    gt = np.zeros((cfg.num_rows, 10), np.int32)
    gt[0] = np.arange(10) + 1
    gt[1] = [0, 0, 5, 6, 0, 3, 0, 0, 9, 2]
    gt[2:] = 7
    batch = collate([gt], semantic_pad_id=token_cfg.pad_id, max_len=16)
    tokens, labels = batch["tokens"], batch["labels"]
    # input = gt[:, :-1], labels = gt[:, 1:]
    np.testing.assert_array_equal(tokens[0, 0, :9], gt[0, :9])
    np.testing.assert_array_equal(labels[0, 0, :9], gt[0, 1:])
    # codebook labels masked where the shifted row is 0 (text-only)
    assert labels[0, 1, 0] == IGNORE_INDEX  # gt[1,1] == 0
    assert labels[0, 1, 1] == 5  # gt[1,2] == 5
    # padding: token row0 = pad_id, labels = -100, pad_mask True
    assert tokens[0, 0, 9] == token_cfg.pad_id
    assert (labels[0, :, 9:] == IGNORE_INDEX).all()
    assert batch["pad_mask"][0, 9:].all() and not batch["pad_mask"][0, :9].any()


def test_lr_schedule():
    tc = TrainingConfig(lr_start=1e-3, learning_rate=5e-4, lr_warmup_steps=100)
    sched = lr_schedule(tc)
    np.testing.assert_allclose(float(sched(0)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(sched(50)), 7.5e-4, rtol=1e-6)
    np.testing.assert_allclose(float(sched(100)), 5e-4, rtol=1e-6)
    np.testing.assert_allclose(float(sched(1000)), 5e-4, rtol=1e-6)


def test_decay_mask_partition():
    cfg = make_cfg()
    params = init_params(cfg, jax.random.PRNGKey(0))
    mask = decay_mask(params)
    assert mask["layers"]["wqkv"] is True
    assert mask["layers"]["attention_norm"] is False
    # Embedding tables ARE decayed — the reference's ".embeddings." exemption
    # never matches its real parameter names (see optim.decay_mask docstring).
    assert mask["embeddings"] is True
    assert mask["fast_embeddings"] is True
    assert mask["norm"] is False
    assert mask["fast_output"] is True


def test_loss_decreases_on_synthetic():
    cfg = make_cfg(use_gradient_checkpointing=True, dropout=0.0)
    token_cfg = TokenConfig.smoltts_v0(cfg.codebook_size)
    params = init_params(cfg, jax.random.PRNGKey(0))
    tc = TrainingConfig(
        batch_size=4, accumulate_steps=1, learning_rate=3e-3, lr_start=3e-3,
        lr_warmup_steps=1, gradient_clip=1.0, weight_decay=0.01,
    )
    state, tx = init_train_state(params, tc)
    step = make_train_step(cfg, tc, tx)
    ds = synthetic_dataset(4, cfg, token_cfg, seq_len=32, seed=0)
    batch = collate(
        [r["ground_truth"] for r in ds], token_cfg.pad_id, max_len=32,
        duplicate_code_0=cfg.duplicate_code_0, num_codebooks=cfg.num_codebooks,
    )
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    losses = []
    rng = jax.random.PRNGKey(1)
    for i in range(30):
        rng, sub = jax.random.split(rng)
        state, m = step(state, batch, sub)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.8, losses[::10]
    assert np.isfinite(losses).all()


def test_grad_accumulation_equivalence():
    """accumulate_steps=2 over two microbatches == one step on the merged
    batch (same grads; dropout off)."""
    cfg = make_cfg(dropout=0.0)
    token_cfg = TokenConfig.smoltts_v0(cfg.codebook_size)
    params = init_params(cfg, jax.random.PRNGKey(0))
    tc1 = TrainingConfig(accumulate_steps=1, gradient_clip=0.0, lr_start=1e-3, learning_rate=1e-3)
    tc2 = TrainingConfig(accumulate_steps=2, gradient_clip=0.0, lr_start=1e-3, learning_rate=1e-3)

    ds = synthetic_dataset(4, cfg, token_cfg, seq_len=24, seed=2)
    rows = [r["ground_truth"] for r in ds]
    big = collate(rows, token_cfg.pad_id, max_len=24)
    micro = {k: v.reshape(2, 2, *v.shape[1:]) for k, v in big.items()}

    state1, tx1 = init_train_state(params, tc1)
    state2, tx2 = init_train_state(params, tc2)
    s1, m1 = make_train_step(cfg, tc1, tx1, donate=False)(
        state1, {k: jnp.asarray(v) for k, v in big.items()}, jax.random.PRNGKey(3)
    )
    s2, m2 = make_train_step(cfg, tc2, tx2, accumulate_steps=2, donate=False)(
        state2, {k: jnp.asarray(v) for k, v in micro.items()}, jax.random.PRNGKey(3)
    )
    # Not bit-identical (mean-of-means vs global mean with unequal mask
    # counts), but must be close on balanced synthetic batches.
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0.1, atol=2e-3)


def test_validate_and_iterator():
    cfg = make_cfg(dropout=0.0)
    token_cfg = TokenConfig.smoltts_v0(cfg.codebook_size)
    params = init_params(cfg, jax.random.PRNGKey(0))
    ds = synthetic_dataset(8, cfg, token_cfg, seq_len=24, seed=1)
    batches = list(
        batch_iterator(ds, batch_size=2, semantic_pad_id=token_cfg.pad_id, max_len=24)
    )
    assert len(batches) == 4
    jb = [{k: jnp.asarray(v) for k, v in b.items()} for b in batches[:2]]
    metrics = validate(params, cfg, jb, make_eval_step(cfg))
    assert "loss" in metrics and np.isfinite(metrics["loss"])
    assert f"codebook_{cfg.max_fast_seqlen}_loss" in metrics


def test_sharded_train_step():
    """DP x TP train step on the 8-device CPU mesh (SURVEY.md §4)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from smoltts_tpu.parallel.mesh import make_mesh, param_shardings

    cfg = make_cfg(
        dim=64, n_head=4, n_local_heads=2, fast_dim=64, fast_n_head=4,
        fast_n_local_heads=2, dropout=0.0,
    )
    token_cfg = TokenConfig.smoltts_v0(cfg.codebook_size)
    mesh = make_mesh(4, 2)
    params = init_params(cfg, jax.random.PRNGKey(0))
    params = jax.tree.map(jax.device_put, params, param_shardings(mesh, params))
    tc = TrainingConfig(gradient_clip=1.0)
    state, tx = init_train_state(params, tc)
    step = make_train_step(cfg, tc, tx, donate=False)

    ds = synthetic_dataset(8, cfg, token_cfg, seq_len=24, seed=3)
    batch = collate([r["ground_truth"] for r in ds], token_cfg.pad_id, max_len=24)
    bsh = NamedSharding(mesh, P("data"))
    batch = {k: jax.device_put(jnp.asarray(v), bsh) for k, v in batch.items()}
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    # Params stay TP-sharded after the update.
    wqkv_sh = state.params["layers"]["wqkv"].sharding
    assert "model" in str(wqkv_sh.spec)


def test_sequence_parallel_forward():
    """Sequence-axis activation sharding produces identical outputs (GSPMD
    inserts the attention collectives)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from smoltts_tpu.parallel.mesh import make_mesh

    cfg = make_cfg(dropout=0.0)
    token_cfg = TokenConfig.smoltts_v0(cfg.codebook_size)
    params = init_params(cfg, jax.random.PRNGKey(0))
    ds = synthetic_dataset(2, cfg, token_cfg, seq_len=32, seed=4)
    batch = collate([r["ground_truth"] for r in ds], token_cfg.pad_id, max_len=32)
    tokens = jnp.asarray(batch["tokens"])

    ref = forward_train(params, cfg, tokens)

    mesh = make_mesh(2, 4)  # axes ('data', 'model'); use 'model' as seq axis
    seq_sh = NamedSharding(mesh, P("data", "model", None))
    sharded = jax.jit(
        lambda p, t: forward_train(p, cfg, t, activation_sharding=seq_sh)
    )(params, jax.device_put(tokens, NamedSharding(mesh, P("data"))))
    np.testing.assert_allclose(
        np.asarray(sharded.token_logits), np.asarray(ref.token_logits), rtol=2e-5, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(sharded.codebook_logits), np.asarray(ref.codebook_logits), rtol=2e-5, atol=2e-5
    )
