"""End-to-end training-recipe parity: 50 optimizer steps of our optax trainer
vs the reference torch trainer on identical init and data.

This pins the whole recipe at once — AdamW decay partition (including the
embeddings-are-decayed subtlety, see smoltts_tpu/train/optim.py:decay_mask),
warmup schedule phase, global-norm clipping, loss masking, and the forward —
the validation SURVEY.md §7.7 prescribes. The torch side uses the reference's
own optimizer/scheduler factories (/root/reference/train/optim.py:26-74) and
its loss formula (/root/reference/train/trainer.py:25-60: base CE on row-0
labels + CE over flattened codebook levels, ignore_index=-100); the training
loop step order is trainer.py:205-218 (backward -> clip -> step -> sched).
"""

import os

os.environ.setdefault("TORCHDYNAMO_DISABLE", "1")

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.reference_oracle import (
    import_reference_modeling,
    make_hf_byte_tokenizer,
    requires_reference,
    torch_state_to_numpy,
)
from tests.test_cross_impl_generation import build_torch_oracle, lm_config

from smoltts_tpu.config import ModelType, TrainingConfig
from smoltts_tpu.io.checkpoint_interop import params_from_state_dict
from smoltts_tpu.tokenizer import ByteTokenizer, TokenConfig
from smoltts_tpu.train.data import batch_iterator, synthetic_dataset
from smoltts_tpu.train.trainer import init_train_state, make_train_step

STEPS = 50
HPARAMS = dict(
    learning_rate=1e-3,
    lr_start=1e-4,
    lr_warmup_steps=10,
    weight_decay=0.01,
    betas=(0.9, 0.95),
    eps=1e-8,
    gradient_clip=1.0,
)


def make_batches(cfg, token_cfg, n, batch_size=4, max_len=48):
    ds = synthetic_dataset(64, cfg, token_cfg, seq_len=40, seed=0)
    it = batch_iterator(
        ds, batch_size=batch_size, semantic_pad_id=token_cfg.pad_id,
        max_len=max_len, duplicate_code_0=cfg.duplicate_code_0,
        num_codebooks=cfg.num_codebooks, seed=1, epochs=100,
    )
    return [next(it) for _ in range(n)]


def torch_trajectory(cfg, oracle, batches):
    import sys

    import torch

    sys.path.insert(0, "/root/reference")
    from train.config import TrainingConfig as RefTC  # type: ignore
    from train.optim import setup_training  # type: ignore

    ref_tc = RefTC(
        project_name="t", checkpoint_path="/tmp/t", model_path="t",
        dataset_path="t", init_folder="t", batch_size=4, max_epochs=1,
        num_workers=0, accumulate_steps=1, val_every_n_steps=10**9,
        save_every_n_steps=10**9, max_sequence_length=48, use_bf16=False,
        **HPARAMS,
    )
    model = oracle.train()
    opt, sched = setup_training(model, ref_tc)

    losses, lrs = [], []
    for b in batches:
        tokens = torch.from_numpy(b["tokens"].astype(np.int64))
        labels = torch.from_numpy(b["labels"].astype(np.int64))
        pad_mask = torch.from_numpy(b["pad_mask"])
        opt.zero_grad()
        out = model(inp=tokens, key_padding_mask=pad_mask)
        base = torch.nn.functional.cross_entropy(
            out.token_logits.reshape(-1, out.token_logits.size(-1)),
            labels[:, 0, :].reshape(-1),
            ignore_index=-100,
        )
        cb_logits = out.codebook_logits  # [B, T, N, CB]
        cb_labels = labels[:, 1:, :].permute(0, 2, 1)  # [B, T, N]
        semantic = torch.nn.functional.cross_entropy(
            cb_logits.reshape(-1, cb_logits.size(-1)),
            cb_labels.reshape(-1),
            ignore_index=-100,
        )
        loss = base + semantic
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), ref_tc.gradient_clip)
        opt.step()
        sched.step()
        losses.append(float(loss))
        lrs.append(float(opt.param_groups[0]["lr"]))
    return losses, lrs, torch_state_to_numpy(model)


def jax_trajectory(cfg, params, batches):
    tc = TrainingConfig(batch_size=4, accumulate_steps=1, use_bf16=False, **HPARAMS)
    state, tx = init_train_state(params, tc)
    step_fn = make_train_step(cfg, tc, tx)
    rng = jax.random.PRNGKey(0)  # dropout is 0; the key is inert
    losses = []
    for b in batches:
        batch = {k: jnp.asarray(v) for k, v in b.items()}
        rng, sub = jax.random.split(rng)
        state, metrics = step_fn(state, batch, sub)
        losses.append(float(metrics["loss"]))
    return losses, state.params


@requires_reference
@pytest.mark.slow
def test_fifty_step_trajectory_matches_torch():
    import torch

    cfg = lm_config()  # tiny dims, full feature surface, grad ckpt off
    token_cfg = TokenConfig.from_tokenizer(
        ModelType.smoltts_v0(), ByteTokenizer(cfg.codebook_size), cfg
    )
    oracle = build_torch_oracle(cfg, seed=0)
    params = params_from_state_dict(torch_state_to_numpy(oracle), cfg)
    batches = make_batches(cfg, token_cfg, STEPS)

    ref_losses, ref_lrs, ref_final = torch_trajectory(cfg, oracle, batches)
    our_losses, our_params = jax_trajectory(cfg, params, batches)

    # Warmup phase must line up exactly: lr at step k is
    # lr_start + (lr - lr_start) * k / warmup, constant after.
    expect_lr = [
        HPARAMS["lr_start"]
        + (HPARAMS["learning_rate"] - HPARAMS["lr_start"])
        * min(k / HPARAMS["lr_warmup_steps"], 1.0)
        for k in range(1, STEPS + 1)
    ]
    np.testing.assert_allclose(ref_lrs, expect_lr, rtol=1e-6)

    # Early steps are near-bitwise; 50 steps of fp32 drift stay within 0.2%.
    np.testing.assert_allclose(our_losses[:5], ref_losses[:5], rtol=1e-4)
    np.testing.assert_allclose(our_losses, ref_losses, rtol=2e-3)

    final = params_from_state_dict(ref_final, cfg)
    for key in ["embeddings", "norm", "fast_output"]:
        np.testing.assert_allclose(
            np.asarray(our_params[key]), final[key], rtol=3e-3, atol=3e-5,
            err_msg=f"param {key} diverged",
        )
    np.testing.assert_allclose(
        np.asarray(our_params["layers"]["wqkv"]), final["layers"]["wqkv"],
        rtol=3e-3, atol=3e-5,
    )
