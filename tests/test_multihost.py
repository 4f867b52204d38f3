"""Multihost (jax.distributed) validation on CPU: 2 processes x 4 virtual
devices run the real DP x TP training step (tests/multihost_worker.py) and
must match a single-process 8-device run of the same global computation —
same data order, same init — loss-for-loss and parameter-for-parameter
(through the multihost Orbax checkpoint).

This is the SURVEY §2.7-item-1 / BASELINE configs 4-5 entry the reference
never had (its trainer is single-GPU, /root/reference/train/main.py:28).
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from smoltts_tpu.config import ModelType, TrainingConfig, tiny_debug_config
from smoltts_tpu.models.dual_ar import init_params
from smoltts_tpu.parallel.mesh import make_mesh, param_shardings
from smoltts_tpu.tokenizer import ByteTokenizer, TokenConfig
from smoltts_tpu.train.checkpoint import CheckpointManager
from smoltts_tpu.train.data import batch_iterator, synthetic_dataset
from smoltts_tpu.train.trainer import init_train_state, make_train_step

STEPS, GLOBAL_BATCH = 3, 4


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def single_process_reference(tmp_path):
    """The same global run on this process's 8 virtual devices (conftest)."""
    cfg = tiny_debug_config(codebook_size=32, vocab_size=256 + 64 + 32)
    tok = ByteTokenizer(cfg.codebook_size)
    token_cfg = TokenConfig.from_tokenizer(ModelType.smoltts_v0(), tok, cfg)
    tc = TrainingConfig(learning_rate=1e-3, accumulate_steps=1, use_bf16=False)

    mesh = make_mesh(4, 2)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=np.float32)
    params = jax.tree.map(jax.device_put, params, param_shardings(mesh, params))
    state, tx = init_train_state(params, tc)
    step_fn = make_train_step(cfg, tc, tx)

    dataset = synthetic_dataset(64, cfg, token_cfg, seq_len=48, seed=0)
    batch_sh = NamedSharding(mesh, P("data"))
    it = batch_iterator(
        dataset, batch_size=GLOBAL_BATCH, semantic_pad_id=token_cfg.pad_id,
        max_len=48, duplicate_code_0=cfg.duplicate_code_0,
        num_codebooks=cfg.num_codebooks, seed=1, epochs=10,
    )
    rng = jax.random.PRNGKey(7)
    losses = []
    for _ in range(STEPS):
        batch = {k: jax.device_put(v, batch_sh) for k, v in next(it).items()}
        rng, sub = jax.random.split(rng)
        state, metrics = step_fn(state, batch, sub)
        losses.append(float(metrics["loss"]))
    return losses, jax.tree.map(np.asarray, state.params)


@pytest.mark.slow
def test_two_process_run_matches_single_process(tmp_path):
    port = _free_port()
    out = tmp_path / "mh"
    out.mkdir()
    worker = Path(__file__).parent / "multihost_worker.py"
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_PLATFORMS", None)

    procs = [
        subprocess.Popen(
            [
                sys.executable, str(worker),
                "--process-id", str(i), "--num-processes", "2",
                "--port", str(port), "--out", str(out),
                "--steps", str(STEPS), "--global-batch", str(GLOBAL_BATCH),
            ],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    logs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for i, (p, log) in enumerate(zip(procs, logs)):
        assert p.returncode == 0, f"worker {i} failed:\n{log[-4000:]}"

    with open(out / "losses.json") as f:
        mh = json.load(f)
    assert mh["mesh"] == {"data": 4, "model": 2}

    ref_losses, ref_params = single_process_reference(tmp_path)
    np.testing.assert_allclose(mh["losses"], ref_losses, rtol=2e-5, atol=2e-6)

    # The multihost Orbax checkpoint restores on a single process and matches
    # the single-process trajectory's final parameters.
    tc = TrainingConfig(learning_rate=1e-3, accumulate_steps=1, use_bf16=False)
    step_dir = CheckpointManager.latest_step_dir(out / "mh_run")
    ckpt, step, reinit = CheckpointManager.load(step_dir, tc)
    assert step == STEPS and not reinit
    flat_got = jax.tree.leaves(jax.tree.map(np.asarray, ckpt["params"]))
    flat_ref = jax.tree.leaves(ref_params)
    assert len(flat_got) == len(flat_ref)
    for g, r in zip(flat_got, flat_ref):
        np.testing.assert_allclose(g, r, rtol=2e-5, atol=2e-6)


@pytest.mark.slow
def test_two_process_sharded_serving_matches_single_controller(tmp_path):
    """Engine-side multihost smoke (VERDICT r2 item 8): the fused sharded
    decode+vocode pipeline (streams over the cross-process `data` axis, TP
    over `model`) runs in 2 real jax.distributed processes and emits exactly
    the frames/PCM of the single-controller 8-device run."""
    from tests.test_parallel_serving import _run, _setup

    port = _free_port()
    out = tmp_path / "mhs"
    out.mkdir()
    worker = Path(__file__).parent / "multihost_serving_worker.py"
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_PLATFORMS", None)

    procs = [
        subprocess.Popen(
            [
                sys.executable, str(worker),
                "--process-id", str(i), "--num-processes", "2",
                "--port", str(port), "--out", str(out),
            ],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    logs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for i, (p, log) in enumerate(zip(procs, logs)):
        assert p.returncode == 0, f"serving worker {i} failed:\n{log[-4000:]}"

    z = np.load(out / "serving.npz")
    assert int(z["mesh_data"]) == 4 and int(z["mesh_model"]) == 2

    ref_frames, ref_pcm = _run(*_setup())
    np.testing.assert_array_equal(z["frames"], ref_frames)
    np.testing.assert_allclose(z["pcm"], ref_pcm, rtol=1e-5, atol=1e-5)
