"""Scale-out & ops loose ends: sequence-parallel training wired through the
trainer config, preemption auto-resume (restart-from-latest), and the HF-hub
model_id resolution path (stubbed; this environment has no network)."""

import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from smoltts_tpu.config import ModelType, TrainingConfig, tiny_debug_config
from smoltts_tpu.models.dual_ar import init_params
from smoltts_tpu.parallel.mesh import make_mesh, param_shardings
from smoltts_tpu.tokenizer import TokenConfig
from smoltts_tpu.train.checkpoint import CheckpointManager
from smoltts_tpu.train.data import collate, synthetic_dataset
from smoltts_tpu.train.trainer import init_train_state, make_train_step


def make_cfg():
    return tiny_debug_config(
        codebook_size=32, vocab_size=352, n_head=4, n_local_heads=2,
        fast_n_head=4, fast_n_local_heads=2,
    )


@pytest.mark.slow
def test_sequence_parallel_train_step_matches():
    """TrainingConfig.sequence_parallel shards [B, T, dim] activations over
    the model axis; the sharded train step must reproduce the plain one."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg = make_cfg()
    token_cfg = TokenConfig.smoltts_v0(cfg.codebook_size)
    tc = TrainingConfig(learning_rate=1e-3, accumulate_steps=1, use_bf16=False)
    ds = synthetic_dataset(4, cfg, token_cfg, seq_len=32, seed=0)
    batch = {
        k: jnp.asarray(v)
        for k, v in collate(
            [r["ground_truth"] for r in ds], token_cfg.pad_id, max_len=32,
            duplicate_code_0=cfg.duplicate_code_0, num_codebooks=cfg.num_codebooks,
        ).items()
    }

    def run(seq_parallel):
        params = init_params(cfg, jax.random.PRNGKey(0), dtype=np.float32)
        act_sh = None
        if seq_parallel:
            mesh = make_mesh(2, 4)
            params = jax.tree.map(
                jax.device_put, params, param_shardings(mesh, params)
            )
            act_sh = NamedSharding(mesh, P("data", "model", None))
        state, tx = init_train_state(params, tc)
        step = make_train_step(cfg, tc, tx, activation_sharding=act_sh)
        losses = []
        for i in range(3):
            state, m = step(state, batch, jax.random.PRNGKey(1 + i))
            losses.append(float(m["loss"]))
        return losses

    np.testing.assert_allclose(run(False), run(True), rtol=2e-5)


def test_auto_resume_finds_latest_checkpoint(tmp_path):
    cfg = make_cfg()
    params = init_params(cfg, jax.random.PRNGKey(0))
    tc = TrainingConfig(learning_rate=1e-4)
    state, _ = init_train_state(params, tc)

    assert CheckpointManager.latest_checkpoint(tmp_path) is None
    m1 = CheckpointManager(str(tmp_path), run_name="run_a", config=tc)
    m1.save(state, 5)
    m2 = CheckpointManager(str(tmp_path), run_name="run_b", config=tc)
    m2.save(state, 3)
    latest = CheckpointManager.latest_checkpoint(tmp_path)
    assert latest is not None and latest.name == "step_000005"
    ckpt, step, reinit = CheckpointManager.load(latest, tc)
    assert step == 5 and not reinit


def test_model_id_hub_resolution_stubbed(tmp_path, monkeypatch):
    """ServerSettings.model_id resolves via huggingface_hub.snapshot_download
    (reference server/settings.py:28-55); stubbed here — zero egress."""
    from smoltts_tpu.server.settings import ServerSettings

    calls = {}

    fake = types.ModuleType("huggingface_hub")

    def snapshot_download(model_id):
        calls["model_id"] = model_id
        return str(tmp_path / "snap")

    fake.snapshot_download = snapshot_download
    monkeypatch.setitem(sys.modules, "huggingface_hub", fake)

    s = ServerSettings(model_id="jkeisling/smoltts_v0")
    assert str(s.get_checkpoint_dir()).endswith("snap")
    assert calls["model_id"] == "jkeisling/smoltts_v0"

    def boom(model_id):
        raise OSError("offline")

    fake.snapshot_download = boom
    with pytest.raises(RuntimeError, match="no hub access"):
        s.get_checkpoint_dir()


def test_settings_bootstrap_writes_default(tmp_path, monkeypatch):
    from smoltts_tpu.server import settings as mod

    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path))
    s = mod.ServerSettings.get_settings()
    assert s.model_id == "jkeisling/smoltts_v0"
    assert (tmp_path / "smoltts" / "settings" / "config.json").exists()
