"""Tests for utils: golden-dump compare harness and the train profiler window.

The compare harness generalizes the reference's parity script
(mlx_inference/tests/compare_npy.py:12-34); the profiler window is the
TPU-native equivalent of the reference's nsys-wrapped run config
(config/kokoro_v0.19/pg_kokoro_wte_nsys.json).
"""

from __future__ import annotations

import glob

import numpy as np

from smoltts_tpu.utils.compare import compare, load_dump, main as compare_main


def test_compare_allclose_and_diff(tmp_path):
    a = np.random.default_rng(0).standard_normal((8, 8)).astype(np.float32)
    np.save(tmp_path / "a.npy", a)
    np.save(tmp_path / "b.npy", a + 5e-7)
    np.save(tmp_path / "c.npy", a + 1.0)
    assert compare_main([str(tmp_path / "a.npy"), str(tmp_path / "b.npy")]) == 0
    assert compare_main([str(tmp_path / "a.npy"), str(tmp_path / "c.npy")]) == 1


def test_compare_npz_keywise(tmp_path):
    a = np.ones((4,), np.float32)
    np.savez(tmp_path / "x.npz", p=a, q=2 * a)
    np.savez(tmp_path / "y.npz", p=a, r=2 * a)  # q/r mismatch -> not ok
    assert not compare(load_dump(tmp_path / "x.npz"), load_dump(tmp_path / "y.npz"))
    np.savez(tmp_path / "z.npz", p=a, q=2 * a)
    assert compare(load_dump(tmp_path / "x.npz"), load_dump(tmp_path / "z.npz"))


def test_compare_shape_mismatch(tmp_path):
    np.save(tmp_path / "a.npy", np.zeros((2, 2), np.float32))
    np.save(tmp_path / "b.npy", np.zeros((3,), np.float32))
    assert not compare(load_dump(tmp_path / "a.npy"), load_dump(tmp_path / "b.npy"))


def test_train_loop_profiler_window(tmp_path):
    import jax
    import jax.numpy as jnp

    from smoltts_tpu.config import TrainingConfig, tiny_debug_config
    from smoltts_tpu.models.dual_ar import init_params
    from smoltts_tpu.train.trainer import init_train_state, train_loop

    cfg = tiny_debug_config()
    tc = TrainingConfig(
        profile_steps=2,
        profile_dir=str(tmp_path / "trace"),
        log_every_n_steps=1,
        val_every_n_steps=10**9,
        save_every_n_steps=10**9,
    )
    params = init_params(cfg, jax.random.PRNGKey(0))
    state, tx = init_train_state(params, tc)
    rng = np.random.default_rng(0)

    def batches(n=5):
        for _ in range(n):
            t = jnp.asarray(rng.integers(0, 200, (2, cfg.num_rows, 16)).astype(np.int32))
            l = jnp.asarray(rng.integers(0, 200, (2, cfg.num_rows, 16)).astype(np.int32))
            yield {"tokens": t, "labels": l}

    state = train_loop(cfg, tc, state, tx, batches())
    assert int(state.step) == 5
    traces = glob.glob(str(tmp_path / "trace" / "**" / "*.xplane.pb"), recursive=True)
    assert traces, "profiler window wrote no trace"
