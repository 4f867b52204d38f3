"""Native safetensors codec + audio kernels vs. their vendored-library oracles.

The safetensors oracle is the `safetensors` package (the Rust crate the
reference uses); the audio oracles are numpy (PCM conversion, exact) and
scipy's polyphase resampler (spectral agreement).
"""

import numpy as np
import pytest

from smoltts_tpu.native.audio_io import native_audio_available
from smoltts_tpu.native.safetensors_io import native_st_available


def _tensors():
    rng = np.random.default_rng(0)
    t = {
        "a.weight": rng.standard_normal((17, 33)).astype(np.float32),
        "b/bias\"quoted": rng.standard_normal((8,)).astype(np.float16),
        "c.int": rng.integers(-100, 100, (3, 4, 5)).astype(np.int64),
        "d.scalar": np.array(3.5, dtype=np.float32),
        "e.bool": rng.integers(0, 2, (9,)).astype(bool),
        "f.empty": np.zeros((0, 4), dtype=np.float32),
    }
    return t


@pytest.mark.skipif(not native_st_available(), reason="no C toolchain")
def test_native_reads_rust_written(tmp_path):
    from safetensors.numpy import save_file as rust_save

    from smoltts_tpu.native.safetensors_io import load_file

    tensors = _tensors()
    path = tmp_path / "rust.safetensors"
    rust_save(tensors, str(path))
    got = load_file(path)
    assert set(got) == set(tensors)
    for k in tensors:
        assert got[k].dtype == tensors[k].dtype, k
        assert got[k].shape == tensors[k].shape, k
        np.testing.assert_array_equal(np.asarray(got[k]), tensors[k])


@pytest.mark.skipif(not native_st_available(), reason="no C toolchain")
def test_rust_reads_native_written(tmp_path):
    from safetensors.numpy import load_file as rust_load

    from smoltts_tpu.native.safetensors_io import save_file

    tensors = _tensors()
    path = tmp_path / "native.safetensors"
    save_file(tensors, path)
    got = rust_load(str(path))
    assert set(got) == set(tensors)
    for k in tensors:
        np.testing.assert_array_equal(got[k], tensors[k])


@pytest.mark.skipif(not native_st_available(), reason="no C toolchain")
def test_native_roundtrip_bf16(tmp_path):
    """BF16 rides through the native path (the Rust->numpy API rejects it)."""
    import ml_dtypes

    from smoltts_tpu.native.safetensors_io import load_file, save_file

    x = np.arange(24, dtype=np.float32).reshape(4, 6).astype(ml_dtypes.bfloat16)
    path = tmp_path / "bf16.safetensors"
    save_file({"x": x}, path)
    got = load_file(path)["x"]
    assert got.dtype == ml_dtypes.bfloat16
    np.testing.assert_array_equal(np.asarray(got), x)


@pytest.mark.skipif(not native_st_available(), reason="no C toolchain")
def test_native_rejects_corrupt_offsets(tmp_path):
    import json
    import struct

    from smoltts_tpu.native.safetensors_io import load_file

    hdr = json.dumps(
        {"x": {"dtype": "F32", "shape": [4], "data_offsets": [0, 12]}}
    ).encode()
    path = tmp_path / "bad.safetensors"
    path.write_bytes(struct.pack("<Q", len(hdr)) + hdr + b"\x00" * 12)
    with pytest.raises(ValueError):
        load_file(path)


@pytest.mark.skipif(not native_st_available(), reason="no C toolchain")
def test_checkpoint_interop_uses_native(tmp_path):
    """save_params/load_params roundtrip rides the native codec."""
    import jax

    from smoltts_tpu.config import tiny_debug_config
    from smoltts_tpu.io.checkpoint_interop import load_params, save_params
    from smoltts_tpu.models.dual_ar import init_params

    cfg = tiny_debug_config()
    params = init_params(cfg, jax.random.PRNGKey(0))
    save_params(params, cfg, tmp_path / "ckpt")
    loaded = load_params(tmp_path / "ckpt", cfg)
    flat1 = jax.tree_util.tree_leaves_with_path(params)
    flat2 = dict(jax.tree_util.tree_leaves_with_path(loaded))
    for path, leaf in flat1:
        np.testing.assert_allclose(
            np.asarray(leaf, np.float32), np.asarray(flat2[path], np.float32), atol=1e-6
        )


@pytest.mark.skipif(not native_audio_available(), reason="no C toolchain")
def test_f32_to_i16_matches_numpy():
    from smoltts_tpu.native.audio_io import f32_to_i16, i16_to_f32

    rng = np.random.default_rng(1)
    x = np.concatenate(
        [rng.uniform(-1.5, 1.5, 4096).astype(np.float32), [0.0, 1.0, -1.0, 2.0, -2.0]]
    ).astype(np.float32)
    ref = (np.clip(x, -1.0, 1.0) * 32767.0).astype(np.int16)
    np.testing.assert_array_equal(f32_to_i16(x), ref)
    back = i16_to_f32(ref)
    np.testing.assert_allclose(back, ref.astype(np.float32) / 32768.0, atol=0)


@pytest.mark.skipif(not native_audio_available(), reason="no C toolchain")
@pytest.mark.parametrize("out_rate", [16_000, 22_050, 44_100, 48_000])
def test_resample_spectral_parity(out_rate):
    """Windowed-sinc resampler agrees with scipy's polyphase resampler on a
    band-limited signal (interior samples; both are linear-phase)."""
    from scipy import signal

    from smoltts_tpu.native.audio_io import resample

    in_rate = 24_000
    t = np.arange(24_000 // 4, dtype=np.float64) / in_rate
    x = (
        0.5 * np.sin(2 * np.pi * 440.0 * t)
        + 0.3 * np.sin(2 * np.pi * 1333.0 * t + 0.7)
        + 0.2 * np.sin(2 * np.pi * 3210.0 * t + 1.1)
    ).astype(np.float32)

    got = resample(x, in_rate, out_rate)
    assert got.size == int(x.size * out_rate / in_rate)

    from math import gcd

    g = gcd(in_rate, out_rate)
    ref = signal.resample_poly(x.astype(np.float64), out_rate // g, in_rate // g)
    n = min(got.size, ref.size)
    lo, hi = int(0.05 * n), int(0.95 * n)
    err = np.max(np.abs(got[lo:hi] - ref[lo:hi]))
    assert err < 5e-3, f"max interior err {err} at {out_rate}"


@pytest.mark.skipif(not native_audio_available(), reason="no C toolchain")
def test_resample_identity():
    from smoltts_tpu.native.audio_io import resample

    x = np.random.default_rng(2).standard_normal(1000).astype(np.float32)
    np.testing.assert_array_equal(resample(x, 24_000, 24_000), x)
