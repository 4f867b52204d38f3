"""The runtime quant gates (ops/quant_gate.py) that bench.py runs before
measuring a quantized configuration: they must pass for a faithful int8
quantization AND fail loudly for a corrupted one (the VERDICT r2 ask: an env
flag flipping int8/kv8 without its gate passing should not be measurable)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from smoltts_tpu.codec.config import MimiConfig
from smoltts_tpu.codec.mimi import init_mimi_params
from smoltts_tpu.config import ModelType, tiny_debug_config
from smoltts_tpu.lm.samplers import GenerationSettings
from smoltts_tpu.models.dual_ar import init_params
from smoltts_tpu.ops.quant import QTensor, quantize_decode_params, quantize_mimi_params
from smoltts_tpu.ops.quant_gate import (
    QuantGateError,
    gate_int8_lm,
    gate_int8_vocoder,
    gate_kv8,
    run_quant_gates,
)
from smoltts_tpu.tokenizer import ByteTokenizer, TokenConfig

CB = 64


def setup():
    cfg = tiny_debug_config(codebook_size=CB, vocab_size=256 + 64 + CB)
    token_cfg = TokenConfig.from_tokenizer(ModelType.smoltts_v0(), ByteTokenizer(CB), cfg)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    mimi_cfg = MimiConfig(
        num_filters=8, upsampling_ratios=[4, 3, 2], hidden_size=32,
        num_hidden_layers=2, num_attention_heads=2, head_dim=16,
        intermediate_size=64, codebook_size=CB, codebook_dim=16,
        num_quantizers=8, upsample_groups=32, frame_rate=500.0,
    )
    mimi = init_mimi_params(mimi_cfg, seed=1)
    return cfg, token_cfg, params, mimi_cfg, mimi


def test_gates_pass_for_faithful_quantization():
    cfg, token_cfg, params, mimi_cfg, mimi = setup()
    settings = GenerationSettings(default_temp=0.7, default_fast_temp=0.7, min_p=0.05)
    metrics = run_quant_gates(
        cfg, token_cfg, settings, mimi_cfg,
        params, quantize_decode_params(params),
        mimi, quantize_mimi_params(mimi),
        int8=True, kv8=True,
    )
    assert metrics["int8_ce_delta"] < 0.02
    assert metrics["int8_js_sampling"] < 0.05
    assert metrics["int8_sampling_flip_mass"] >= 0.0  # informational, not gated
    assert metrics["int8_vocoder_snr_db"] > 25.0
    assert metrics["kv8_roundtrip_snr_db"] > 30.0
    assert metrics["kv8_attention_rel_err"] < 0.02


def _corrupt(qparams):
    """Scale the fast output head's dequant scales 4x — a realistic wiring
    bug that shows directly in the codebook logits. (A trunk wqkv scale
    error is largely absorbed by the downstream RMSNorms at random init —
    logit-level metrics are the observable surface.)"""
    out = dict(qparams)
    w = out["fast_output"]
    assert isinstance(w, QTensor)
    out["fast_output"] = QTensor(q=w.q, scale=w.scale * 4.0)
    return out


def test_int8_gate_fails_loudly_on_corruption():
    cfg, token_cfg, params, _, _ = setup()
    bad = _corrupt(quantize_decode_params(params))
    with pytest.raises(QuantGateError):
        gate_int8_lm(cfg, token_cfg, params, bad)


def test_vocoder_gate_fails_loudly_on_corruption():
    cfg, token_cfg, params, mimi_cfg, mimi = setup()
    settings = GenerationSettings()
    qmimi = quantize_mimi_params(mimi)
    # Corrupt every decoder-transformer linear 8x: a single-projection error
    # is masked by LayerScale (0.01) at random init, but a systematic scale
    # bug (the realistic failure: wrong dequant axis/broadcast) is caught.
    bad = dict(qmimi)
    trunk = dict(bad["decoder_transformer"])
    lp = dict(trunk["layers"])
    for key in list(lp):
        if isinstance(lp[key], QTensor):
            lp[key] = QTensor(q=lp[key].q, scale=lp[key].scale * 8.0)
    trunk["layers"] = lp
    bad["decoder_transformer"] = trunk
    with pytest.raises(QuantGateError):
        gate_int8_vocoder(cfg, token_cfg, settings, mimi_cfg, params, mimi, bad)


def test_kv8_gate_runs_on_real_prefill_tensors():
    cfg, token_cfg, params, _, _ = setup()
    m = gate_kv8(cfg, token_cfg, params)
    assert m["kv8_roundtrip_snr_db"] > 30.0


@pytest.mark.slow
def test_cached_gates_hit_and_invalidate(tmp_path):
    from smoltts_tpu.ops.quant_gate import run_quant_gates_cached

    cfg, token_cfg, params, mimi_cfg, mimi = setup()
    settings = GenerationSettings(default_temp=0.7, default_fast_temp=0.7, min_p=0.05)
    cache = str(tmp_path / "gate_cache.json")
    args = (cfg, token_cfg, settings, mimi_cfg,
            params, quantize_decode_params(params),
            mimi, quantize_mimi_params(mimi))
    m1 = run_quant_gates_cached(*args, int8=True, kv8=True, cache_path=cache)
    assert "gate_cached" not in m1 and m1["int8_ce_delta"] < 0.02
    # Second call: verdict comes from the cache, marked as such.
    m2 = run_quant_gates_cached(*args, int8=True, kv8=True, cache_path=cache)
    assert m2.pop("gate_cached") == 1.0
    assert m2 == {k: float(v) for k, v in m1.items()}
    # A different config misses the cache (fresh verdict, no marker).
    cfg2 = tiny_debug_config(codebook_size=CB, vocab_size=256 + 64 + CB, n_layer=1)
    params2 = init_params(cfg2, jax.random.PRNGKey(0), dtype=jnp.float32)
    m3 = run_quant_gates_cached(
        cfg2, token_cfg, settings, mimi_cfg,
        params2, quantize_decode_params(params2),
        mimi, quantize_mimi_params(mimi),
        int8=True, kv8=False, cache_path=cache)
    assert "gate_cached" not in m3
