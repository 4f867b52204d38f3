"""Int8 weight-only decode quantization (smoltts_tpu/ops/quant.py).

Correctness strategy:
- `test_power_of_two_exact`: with weights that are exactly representable as
  int8 * 2^-k, the quantized decode path must be BIT-IDENTICAL to the dense
  path — `(x @ q) * 2^-k == x @ (q * 2^-k)` exactly (power-of-two scaling is
  exact in floating point and preserves accumulation order). This pins the
  mm/qindex wiring through the whole frame step with zero tolerance.
- `test_quantization_error_bound` / `test_mm_and_qindex`: unit semantics.
- `test_stream_step_runs_quantized`: the full fused serving step (LM + Mimi
  vocoder) compiles and runs with a quantized param tree end to end.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from smoltts_tpu.codec.config import MimiConfig
from smoltts_tpu.codec.mimi import decode_stream_init, init_mimi_params
from smoltts_tpu.config import ModelType, tiny_debug_config
from smoltts_tpu.lm.decode import decode_frame, init_decode_state, prefill
from smoltts_tpu.lm.pipeline import make_prefill_step, make_stream_step
from smoltts_tpu.lm.samplers import GenerationSettings
from smoltts_tpu.models.dual_ar import init_params
from smoltts_tpu.ops.quant import (
    QTensor,
    dequantize,
    mm,
    qindex,
    quantize_decode_params,
    quantize_q8,
)
from smoltts_tpu.tokenizer import ByteTokenizer, TokenConfig


def setup():
    cfg = tiny_debug_config(codebook_size=32, vocab_size=256 + 64 + 32)
    tok = ByteTokenizer(32)
    token_cfg = TokenConfig.from_tokenizer(ModelType.smoltts_v0(), tok, cfg)
    params = init_params(cfg, jax.random.PRNGKey(0))
    return cfg, token_cfg, params


def audio_prompt(cfg, token_cfg, B, T, seed=0):
    rng = np.random.default_rng(seed)
    p = np.zeros((B, cfg.num_rows, T), dtype=np.int32)
    c0 = rng.integers(0, cfg.codebook_size, (B, T))
    p[:, 0] = token_cfg.semantic_start_id + c0
    p[:, 1] = c0
    p[:, 2:] = rng.integers(0, cfg.codebook_size, (B, cfg.num_rows - 2, T))
    return p


def test_quantization_error_bound():
    w = jax.random.normal(jax.random.PRNGKey(0), (3, 64, 48), jnp.float32)
    qt = quantize_q8(w, contract_axis=-2)
    assert qt.q.dtype == jnp.int8
    assert qt.scale.shape == (3, 1, 48)
    err = jnp.abs(dequantize(qt, jnp.float32) - w)
    # symmetric int8: |err| <= scale/2 per element (+ bf16 storage rounding)
    assert float(jnp.max(err - qt.scale / 2)) < 1e-2


def test_mm_and_qindex():
    w = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 16), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(2), (5, 32), jnp.bfloat16)
    qt = quantize_q8(w)
    for i in range(4):
        wi = qindex(qt, i)
        ref = x.astype(jnp.float32) @ dequantize(wi, jnp.float32).astype(jnp.float32)
        got = mm(x, wi).astype(jnp.float32)
        assert jnp.allclose(got, ref, rtol=5e-2, atol=5e-2)
    # plain-array passthrough is the identity matmul
    wb = w[0].astype(jnp.bfloat16)
    assert jnp.array_equal(mm(x, wb), x @ wb)
    assert jnp.array_equal(qindex(w, 2), w[2])


def _pot_quantize_params(params, k=5):
    """Snap every to-be-quantized weight to int8 * 2^-k; return (dense,
    quantized) param trees that are mathematically equal."""
    scale = 2.0**-k
    q = quantize_decode_params(params)

    def snap(leaf):
        if isinstance(leaf, QTensor):
            pot_scale = jnp.full_like(leaf.scale, scale)
            dense = (leaf.q.astype(jnp.float32) * scale).astype(jnp.bfloat16)
            return QTensor(q=leaf.q, scale=pot_scale), dense
        return leaf, leaf

    flat, treedef = jax.tree.flatten(q, is_leaf=lambda x: isinstance(x, QTensor))
    snapped = [snap(leaf) for leaf in flat]
    qparams = jax.tree.unflatten(treedef, [s[0] for s in snapped])
    dense = jax.tree.unflatten(treedef, [s[1] for s in snapped])
    return dense, qparams


@pytest.mark.slow  # ~29 s numerical property sweep; core int8 exactness is
# covered in the default tier by the roundtrip/matmul tests above
def test_power_of_two_exact():
    """Quantized greedy decode == dense greedy decode, bit-for-bit, when
    scales are powers of two (pins every mm call site in the frame step)."""
    cfg, token_cfg, params = setup()
    settings = GenerationSettings(default_temp=0.0, default_fast_temp=0.0)
    dense, qparams = _pot_quantize_params(params)

    B, S, T = 2, 64, 6
    prompt = jnp.asarray(audio_prompt(cfg, token_cfg, B, T))
    prompt_len = jnp.full((B,), T, jnp.int32)
    key = jax.random.PRNGKey(3)

    outs = []
    for p in (dense, qparams):
        state = init_decode_state(cfg, B, S)
        state, out = prefill(p, cfg, token_cfg, settings, state, prompt, prompt_len, key)
        frames = [np.asarray(out.tokens)]
        for _ in range(3):
            state, out = decode_frame(p, cfg, token_cfg, settings, state, key)
            frames.append(np.asarray(out.tokens))
        outs.append(np.stack(frames))
    np.testing.assert_array_equal(outs[0], outs[1])


def test_stream_step_runs_quantized():
    """Full fused LM+vocoder step with int8 weights runs end to end."""
    cfg, token_cfg, params = setup()
    settings = GenerationSettings(default_temp=0.0, default_fast_temp=0.0)
    qparams = quantize_decode_params(params)
    mimi_cfg = MimiConfig(
        num_filters=8,
        upsampling_ratios=[4, 3, 2],
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=2,
        head_dim=16,
        intermediate_size=64,
        codebook_size=32,
        codebook_dim=16,
        num_quantizers=8,
        upsample_groups=32,
        frame_rate=500.0,
    )
    mimi_params = init_mimi_params(mimi_cfg, seed=1)

    B, S, T = 2, 64, 6
    prompt = jnp.asarray(audio_prompt(cfg, token_cfg, B, T, seed=1))
    prompt_len = jnp.full((B,), T, jnp.int32)

    prefill_step = make_prefill_step(cfg, token_cfg, settings, mimi_cfg)
    stream_step = make_stream_step(cfg, token_cfg, settings, mimi_cfg)

    state = init_decode_state(cfg, B, S)
    mstate = decode_stream_init(mimi_cfg, B)
    key = jax.random.PRNGKey(0)
    state, mstate, key, out = prefill_step(
        qparams, mimi_params, state, mstate, prompt, prompt_len, key
    )
    for _ in range(2):
        state, mstate, key, out = stream_step(qparams, mimi_params, state, mstate, key)
    pcm = np.asarray(out.pcm)
    assert np.all(np.isfinite(pcm))
    assert pcm.shape[0] == B
