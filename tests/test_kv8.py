"""kv8 (int8 KV cache) quality gates.

The serving configuration stores the LM KV HISTORY and the codec
transformer RING in int8 with per-vector scales (ops/quant.py::quantize_kv,
lm/decode.py::flush_kv, codec/transformer.py::flush_transformer_ring);
the hot-path tails stay bf16 and quantization happens only at the
prefill/flush boundary. These tests pin:

- the scale wiring bit-exactly (power-of-two scales make int8 dequant exact
  in bf16, the same trick as tests/test_ops_quant.py);
- greedy decode agreement between kv8 and bf16 caches on random weights;
- vocoder PCM closeness (SNR) with the kv8 codec ring.

The reference has no quantized inference path at all; this is a TPU-native
serving capability (see ops/quant.py module docstring).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smoltts_tpu.codec.config import MimiConfig
from smoltts_tpu.lm.decode import decode_frame, flush_kv, init_decode_state, prefill
from smoltts_tpu.lm.samplers import GenerationSettings
from smoltts_tpu.models.dual_ar import init_params
from smoltts_tpu.ops.quant import quantize_kv

from tests.test_decode import audio_prompt, make_cfg, make_token_cfg


def test_quantize_kv_power_of_two_exact():
    """Vectors whose amax is 127 * 2^e dequantize bit-exactly."""
    rng = np.random.default_rng(0)
    ints = rng.integers(-127, 128, (4, 6, 16)).astype(np.float32)
    ints[..., 0] = 127.0  # pin amax -> scale exactly 1.0
    x = jnp.asarray(ints * 0.25)  # scale 2^-2, exact in fp
    q, s = quantize_kv(x)
    assert q.dtype == jnp.int8 and s.shape == x.shape[:-1]
    deq = q.astype(jnp.float32) * s[..., None]
    np.testing.assert_array_equal(np.asarray(deq), np.asarray(x))


def _greedy_tokens(kv_dtype, n_frames=24, tail_len=8):
    cfg = make_cfg()
    token_cfg = make_token_cfg(cfg)
    params = init_params(cfg, jax.random.PRNGKey(0))
    settings = GenerationSettings(default_temp=0.0, default_fast_temp=0.0)
    state = init_decode_state(cfg, 2, 96, dtype=kv_dtype, tail_len=tail_len)
    prompt = jnp.asarray(
        np.stack([audio_prompt(cfg, token_cfg, 9, seed=s) for s in (0, 1)])
    )
    plen = jnp.array([9, 9], jnp.int32)
    state, out = prefill(
        params, cfg, token_cfg, settings, state, prompt, plen, jax.random.PRNGKey(1)
    )
    frames = [np.asarray(out.tokens)]
    for i in range(n_frames):
        if (i + 1) % (tail_len - 1) == 0:
            state = flush_kv(state)
        state, out = decode_frame(
            params, cfg, token_cfg, settings, state, jax.random.PRNGKey(2)
        )
        frames.append(np.asarray(out.tokens))
    return np.stack(frames)  # [F, B, rows]


@pytest.mark.slow
def test_greedy_kv8_agrees_with_bf16():
    """Quality gate: int8 history changes almost no greedy decisions."""
    ref = _greedy_tokens(jnp.bfloat16)
    kv8 = _greedy_tokens(jnp.int8)
    agreement = float((ref == kv8).mean())
    assert agreement >= 0.9, f"kv8 greedy agreement {agreement:.3f} < 0.9"


@pytest.mark.slow
def test_kv8_flush_is_stable():
    """Different flush cadences move the bf16->int8 boundary; decisions must
    stay (near-)identical — the quantizer is deterministic per entry."""
    a = _greedy_tokens(jnp.int8, tail_len=8)
    b = _greedy_tokens(jnp.int8, tail_len=16)
    agreement = float((a == b).mean())
    assert agreement >= 0.9, f"kv8 cadence agreement {agreement:.3f} < 0.9"


@pytest.mark.slow
def test_codec_ring_kv8_pcm_snr():
    """Vocoder gate: streaming decode with the int8 codec ring stays within
    30 dB SNR of the bf16 ring on the same codes."""
    from smoltts_tpu.codec.mimi import (
        decode_stream_init,
        flush_mimi_state,
        init_mimi_params,
        mimi_decode_step,
    )
    from tests.test_mimi_parity import small_cfg

    cfg = small_cfg()
    params = init_mimi_params(cfg, seed=3, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    codes = rng.integers(0, cfg.codebook_size, (2, cfg.num_quantizers, 40))

    def run(kv_dtype):
        st = decode_stream_init(
            cfg, 2, dtype=jnp.float32, tail_len=8, kv_dtype=kv_dtype
        )
        chunks = []
        for t in range(codes.shape[-1]):
            if t and t % 3 == 0:
                st = flush_mimi_state(st)
            st, pcm = mimi_decode_step(params, cfg, st, jnp.asarray(codes[:, :, t : t + 1]))
            chunks.append(np.asarray(pcm, np.float64))
        return np.concatenate(chunks, axis=1)

    ref = run(None)
    q = run(jnp.int8)
    err = ref - q
    snr_db = 10 * np.log10((ref**2).mean() / max((err**2).mean(), 1e-20))
    assert snr_db > 30, f"kv8 codec ring SNR {snr_db:.1f} dB < 30"


def test_engine_kv8_smoke():
    """Continuous-batching engine runs end-to-end with kv_dtype=int8
    (admission scatter, bucketed decode, periodic flush)."""
    from smoltts_tpu.lm.engine import DecodeEngine

    cfg = make_cfg()
    token_cfg = make_token_cfg(cfg)
    params = init_params(cfg, jax.random.PRNGKey(0))
    settings = GenerationSettings(default_temp=0.0, default_fast_temp=0.0)
    engine = DecodeEngine(
        params, cfg, token_cfg, settings,
        num_slots=2, max_seq_len=96, kv_dtype=jnp.int8,
        prompt_bucket=16, inflight=0, fetch_every=1,
    )
    sid = engine.submit(audio_prompt(cfg, token_cfg, 9), max_frames=12)
    got = 0
    for _ in range(40):
        for s, frame in engine.step():
            assert s == sid
            got += 1
            if frame["finished"]:
                break
        if not engine.has_work():
            break
    assert got >= 12
