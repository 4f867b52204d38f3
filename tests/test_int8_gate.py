"""Quality gate for the int8 weight-only decode path (the defended bench
configuration, BENCH_INT8): quantization noise must be negligible at the
three places it could surface.

No released weights are reachable from this environment (zero egress), so the
gate runs on random-init weights — the same distribution the bench measures —
with scale-free metrics (CE delta, KL, SNR) rather than token-level argmax
agreement (random-init logits are near-uniform, where argmax is noise even
for perfect quantization).
"""

import numpy as np

import jax
import jax.numpy as jnp

from smoltts_tpu.codec.config import MimiConfig
from smoltts_tpu.codec.mimi import init_mimi_params, mimi_decode
from smoltts_tpu.config import ModelType, tiny_debug_config
from smoltts_tpu.models.dual_ar import forward_train, init_params
from smoltts_tpu.ops.quant import quantize_decode_params, quantize_mimi_params
from smoltts_tpu.tokenizer import ByteTokenizer, TokenConfig
from smoltts_tpu.train.data import batch_iterator, synthetic_dataset
from smoltts_tpu.train.loss import compute_losses

CB = 64


def setup_lm():
    cfg = tiny_debug_config(codebook_size=CB, vocab_size=256 + 64 + CB)
    token_cfg = TokenConfig.from_tokenizer(
        ModelType.smoltts_v0(), ByteTokenizer(CB), cfg
    )
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    return cfg, token_cfg, params


def teacher_forced_logits(cfg, token_cfg, params, batch):
    out = forward_train(
        params, cfg, jnp.asarray(batch["tokens"]),
        embed_mask_mode="semantic_range",
        semantic_start_id=token_cfg.semantic_start_id,
        semantic_end_id=token_cfg.semantic_end_id,
    )
    return out


def test_int8_lm_ce_and_kl_gate():
    """Teacher-forced CE moves <2% and mean token KL stays tiny under int8."""
    cfg, token_cfg, params = setup_lm()
    ds = synthetic_dataset(8, cfg, token_cfg, seq_len=40, seed=0)
    batch = next(
        batch_iterator(
            ds, batch_size=8, semantic_pad_id=token_cfg.pad_id, max_len=40,
            duplicate_code_0=cfg.duplicate_code_0, num_codebooks=cfg.num_codebooks,
        )
    )
    q = quantize_decode_params(params)

    ref = teacher_forced_logits(cfg, token_cfg, params, batch)
    got = teacher_forced_logits(cfg, token_cfg, q, batch)

    labels = jnp.asarray(batch["labels"])
    l_ref = compute_losses(ref.token_logits, ref.codebook_logits, labels)
    l_got = compute_losses(got.token_logits, got.codebook_logits, labels)
    rel = abs(float(l_got.total) - float(l_ref.total)) / float(l_ref.total)
    assert rel < 0.02, f"int8 CE delta {rel:.4f}"

    def mean_kl(a, b):
        pa = jax.nn.log_softmax(a.astype(jnp.float32), axis=-1)
        pb = jax.nn.log_softmax(b.astype(jnp.float32), axis=-1)
        return float((jnp.exp(pa) * (pa - pb)).sum(-1).mean())

    assert mean_kl(ref.token_logits, got.token_logits) < 0.02
    assert mean_kl(ref.codebook_logits, got.codebook_logits) < 0.02


def test_int8_mimi_pcm_snr_gate():
    """int8 vocoder output stays within 25 dB SNR of the fp32 vocoder."""
    cfg = MimiConfig(
        num_filters=8, upsampling_ratios=[4, 3, 2], hidden_size=32,
        num_hidden_layers=2, num_attention_heads=2, head_dim=16,
        intermediate_size=64, codebook_size=CB, codebook_dim=16,
        num_quantizers=8, upsample_groups=32, frame_rate=500.0,
    )
    params = init_mimi_params(cfg, seed=0)
    q = quantize_mimi_params(params)

    rng = np.random.default_rng(1)
    codes = jnp.asarray(rng.integers(0, CB, (2, 8, 12)))
    ref = np.asarray(mimi_decode(params, cfg, codes)).astype(np.float64)
    got = np.asarray(mimi_decode(q, cfg, codes)).astype(np.float64)
    err = ref - got
    snr = 10 * np.log10((ref**2).mean() / max((err**2).mean(), 1e-20))
    assert snr > 25.0, f"int8 vocoder SNR {snr:.1f} dB"


def test_int8_streaming_vocoder_runs():
    """Quantized codec transformer works through the streaming ring path."""
    from smoltts_tpu.codec.mimi import decode_stream_init, mimi_decode_step

    cfg = MimiConfig(
        num_filters=8, upsampling_ratios=[4, 3, 2], hidden_size=32,
        num_hidden_layers=2, num_attention_heads=2, head_dim=16,
        intermediate_size=64, codebook_size=CB, codebook_dim=16,
        num_quantizers=8, upsample_groups=32, frame_rate=500.0,
    )
    params = init_mimi_params(cfg, seed=0)
    q = quantize_mimi_params(params)
    rng = np.random.default_rng(2)
    codes = jnp.asarray(rng.integers(0, CB, (1, 8, 4)))

    def stream(p):
        st = decode_stream_init(cfg, batch=1)
        outs = []
        for t in range(4):
            st, pcm = mimi_decode_step(p, cfg, st, codes[:, :, t : t + 1])
            outs.append(np.asarray(pcm))
        return np.concatenate(outs, axis=1)

    ref, got = stream(params).astype(np.float64), stream(q).astype(np.float64)
    err = ref - got
    snr = 10 * np.log10((ref**2).mean() / max((err**2).mean(), 1e-20))
    assert snr > 25.0, f"streaming int8 vocoder SNR {snr:.1f} dB"
