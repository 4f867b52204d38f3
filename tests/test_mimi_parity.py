"""Mimi codec golden parity vs HF transformers MimiModel (random weights) and
streaming-equals-batch invariants.

The HF model is an independent oracle (not the reference repo): the reference
MLX port and HF both implement kyutai/mimi with identical weights/keys, so
agreeing with HF == agreeing with the reference engine's codec
(SURVEY.md §2.4).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from smoltts_tpu.codec.config import MimiConfig
from smoltts_tpu.codec.mimi import (
    decode_stream_init,
    mimi_decode,
    mimi_decode_step,
    mimi_encode,
    params_from_hf_state_dict,
)

torch = pytest.importorskip("torch")


def small_cfg() -> MimiConfig:
    """Scaled-down Mimi: same structure, fast on CPU."""
    return MimiConfig(
        num_filters=8,
        upsampling_ratios=[4, 3, 2],
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=2,
        head_dim=16,
        intermediate_size=64,
        codebook_size=64,
        codebook_dim=16,
        num_quantizers=8,
        upsample_groups=32,
        sampling_rate=24_000,
        # hop = 4*3*2 = 24 -> encodec rate 1000 Hz; keep the real model's 2x
        # down/upsample ratio by setting frame_rate to 500 Hz.
        frame_rate=500.0,
    )


def hf_cfg_from(cfg: MimiConfig):
    from transformers import MimiConfig as HFConfig

    return HFConfig(
        num_filters=cfg.num_filters,
        upsampling_ratios=cfg.upsampling_ratios,
        hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        num_key_value_heads=cfg.num_attention_heads,
        head_dim=cfg.head_dim,
        intermediate_size=cfg.intermediate_size,
        codebook_size=cfg.codebook_size,
        codebook_dim=cfg.codebook_dim,
        vector_quantization_hidden_dimension=cfg.codebook_dim,
        num_quantizers=cfg.num_quantizers,
        num_semantic_quantizers=cfg.num_semantic_quantizers,
        upsample_groups=cfg.upsample_groups,
        sampling_rate=cfg.sampling_rate,
        frame_rate=cfg.frame_rate,
        sliding_window=cfg.sliding_window,
        codebook_dim_unused=None,
    )


@pytest.fixture(scope="module")
def models():
    from transformers import MimiModel

    cfg = small_cfg()
    torch.manual_seed(0)
    hf = MimiModel(hf_cfg_from(cfg)).eval()
    # Give the (zero-initialized) codebooks usable random values.
    sd = hf.state_dict()
    g = torch.Generator().manual_seed(1)
    for k in list(sd):
        if k.endswith("codebook.embed_sum"):
            sd[k] = torch.randn(sd[k].shape, generator=g)
    hf.load_state_dict(sd)
    state = {k: v.float().numpy() for k, v in hf.state_dict().items()}
    params = params_from_hf_state_dict(state, cfg)
    return hf, params, cfg


def test_decode_parity(models):
    hf, params, cfg = models
    rng = np.random.default_rng(0)
    codes = rng.integers(0, cfg.codebook_size, (2, 8, 7))
    with torch.no_grad():
        ref = hf.decode(torch.from_numpy(codes)).audio_values.numpy()  # [B, 1, L]
    ours = np.asarray(mimi_decode(params, cfg, jnp.asarray(codes)))  # [B, L, 1]
    assert ours.shape[1] == ref.shape[2]
    np.testing.assert_allclose(
        ours[:, :, 0], ref[:, 0, :], rtol=2e-3, atol=2e-4
    )


def test_encode_parity(models):
    hf, params, cfg = models
    rng = np.random.default_rng(1)
    hop = int(np.prod(cfg.upsampling_ratios)) * cfg.downsample_stride
    audio = rng.standard_normal((1, hop * 5)).astype(np.float32) * 0.1
    with torch.no_grad():
        ref_codes = hf.encode(torch.from_numpy(audio)[:, None, :], num_quantizers=8)
        ref_codes = ref_codes.audio_codes.numpy()
    ours = np.asarray(mimi_encode(params, cfg, jnp.asarray(audio), num_quantizers=8))
    assert ours.shape == ref_codes.shape
    # Nearest-neighbour ties can flip a code on fp noise; require near-total agreement.
    agree = (ours == ref_codes).mean()
    assert agree > 0.98, f"code agreement {agree}"


def test_encode_decode_roundtrip_shapes(models):
    _, params, cfg = models
    rng = np.random.default_rng(2)
    hop = int(np.prod(cfg.upsampling_ratios)) * cfg.downsample_stride
    audio = rng.standard_normal((1, hop * 3)).astype(np.float32)
    codes = mimi_encode(params, cfg, jnp.asarray(audio), num_quantizers=8)
    assert codes.shape == (1, 8, 3)
    pcm = mimi_decode(params, cfg, codes)
    assert pcm.shape == (1, hop * 3, 1)


def test_streaming_equals_batch(models):
    """Frame-by-frame streaming decode == batch decode (the reference's
    test_decoder.py listening check, made an assertion)."""
    _, params, cfg = models
    rng = np.random.default_rng(3)
    T = 6
    codes = jnp.asarray(rng.integers(0, cfg.codebook_size, (2, 8, T)))
    batch_pcm = np.asarray(mimi_decode(params, cfg, codes))

    state = decode_stream_init(cfg, batch=2)
    chunks = []
    step = jax.jit(lambda s, c: mimi_decode_step(params, cfg, s, c))
    for t in range(T):
        state, pcm = step(state, codes[:, :, t : t + 1])
        chunks.append(np.asarray(pcm))
    stream_pcm = np.concatenate(chunks, axis=1)
    assert stream_pcm.shape == batch_pcm.shape
    np.testing.assert_allclose(stream_pcm, batch_pcm, rtol=2e-3, atol=1e-4)


def test_streaming_chunk_sizes(models):
    """Streaming in frame pairs equals streaming frame-by-frame."""
    _, params, cfg = models
    rng = np.random.default_rng(4)
    T = 4
    codes = jnp.asarray(rng.integers(0, cfg.codebook_size, (1, 8, T)))
    s1 = decode_stream_init(cfg, batch=1)
    out1 = []
    for t in range(T):
        s1, pcm = mimi_decode_step(params, cfg, s1, codes[:, :, t : t + 1])
        out1.append(np.asarray(pcm))
    s2 = decode_stream_init(cfg, batch=1)
    out2 = []
    for t in range(0, T, 2):
        s2, pcm = mimi_decode_step(params, cfg, s2, codes[:, :, t : t + 2])
        out2.append(np.asarray(pcm))
    np.testing.assert_allclose(
        np.concatenate(out1, axis=1), np.concatenate(out2, axis=1), rtol=1e-4, atol=1e-5
    )


def test_streaming_flush_equivalence(models):
    """Streaming with a tiny ring tail (forcing mid-stream flushes) equals
    streaming with a roomy tail (no flush)."""
    from smoltts_tpu.codec.mimi import flush_mimi_state
    from smoltts_tpu.codec.transformer import ring_state_init

    _, params, cfg = models
    rng = np.random.default_rng(5)
    T = 9
    codes = jnp.asarray(rng.integers(0, cfg.codebook_size, (1, 8, T)))

    def run(tail_len, flush_every):
        state = decode_stream_init(cfg, batch=1)
        state = state._replace(transformer=ring_state_init(cfg, 1, tail_len=tail_len))
        out = []
        since = 0
        for t in range(T):
            if since >= flush_every:
                state = flush_mimi_state(state)
                since = 0
            state, pcm = mimi_decode_step(params, cfg, state, codes[:, :, t : t + 1])
            since += 1
            out.append(np.asarray(pcm))
        return np.concatenate(out, axis=1)

    roomy = run(tail_len=64, flush_every=10**9)
    tight = run(tail_len=8, flush_every=3)  # 2 tokens/frame -> flush every 3 frames
    np.testing.assert_allclose(tight, roomy, rtol=1e-4, atol=1e-5)
