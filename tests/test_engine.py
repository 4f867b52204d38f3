"""Continuous-batching engine tests: staggered admission, eviction, slot
reuse, and equivalence with single-stream generation at temperature 0."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from smoltts_tpu.config import tiny_debug_config, ModelType
from smoltts_tpu.lm.engine import DecodeEngine, EngineLoop
from smoltts_tpu.lm.generate import FrameGenerator
from smoltts_tpu.lm.samplers import GenerationSettings
from smoltts_tpu.models.dual_ar import init_params
from smoltts_tpu.tokenizer import ByteTokenizer, TokenConfig

CB = 32


def setup():
    cfg = tiny_debug_config(codebook_size=CB, vocab_size=256 + 64 + CB)
    tok = ByteTokenizer(CB)
    token_cfg = TokenConfig.from_tokenizer(ModelType.smoltts_v0(), tok, cfg)
    params = init_params(cfg, jax.random.PRNGKey(0))
    return cfg, token_cfg, params


def audio_prompt(cfg, token_cfg, T, seed):
    rng = np.random.default_rng(seed)
    R = cfg.num_rows
    p = np.zeros((R, T), dtype=np.int32)
    c0 = rng.integers(0, cfg.codebook_size, T)
    p[0] = token_cfg.semantic_start_id + c0
    p[1] = c0
    p[2:] = rng.integers(0, cfg.codebook_size, (R - 2, T))
    return p


@pytest.mark.slow
def test_staggered_admission_matches_single_stream():
    cfg, token_cfg, params = setup()
    settings = GenerationSettings(default_temp=0.0, default_fast_temp=0.0, max_new_tokens=5)
    prompts = [audio_prompt(cfg, token_cfg, 6, s) for s in range(3)]

    # Single-stream references (greedy => deterministic, rng-independent).
    singles = []
    for p in prompts:
        gen = FrameGenerator(
            params, cfg, token_cfg, settings, [p], max_seq_len=64, kv_dtype=jnp.float32
        )
        singles.append([np.asarray(f.audio_codes)[0] for f in gen])

    engine = DecodeEngine(
        params, cfg, token_cfg, settings, num_slots=2, max_seq_len=64,
        kv_dtype=jnp.float32, prompt_bucket=8,
    )
    # Stagger: submit 0 and 1, then 2 after a few steps (slot becomes free
    # only after eviction).
    sids = [engine.submit(prompts[0]), engine.submit(prompts[1])]
    collected = {sid: [] for sid in sids}
    for step in range(20):
        if step == 2:
            sid2 = engine.submit(prompts[2])
            collected[sid2] = []
            sids.append(sid2)
        for sid, frame in engine.step():
            collected[sid].append(frame)
        if not engine.has_work():
            break
    assert not engine.has_work()

    for sid, ref_frames in zip(sids, singles):
        got = [f["audio_codes"] for f in collected[sid]]
        assert len(got) == len(ref_frames), f"stream {sid}: {len(got)} vs {len(ref_frames)}"
        for g, r in zip(got, ref_frames):
            np.testing.assert_array_equal(g, r)


def test_slot_reuse_and_eviction():
    cfg, token_cfg, params = setup()
    settings = GenerationSettings(default_temp=0.0, default_fast_temp=0.0, max_new_tokens=2)
    engine = DecodeEngine(
        params, cfg, token_cfg, settings, num_slots=1, max_seq_len=64,
        kv_dtype=jnp.float32, prompt_bucket=8,
    )
    p = audio_prompt(cfg, token_cfg, 4, 9)
    s1 = engine.submit(p)
    s2 = engine.submit(p)  # must wait for slot 0 to free
    frames = {s1: 0, s2: 0}
    for _ in range(12):
        for sid, f in engine.step():
            frames[sid] += 1
        if not engine.has_work():
            break
    assert frames[s1] == 2 and frames[s2] == 2
    assert engine._free == [0]


def test_engine_loop_thread():
    cfg, token_cfg, params = setup()
    settings = GenerationSettings(default_temp=0.7, default_fast_temp=0.7, max_new_tokens=3)
    engine = DecodeEngine(
        params, cfg, token_cfg, settings, num_slots=2, max_seq_len=64,
        kv_dtype=jnp.float32, prompt_bucket=8,
    )
    loop = EngineLoop(engine)
    try:
        q = loop.submit(audio_prompt(cfg, token_cfg, 4, 3))
        frames = []
        while True:
            item = q.get(timeout=60)
            if item is None:
                break
            frames.append(item)
        assert 1 <= len(frames) <= 3
        assert frames[-1]["finished"]
    finally:
        loop.stop()


@pytest.mark.slow
def test_attend_bucket_switching_is_exact():
    """The engine with tiny attend buckets must (a) walk through the buckets
    as live positions grow / shrink back on release, and (b) produce exactly
    the frames of an unbucketed engine (greedy)."""
    cfg, token_cfg, params = setup()
    settings = GenerationSettings(default_temp=0.0, default_fast_temp=0.0, max_new_tokens=12)

    def run(buckets):
        engine = DecodeEngine(
            params, cfg, token_cfg, settings, num_slots=2, max_seq_len=64,
            kv_dtype=jnp.float32, prompt_bucket=4, attend_buckets=buckets,
        )
        sids = [
            engine.submit(audio_prompt(cfg, token_cfg, 4, 1)),           # short
            engine.submit(audio_prompt(cfg, token_cfg, 20, 2), 16),      # long prompt
        ]
        out = {sid: [] for sid in sids}
        limits = []
        for _ in range(40):
            for sid, f in engine.step():
                out[sid].append(f["audio_codes"])
            if engine.last_attend_limit is not None:
                limits.append(engine.last_attend_limit)
            if not engine.has_work():
                break
        return out, limits, sids

    ref, ref_limits, _ = run([64])
    got, limits, _ = run([8, 16, 32])
    assert set(ref_limits) == {64}
    # long stream: prompt 20 -> starts in bucket 32; crossing 32 positions
    # bumps to 64 (the implicit S bucket)
    assert limits[0] == 32 and 64 in limits
    for (rs, rf), (gs, gf) in zip(sorted(ref.items()), sorted(got.items())):
        assert len(rf) == len(gf)
        for a, b in zip(rf, gf):
            np.testing.assert_array_equal(a, b)


def test_attend_bucket_with_vocoder():
    """Bucketed engine with the fused vocoder attached still streams PCM."""
    from smoltts_tpu.codec.config import MimiConfig
    from smoltts_tpu.codec.mimi import init_mimi_params

    cfg, token_cfg, params = setup()
    mimi_cfg = MimiConfig(
        num_filters=8, upsampling_ratios=[4, 3, 2], hidden_size=32,
        num_hidden_layers=1, num_attention_heads=2, head_dim=16,
        intermediate_size=64, codebook_size=CB, codebook_dim=16,
        num_quantizers=8, upsample_groups=32, frame_rate=500.0,
    )
    mimi_params = init_mimi_params(mimi_cfg, seed=0)
    settings = GenerationSettings(default_temp=0.0, default_fast_temp=0.0, max_new_tokens=6)
    engine = DecodeEngine(
        params, cfg, token_cfg, settings, num_slots=2, max_seq_len=64,
        kv_dtype=jnp.float32, prompt_bucket=4, attend_buckets=[16],
        mimi_params=mimi_params, mimi_cfg=mimi_cfg,
    )
    sid = engine.submit(audio_prompt(cfg, token_cfg, 5, 7))
    pcm_frames = []
    for _ in range(10):
        for _sid, f in engine.step():
            assert _sid == sid
            assert "pcm" in f and f["pcm"].ndim == 1
            pcm_frames.append(f["pcm"])
        if not engine.has_work():
            break
    assert len(pcm_frames) == 6
    assert engine.last_attend_limit in (16, 64)


def test_chunked_dispatch_matches_single_frame():
    """chunk_frames > 1 (adaptive chunked dispatch) must emit the exact same
    greedy frame sequence as single-frame dispatch, including the vocoded
    PCM and mid-chunk stream completion."""
    from smoltts_tpu.codec.config import MimiConfig
    from smoltts_tpu.codec.mimi import init_mimi_params

    cfg, token_cfg, params = setup()
    mimi_cfg = MimiConfig(
        num_filters=8, upsampling_ratios=[4, 3, 2], hidden_size=32,
        num_hidden_layers=2, num_attention_heads=2, head_dim=16,
        intermediate_size=64, codebook_size=CB, codebook_dim=16,
        num_quantizers=8, upsample_groups=32, frame_rate=500.0,
    )
    mimi_params = init_mimi_params(mimi_cfg, seed=1)
    settings = GenerationSettings(
        default_temp=0.0, default_fast_temp=0.0, max_new_tokens=7
    )
    prompts = [audio_prompt(cfg, token_cfg, 6, s) for s in range(2)]

    def run(chunk):
        engine = DecodeEngine(
            params, cfg, token_cfg, settings, num_slots=2, max_seq_len=64,
            kv_dtype=jnp.float32, prompt_bucket=8,
            mimi_params=mimi_params, mimi_cfg=mimi_cfg, chunk_frames=chunk,
        )
        sids = [engine.submit(p) for p in prompts]
        got = {sid: [] for sid in sids}
        for _ in range(40):
            for sid, frame in engine.step():
                got[sid].append(frame)
            if not engine.has_work():
                break
        assert not engine.has_work()
        return sids, got

    sids1, ref = run(1)
    sids4, chunked = run(4)
    for s1, s4 in zip(sids1, sids4):
        assert len(ref[s1]) == len(chunked[s4])
        for a, b in zip(ref[s1], chunked[s4]):
            np.testing.assert_array_equal(a["audio_codes"], b["audio_codes"])
            assert a["finished"] == b["finished"]
            np.testing.assert_allclose(a["pcm"], b["pcm"], rtol=2e-4, atol=1e-5)
