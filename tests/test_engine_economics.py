"""Engine dispatch/fetch economics (VERDICT r2 weak-item 6).

These pin the engine's host-link behavior — the thing that gates the SERVED
bench on high-RTT runtimes — so a future change can't silently reintroduce
per-frame fetches or admission-latency lag:

1. steady-state device fetch calls per dispatched frame stay bounded by the
   chunked-dispatch economics (~1/chunk_frames per live batch-frame);
2. a freshly admitted stream's FIRST frame is fetched urgently — within one
   step() call of its admission — rather than riding `inflight` behind;
3. budget-limited streams free their slot at *dispatch* time (proactively),
   so a queued prompt is admitted before the finished stream's tail frames
   have even been fetched.
"""

import numpy as np

import jax
import jax.numpy as jnp

from smoltts_tpu.codec.config import MimiConfig
from smoltts_tpu.codec.mimi import init_mimi_params
from smoltts_tpu.config import ModelType, tiny_debug_config
from smoltts_tpu.lm.engine import DecodeEngine
from smoltts_tpu.lm.samplers import GenerationSettings
from smoltts_tpu.models.dual_ar import init_params
from smoltts_tpu.tokenizer import ByteTokenizer, TokenConfig


def setup():
    cfg = tiny_debug_config(codebook_size=32, vocab_size=256 + 64 + 32)
    tok = ByteTokenizer(32)
    token_cfg = TokenConfig.from_tokenizer(ModelType.smoltts_v0(), tok, cfg)
    params = init_params(cfg, jax.random.PRNGKey(0))
    mimi_cfg = MimiConfig(
        num_filters=8, upsampling_ratios=[4, 3, 2], hidden_size=32,
        num_hidden_layers=2, num_attention_heads=2, head_dim=16,
        intermediate_size=64, codebook_size=32, codebook_dim=16,
        num_quantizers=8, upsample_groups=32, frame_rate=500.0,
    )
    mimi_params = init_mimi_params(mimi_cfg, seed=1)
    return cfg, token_cfg, params, mimi_cfg, mimi_params


def audio_prompt(cfg, token_cfg, T, seed):
    rng = np.random.default_rng(seed)
    p = np.zeros((cfg.num_rows, T), dtype=np.int32)
    c0 = rng.integers(0, cfg.codebook_size, T)
    p[0] = token_cfg.semantic_start_id + c0
    p[1] = c0
    p[2:] = rng.integers(0, cfg.codebook_size, (cfg.num_rows - 2, T))
    return p


def make_engine(cfg, token_cfg, params, mimi_cfg, mimi_params, **kw):
    settings = GenerationSettings(
        default_temp=0.0, default_fast_temp=0.0, max_new_tokens=64
    )
    kw.setdefault("num_slots", 4)
    kw.setdefault("max_seq_len", 64)
    kw.setdefault("kv_dtype", jnp.float32)
    kw.setdefault("prompt_bucket", 8)
    return DecodeEngine(
        params, cfg, token_cfg, settings,
        mimi_params=mimi_params, mimi_cfg=mimi_cfg, **kw,
    )


def drain(engine, collected, max_steps=200):
    for _ in range(max_steps):
        for sid, frame in engine.step():
            collected.setdefault(sid, []).append(frame)
        if not engine.has_work():
            return
    raise AssertionError("engine did not drain")


def test_steady_state_fetch_economics():
    cfg, token_cfg, params, mimi_cfg, mimi_params = setup()
    K = 4
    engine = make_engine(
        cfg, token_cfg, params, mimi_cfg, mimi_params,
        chunk_frames=K, inflight=1, fetch_every=1,
    )
    n_frames = 24
    prompts = [audio_prompt(cfg, token_cfg, 6, s) for s in range(4)]
    for p in prompts:
        engine.submit(p, max_frames=n_frames)
    collected = {}
    drain(engine, collected)
    assert all(len(v) == n_frames for v in collected.values())

    s = engine.stats
    # Every decode dispatch advanced K frames for the whole live batch:
    # dispatches stay ~n_frames/K (+1 slack for the admission-interleaved
    # first window), NOT n_frames.
    assert s["dispatches"] <= n_frames // K + 2, s
    # Fetch round trips: one per record at most (urgent admission records +
    # chunk records), far below one per frame.
    n_records = s["dispatches"] + 1  # +1 admission record (one batch of 4)
    assert s["records_fetched"] == n_records, s
    assert s["fetch_calls"] <= n_records, s
    # The headline economics: device fetch calls per emitted stream-frame.
    frames_emitted = sum(len(v) for v in collected.values())
    assert s["fetch_calls"] / frames_emitted <= 1.0 / K + 0.05, s


def test_admission_first_frame_is_urgent():
    cfg, token_cfg, params, mimi_cfg, mimi_params = setup()
    engine = make_engine(
        cfg, token_cfg, params, mimi_cfg, mimi_params,
        chunk_frames=4, inflight=2, fetch_every=2,
    )
    # Occupy the engine with 2 long-running streams and let the pipeline lag.
    bg = [engine.submit(audio_prompt(cfg, token_cfg, 6, s), max_frames=40)
          for s in range(2)]
    for _ in range(3):
        engine.step()

    # A new stream's first frame must surface within ONE step() of admission
    # even though `inflight` records are being held back.
    sid = engine.submit(audio_prompt(cfg, token_cfg, 6, 9), max_frames=40)
    emitted = engine.step()
    assert any(s == sid for s, _ in emitted), (
        f"first frame of {sid} not fetched urgently: {[s for s, _ in emitted]}"
    )
    assert engine.stats["urgent_fetched"] >= 1
    # Cleanup: drain so no work leaks across tests.
    drain(engine, {})


def test_proactive_slot_release_admits_before_fetch():
    cfg, token_cfg, params, mimi_cfg, mimi_params = setup()
    engine = make_engine(
        cfg, token_cfg, params, mimi_cfg, mimi_params,
        num_slots=2, chunk_frames=2, inflight=4, fetch_every=4,
    )
    # Two slots, three streams; deep inflight so fetches lag far behind.
    short = [engine.submit(audio_prompt(cfg, token_cfg, 6, s), max_frames=4)
             for s in range(2)]
    waiting = engine.submit(audio_prompt(cfg, token_cfg, 6, 7), max_frames=4)

    # Dispatch until the short streams' budgets are fully dispatched. Their
    # slots must free at dispatch time, admitting the waiting stream BEFORE
    # any of their frames have been fetched/accounted.
    for _ in range(3):
        engine.dispatch_step()
    h = engine._streams[waiting]
    assert h.slot >= 0, "waiting stream was not admitted proactively"
    assert engine.stats["fetch_calls"] <= 1, engine.stats  # nothing accounted yet

    collected = {}
    drain(engine, collected)
    assert all(len(collected[s]) == 4 for s in short + [waiting])
    # Later frames of the released streams were dispatched before release
    # took effect; they are dropped, never duplicated or misrouted.
    for s in short + [waiting]:
        assert collected[s][-1]["finished"]


def test_shallow_max_ahead_never_wedges():
    """EngineLoop(max_ahead) below inflight+fetch_every must still drain:
    the loop shrinks the engine's fetch batching to fit (a live wedge: every
    stream froze after its first frame with max_ahead=2 vs fetch_every=8)."""
    import queue as _q

    from smoltts_tpu.lm.engine import EngineLoop

    cfg, token_cfg, params, mimi_cfg, mimi_params = setup()
    eng = make_engine(
        cfg, token_cfg, params, mimi_cfg, mimi_params,
        inflight=1, fetch_every=8, chunk_frames=2, prompt_bucket=8,
    )
    loop = EngineLoop(eng, max_ahead=2, fetchers=3)
    assert eng.fetch_every == 1  # clamped to the drain invariant
    prompt = audio_prompt(cfg, token_cfg, 6, seed=0)
    qs = [loop.submit(prompt, max_frames=4) for _ in range(4)]
    got = 0
    for q in qs:
        while True:
            try:
                fr = q.get(timeout=60)
            except _q.Empty:
                raise AssertionError("stream wedged: no frame within 60s")
            if fr is None:
                break
            got += 1
    loop.stop()
    assert got == 16


def test_first_audio_latency_decomposition():
    """engine.pop_timing(sid) decomposes submit->first-frame latency into
    queue_wait / dispatch_wait / fetch / deliver that sum to total — the
    instrumentation the served bench records so an admission-latency number
    is attributable (queue vs device vs link) rather than opaque."""
    import queue as _q

    from smoltts_tpu.lm.engine import EngineLoop

    cfg, token_cfg, params, mimi_cfg, mimi_params = setup()
    eng = make_engine(
        cfg, token_cfg, params, mimi_cfg, mimi_params,
        inflight=1, fetch_every=1, chunk_frames=2, prompt_bucket=8,
    )
    loop = EngineLoop(eng, max_ahead=3, fetchers=3)
    prompt = audio_prompt(cfg, token_cfg, 6, seed=0)
    qs = [loop.submit(prompt, max_frames=6) for _ in range(3)]
    for q in qs:
        while q.get(timeout=60) is not None:
            pass
    for q in qs:
        t = eng.pop_timing(q.sid)
        assert t is not None
        for k in ("queue_wait", "dispatch_wait", "fetch", "deliver", "total"):
            assert t[k] >= 0.0, (k, t)
        parts = t["queue_wait"] + t["dispatch_wait"] + t["fetch"] + t["deliver"]
        assert abs(parts - t["total"]) < 1e-6, t
        assert eng.pop_timing(q.sid) is None  # popped
    loop.stop()


def test_max_ahead_at_or_below_inflight_never_wedges():
    """max_ahead <= engine.inflight leaves no room for fetch_every even at 1:
    the loop must also shrink `inflight` (review finding: the production
    build_engine_loop paired max_ahead=2 with the engine-default inflight=2 —
    the dispatch gate capped the bulk queue at 2 while take_due held 2 back,
    so bulk fetches were never due and every served stream wedged after its
    urgent first frame). Streams here span many single-frame dispatches so
    the wedge would bite mid-stream, not be masked by proactive slot-free."""
    import queue as _q

    from smoltts_tpu.lm.engine import EngineLoop

    cfg, token_cfg, params, mimi_cfg, mimi_params = setup()
    eng = make_engine(
        cfg, token_cfg, params, mimi_cfg, mimi_params,
        inflight=2, fetch_every=1, chunk_frames=1, prompt_bucket=8,
    )
    loop = EngineLoop(eng, max_ahead=2, fetchers=3)
    assert eng.inflight + eng.fetch_every <= 2  # drain invariant restored
    prompt = audio_prompt(cfg, token_cfg, 6, seed=0)
    qs = [loop.submit(prompt, max_frames=8) for _ in range(2)]
    got = 0
    for q in qs:
        while True:
            try:
                fr = q.get(timeout=60)
            except _q.Empty:
                raise AssertionError("stream wedged: no frame within 60s")
            if fr is None:
                break
            got += 1
    loop.stop()
    assert got == 16
