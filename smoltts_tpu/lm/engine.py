"""Continuous-batching decode engine: B fixed slots, per-stream state.

The reference serves one stream at a time through a Python iterator
(mlx .../lm/generate.py:25-171). This engine is the TPU-native replacement
(SURVEY.md §2.7 item 5): a fixed batch of B decode slots whose KV caches,
positions, finished flags, and Mimi vocoder states live on device; streams
are admitted into free slots (prefill into a slot subset via scatter),
stepped together every 80 ms frame, and evicted on <|im_end|> or frame
budget. XLA shapes stay static throughout: admission specializes on
(n_new, prompt_bucket) and step on B.

Host-side, `DecodeEngine` is synchronous (`submit` + `step`); the serving
layer wraps it in a background thread (`EngineLoop`) that fans frames out to
per-stream queues.
"""

from __future__ import annotations

import collections
import itertools
import queue
import threading
from dataclasses import dataclass, field
from functools import partial
from typing import Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from smoltts_tpu.config import DualARConfig
from smoltts_tpu.lm.decode import (
    DecodeState,
    decode_frame,
    flush_kv,
    init_decode_state,
    prefill,
)
from smoltts_tpu.lm.generate import pad_prompts
from smoltts_tpu.lm.samplers import GenerationSettings
from smoltts_tpu.tokenizer import TokenConfig


@dataclass
class StreamHandle:
    stream_id: int
    slot: int
    frames_emitted: int = 0  # fetched + accounted frames
    frames_dispatched: int = 0  # frames enqueued on device (runs ahead)
    max_frames: int = 1024
    done: bool = False


class Record(NamedTuple):
    """One dispatched device step awaiting its result fetch.

    `urgent` marks admission records — they hold a just-admitted stream's
    FIRST frame, so `take_due` releases them immediately instead of holding
    them `inflight` dispatches behind (first-audio latency would otherwise
    grow by inflight * chunk_frames * frame-time). Fetching an admission
    record ahead of older queued records is safe: it is, by construction,
    the first record mentioning its streams, and frames of other streams
    keep their dispatch order within their own records."""

    payload: tuple  # device arrays: (codes, is_audio, finished, slow, pcm)
    rows: list  # [(row index in payload, stream id)]
    n_frames: int  # 1 or chunk K (payload frame-major [K, B, ...])
    urgent: bool = False
    # Dispatch sequence number for NON-urgent records (None for urgent ones):
    # parallel fetchers must account non-urgent records in dispatch order —
    # they all carry frames of the same live slots — while urgent records
    # (a stream's first frame, no earlier record can mention it) may account
    # the moment their fetch lands.
    seq: Optional[int] = None
    # Mutable per-record timing stamps (fetch_start/fetch_end), written by
    # fetch() and folded into DecodeEngine.timings for admission records —
    # the first-audio latency decomposition (see pop_timing).
    meta: dict = None


@jax.jit
def _mark_finished(finished: jnp.ndarray, slot: jnp.ndarray) -> jnp.ndarray:
    return finished.at[slot].set(True)


class DecodeEngine:
    """Slot-based continuous batching over the jitted prefill/decode kernels."""

    def __init__(
        self,
        params,
        cfg: DualARConfig,
        token_cfg: TokenConfig,
        settings: GenerationSettings,
        num_slots: int = 32,
        max_seq_len: Optional[int] = None,
        kv_dtype=jnp.bfloat16,
        rng: Optional[jax.Array] = None,
        prompt_bucket: int = 64,
        mimi_params=None,
        mimi_cfg=None,
        attend_buckets: Optional[List[int]] = None,
        inflight: int = 2,
        fetch_every: int = 1,
        emit_int16: bool = False,
        emit_format: str = None,
        chunk_frames: int = 1,
        tail_len: int = 128,
        admit_sizes: Optional[List[int]] = None,
    ):
        # chunk_frames > 1 enables ADAPTIVE CHUNKED DISPATCH: when no
        # admissions are pending, one device program advances K frames
        # (lax.scan) — per-frame dispatch/fetch overhead drops K-fold, which
        # is what gates served throughput on high-RTT runtimes. Admissions
        # force single-frame dispatches, so a queued prompt waits at most
        # the in-flight chunks (~inflight*K frames) before prefilling.
        self.chunk_frames = max(1, int(chunk_frames))
        # emit_format: on-device PCM representation of fetched frames —
        # "f32" (default; library consumers get float), "int16" (the stream
        # route serves PCM16 anyway and the result fetch moves 4x fewer
        # bytes over the host link, which gates served throughput on
        # tunneled runtimes), or "ulaw" (G.711 mu-law, 8x fewer bytes than
        # f32 — telephony-grade; for links where even PCM16 saturates; see
        # io/g711.py). emit_int16=True is the legacy spelling of "int16".
        self.emit_format = emit_format or ("int16" if emit_int16 else "f32")
        assert self.emit_format in ("f32", "int16", "ulaw"), self.emit_format
        self.emit_int16 = self.emit_format == "int16"
        from smoltts_tpu.ops.quant import fuse_decode_params

        # Decode-path weight fusion (bit-exact; ops/quant.py).
        self.params = fuse_decode_params(params)
        self.cfg = cfg
        self.token_cfg = token_cfg
        self.settings = settings
        self.num_slots = num_slots
        self.S = max_seq_len or cfg.max_seq_len
        self.prompt_bucket = prompt_bucket
        # Admission batch sizes the engine may dispatch (compile key is
        # (n_new, T) — each size is one more program to compile). Default:
        # every power of two up to num_slots. A serving deployment that
        # must bound cold-compile count (e.g. the bench under its wall-clock
        # budget) can restrict this to e.g. {1, 4, num_slots}: admissions
        # decompose greedily over the allowed sizes (7 -> 4+1+1+1), so any
        # batch still admits — just in more dispatches. 1 is always included
        # (progress guarantee).
        if admit_sizes is None:
            admit_sizes, n = [], 1
            while n <= num_slots:
                admit_sizes.append(n)
                n *= 2
        self.admit_sizes = sorted({1} | {int(s) for s in admit_sizes if s <= num_slots})
        self.rng = rng if rng is not None else jax.random.PRNGKey(0)

        # Length bucketing: the frame step compiles once per attend bucket and
        # the engine dispatches the smallest bucket covering every LIVE
        # position — early in generation the KV reads (the bandwidth-bound
        # cost of the step, lm/decode.py:_decode_trunk_tailed) touch e.g. 256
        # slots instead of the full S. Exactness is pinned by
        # tests/test_decode.py::test_attend_limit_bucketing_is_exact and the
        # engine-level test in tests/test_engine.py.
        if attend_buckets is None:
            attend_buckets, b = [], 256
            while b < self.S:
                attend_buckets.append(b)
                b *= 2
        self.attend_buckets = sorted(
            {min(int(b), self.S) for b in attend_buckets} | {self.S}
        )
        # Host mirror of each slot's cache position (== device state.pos for
        # live slots; freed slots are ignored). Admission seeds it with the
        # TRUE prompt length; every decoded frame advances it by 1.
        self._slot_pos = np.zeros((num_slots,), np.int64)
        self.last_attend_limit: Optional[int] = None

        # In-flight step pipeline: dispatched device steps whose outputs have
        # not been fetched yet. Fetching every frame synchronously costs one
        # host<->device round trip per frame (~35 ms on a tunneled runtime vs
        # ~0.4 ms pipelined dispatch — measured), so the engine materializes
        # results `inflight` steps behind dispatch. Bookkeeping (eviction,
        # slot reuse, queue fan-out) lags by the same bound; frames fetched
        # for already-released streams are dropped.
        # fetch_every batches K due records into ONE device fetch: on
        # high-RTT links (tunneled runtimes) per-frame fetches cap the whole
        # engine at ~1/RTT steps/s; batched fetches amortize the round trip
        # while `inflight + fetch_every` dispatched steps keep the device
        # busy through it. Emission latency grows by <= fetch_every frames.
        self.inflight = max(0, int(inflight))
        self.fetch_every = max(1, int(fetch_every))
        self._queue: "collections.deque" = collections.deque()

        self.state = init_decode_state(
            cfg, num_slots, self.S, dtype=kv_dtype, tail_len=tail_len
        )
        # All slots start finished (idle).
        self.state = self.state._replace(
            finished=jnp.ones((num_slots,), bool)
        )
        self._ids = itertools.count()
        # Dispatch order of non-urgent records. A plain int (not
        # itertools.count) so EngineLoop can resume accounting from the
        # engine's CURRENT position when attached to an engine that has
        # already dispatched (otherwise its fetchers wait forever for
        # sequence numbers that were consumed before the loop existed).
        self._seq = 0
        self._free: List[int] = list(range(num_slots))
        self._streams: Dict[int, StreamHandle] = {}
        self._slot_to_stream: Dict[int, int] = {}
        self._pending: List[Tuple[int, np.ndarray]] = []
        # Dispatch/fetch economics, for tests and metrics: steady-state
        # fetch_calls per dispatched frame should stay ~1/chunk_frames.
        self.stats = {
            "dispatches": 0,
            "frames_dispatched": 0,
            "fetch_calls": 0,
            "records_fetched": 0,
            "urgent_fetched": 0,
        }
        # Per-stream first-audio latency decomposition (monotonic stamps:
        # submit -> admit [prefill dispatched] -> fetch_start -> fetch_end ->
        # first [frame accounted]), kept until pop_timing() or cap eviction.
        # Costs two clock reads per stream — always on.
        self.timings: "collections.OrderedDict" = collections.OrderedDict()
        self._timings_cap = 4096

        from smoltts_tpu.lm.pipeline import _donate_names

        # Optional slot-batched vocoder: Mimi streaming state lives on the
        # same slots; frames are vocoded inside the decode dispatch.
        if mimi_params is not None:
            from smoltts_tpu.ops.quant import fuse_mimi_decode_params

            mimi_params = fuse_mimi_decode_params(mimi_params)
        self.mimi_params = mimi_params
        self.mimi_cfg = mimi_cfg
        self.mimi_state = None
        if mimi_params is not None:
            from smoltts_tpu.codec.mimi import decode_stream_init

            # kv8 (kv_dtype=int8) applies to the KV rings only; the conv /
            # SEANet streaming buffers stay bf16.
            self.mimi_state = decode_stream_init(
                mimi_cfg,
                num_slots,
                dtype=jnp.bfloat16 if kv_dtype == jnp.int8 else kv_dtype,
                kv_dtype=jnp.int8 if kv_dtype == jnp.int8 else None,
            )

            def decode_vocode(params, mimi_params, lm_k, lm_v, ring_k, ring_v, rest, mrest, rng, attend_limit):
                from smoltts_tpu.codec.mimi import mimi_decode_step
                from smoltts_tpu.lm.pipeline import _merge_lm, _merge_mimi, _split_lm, _split_mimi

                state = _merge_lm(lm_k, lm_v, rest)
                mstate = _merge_mimi(ring_k, ring_v, mrest)
                # The PRNG key is split INSIDE the program and threaded
                # through the return value (same key sequence as a host-side
                # split, but no per-frame host work that would serialize the
                # dispatch pipeline — see make_stream_step).
                rng, sub = jax.random.split(rng)
                state, out = decode_frame(
                    params, cfg, token_cfg, settings, state, sub, attend_limit=attend_limit
                )
                mstate, pcm = mimi_decode_step(
                    mimi_params, mimi_cfg, mstate, out.audio_codes[:, :, None]
                )
                pcm = self._emit_pcm(pcm)
                _, _, rest = _split_lm(state)
                _, _, mrest = _split_mimi(mstate)
                return rest, mrest, out, pcm, rng

            _decode_vocode_jit = jax.jit(decode_vocode, static_argnames=("attend_limit",))

            def decode_vocode_wrapped(params, mimi_params, state, mstate, rng, attend_limit):
                from smoltts_tpu.lm.pipeline import _merge_lm, _merge_mimi, _split_lm, _split_mimi

                lm_k, lm_v, rest = _split_lm(state)
                ring_k, ring_v, mrest = _split_mimi(mstate)
                rest, mrest, out, pcm, rng = _decode_vocode_jit(
                    params, mimi_params, lm_k, lm_v, ring_k, ring_v, rest, mrest, rng,
                    attend_limit=attend_limit,
                )
                return _merge_lm(lm_k, lm_v, rest), _merge_mimi(ring_k, ring_v, mrest), out, pcm, rng

            self._decode_vocode = decode_vocode_wrapped

            def decode_vocode_chunk(params, mimi_params, lm_k, lm_v, ring_k, ring_v, rest, mrest, rng, attend_limit):
                from smoltts_tpu.codec.mimi import mimi_decode_step
                from smoltts_tpu.lm.pipeline import _merge_lm, _merge_mimi, _split_lm, _split_mimi

                def body(carry, _):
                    rest, mrest, rng = carry
                    state = _merge_lm(lm_k, lm_v, rest)
                    mstate = _merge_mimi(ring_k, ring_v, mrest)
                    rng, sub = jax.random.split(rng)
                    state, out = decode_frame(
                        params, cfg, token_cfg, settings, state, sub,
                        attend_limit=attend_limit,
                    )
                    mstate, pcm = mimi_decode_step(
                        mimi_params, mimi_cfg, mstate, out.audio_codes[:, :, None]
                    )
                    pcm = self._emit_pcm(pcm)
                    _, _, rest = _split_lm(state)
                    _, _, mrest = _split_mimi(mstate)
                    return (rest, mrest, rng), (
                        out.audio_codes, out.is_audio, out.finished,
                        out.slow_token, pcm,
                    )

                (rest, mrest, rng), (codes, is_audio, fin, slow, pcm) = jax.lax.scan(
                    body, (rest, mrest, rng), None, length=self.chunk_frames
                )
                # Frame-major [K, B, ...] — accounting iterates frames.
                return rest, mrest, (codes, is_audio, fin, slow), pcm, rng

            _chunk_jit = jax.jit(decode_vocode_chunk, static_argnames=("attend_limit",))

            def chunk_wrapped(params, mimi_params, state, mstate, rng, attend_limit):
                from smoltts_tpu.lm.pipeline import _merge_lm, _merge_mimi, _split_lm, _split_mimi

                lm_k, lm_v, rest = _split_lm(state)
                ring_k, ring_v, mrest = _split_mimi(mstate)
                rest, mrest, outs, pcm, rng = _chunk_jit(
                    params, mimi_params, lm_k, lm_v, ring_k, ring_v, rest, mrest, rng,
                    attend_limit=attend_limit,
                )
                return (
                    _merge_lm(lm_k, lm_v, rest),
                    _merge_mimi(ring_k, ring_v, mrest),
                    outs,
                    pcm,
                    rng,
                )

            self._decode_vocode_chunk = chunk_wrapped

        def decode_only(params, lm_k, lm_v, rest, rng, attend_limit):
            from smoltts_tpu.lm.pipeline import _merge_lm, _split_lm

            state = _merge_lm(lm_k, lm_v, rest)
            rng, sub = jax.random.split(rng)
            state, out = decode_frame(
                params, cfg, token_cfg, settings, state, sub, attend_limit=attend_limit
            )
            _, _, rest = _split_lm(state)
            return rest, out, rng

        _decode_jit = jax.jit(decode_only, static_argnames=("attend_limit",))

        def decode_wrapped(params, state, rng, attend_limit):
            from smoltts_tpu.lm.pipeline import _merge_lm, _split_lm

            lm_k, lm_v, rest0 = _split_lm(state)
            rest, out, rng = _decode_jit(
                params, lm_k, lm_v, rest0, rng, attend_limit=attend_limit
            )
            return _merge_lm(lm_k, lm_v, rest), out, rng

        self._decode = decode_wrapped
        self._admit_cache: Dict[Tuple[int, int], callable] = {}
        self._admit_vocode_cache: Dict[int, callable] = {}
        # Ring-tail flush cadence for the LM (and, when vocoding, the codec
        # transformer) tails — see lm/decode.py:DecodeState.
        from smoltts_tpu.lm.pipeline import flush_cadence, make_flush_step

        self._flush = make_flush_step()
        self._since_flush = 0
        self._flush_every = flush_cadence(self.state, self.mimi_state)
        # A chunk's K in-scan frames all land in the ring tails before the
        # next flush opportunity.
        self.chunk_frames = min(self.chunk_frames, max(1, self._flush_every))

    # ------------------------------------------------------------------

    def shard(self, mesh, tensor_parallel: bool = False, shard_tables: bool = False):
        """Lay the engine's trees out over a device mesh (parallel/serving.py):
        decode slots (and the vocoder's per-slot state) shard over `data`,
        params shard Megatron-style over `model` when tensor_parallel, else
        replicate. Call BEFORE warm()/submit() — the jitted programs inherit
        the layouts from their operands (GSPMD), including the host-driven
        admission scatters, slot-free mark, and per-record result fetches.
        Certified against the single-device engine by
        __graft_entry__._dryrun_engine and tests/test_parallel_serving.py."""
        from smoltts_tpu.parallel.serving import shard_serving

        self.params, self.state, self.mimi_params, self.mimi_state = shard_serving(
            self.params, self.state, mesh,
            mimi_params=self.mimi_params, mimi_state=self.mimi_state,
            tensor_parallel=tensor_parallel, shard_tables=shard_tables,
        )
        return self

    @property
    def active(self) -> int:
        return len(self._streams)

    def _emit_pcm(self, pcm):
        """On-device PCM representation per emit_format (traced inside the
        decode/vocode programs)."""
        if self.emit_format == "int16":
            return (jnp.clip(pcm.astype(jnp.float32), -1.0, 1.0) * 32767.0).astype(
                jnp.int16
            )
        if self.emit_format == "ulaw":
            from smoltts_tpu.io.g711 import ulaw_encode_jnp

            return ulaw_encode_jnp(pcm)
        return pcm

    def warm(
        self,
        prompt_len: Optional[int] = None,
        buckets: Optional[List[int]] = None,
        parallel: int = 0,
        progress=None,
    ) -> None:
        """Pre-compile every program a serving run can hit: admission at the
        engine's `admit_sizes` (compile key is (n_new, T)), the decode/vocode
        step (single-frame and chunked) at each attend bucket, and the ring
        flush. Results are discarded; engine state is untouched. Call once
        at server boot so no compile lands inside a live request.

        `buckets` restricts which attend buckets are compiled (default all —
        a run whose positions provably stay under bucket b only needs b).
        `parallel` > 0 issues the compiles from that many threads: on
        remote-compile runtimes (this host's tunneled TPU) the service
        compiles concurrently, so the cold wall-clock approaches
        max(program) instead of sum(program). `progress` is an optional
        callable(str) invoked as each program lands."""
        T = prompt_len or self.prompt_bucket
        dummy_rng = jax.random.PRNGKey(0)
        note = progress or (lambda s: None)

        jobs = []
        for n in self.admit_sizes:
            def admit_job(n=n):
                slots = jnp.arange(n, dtype=jnp.int32)
                prompt = jnp.zeros((n, self.cfg.num_rows, T), jnp.int32)
                lens = jnp.full((n,), T, jnp.int32)
                _, out = self._admit_fn(n, T)(
                    self.params, self.state, slots, prompt, lens, dummy_rng
                )
                if self.mimi_state is not None:
                    out2 = self._admit_vocode_fn(n)(
                        self.mimi_params, self.mimi_state, slots, out.audio_codes
                    )
                    jax.block_until_ready(out2)
                jax.block_until_ready(out.audio_codes)
                note(f"warm admit n={n}")

            jobs.append(admit_job)
        for lim in buckets if buckets is not None else self.attend_buckets:
            def bucket_job(lim=lim):
                if self.mimi_state is not None:
                    r = self._decode_vocode(
                        self.params, self.mimi_params, self.state,
                        self.mimi_state, dummy_rng, lim,
                    )
                    jax.block_until_ready(r[3])
                    note(f"warm step bucket={lim}")
                    if self.chunk_frames > 1:
                        r = self._decode_vocode_chunk(
                            self.params, self.mimi_params, self.state,
                            self.mimi_state, dummy_rng, lim,
                        )
                        jax.block_until_ready(r[3])
                        note(f"warm chunk bucket={lim}")
                else:
                    r = self._decode(self.params, self.state, dummy_rng, lim)
                    jax.block_until_ready(r[1].audio_codes)
                    note(f"warm step bucket={lim}")

            jobs.append(bucket_job)

        def flush_job():
            jax.block_until_ready(self._flush(self.state, self.mimi_state)[0].pos)
            note("warm flush")

        jobs.append(flush_job)

        if parallel > 0:
            from concurrent.futures import ThreadPoolExecutor

            # Tracing is thread-safe in JAX; the remote compile (where the
            # time goes) releases the GIL. Exceptions propagate.
            with ThreadPoolExecutor(max_workers=parallel) as ex:
                for f in [ex.submit(j) for j in jobs]:
                    f.result()
        else:
            for j in jobs:
                j()
        jax.block_until_ready(self.state.pos)

    def submit(self, prompt: np.ndarray, max_frames: Optional[int] = None) -> int:
        """Queue a [num_rows, T] prompt; returns a stream id."""
        import time as _time

        sid = next(self._ids)
        self._pending.append((sid, np.asarray(prompt, np.int32)))
        h = StreamHandle(stream_id=sid, slot=-1)
        h.max_frames = max_frames or self.settings.max_new_tokens
        self._streams[sid] = h
        self.timings[sid] = {"submit": _time.monotonic()}
        while len(self.timings) > self._timings_cap:
            self.timings.popitem(last=False)
        return sid

    def drain_timings(self) -> List[dict]:
        """Pop every COMPLETED first-audio decomposition (see pop_timing) —
        for load harnesses that don't track stream ids (e.g. HTTP clients)."""
        out = []
        for sid in [s for s, t in list(self.timings.items()) if "first" in t]:
            t = self.pop_timing(sid)
            if t is not None:
                out.append(t)
        return out

    def pop_timing(self, sid: int) -> Optional[dict]:
        """First-audio latency decomposition for a served stream, seconds
        since submit: `queue_wait` (submit -> prefill dispatch: admission
        queueing behind busy slots / the dispatch gate), `dispatch_wait`
        (prefill dispatched -> urgent fetch begins: device execution plus
        fetcher pickup), `fetch` (the device->host result transfer itself —
        the link-RTT/bandwidth share), `deliver` (fetch landed -> frame
        accounted), and `total` (submit -> first frame accounted). None
        until the stream's first frame has been accounted."""
        t = self.timings.get(sid)
        if not t or "first" not in t:
            return None
        self.timings.pop(sid, None)
        return {
            "queue_wait": t["admit"] - t["submit"],
            "dispatch_wait": t["fetch_start"] - t["admit"],
            "fetch": t["fetch_end"] - t["fetch_start"],
            "deliver": t["first"] - t["fetch_end"],
            "total": t["first"] - t["submit"],
        }

    # ------------------------------------------------------------------

    def _admit_fn(self, n_new: int, T: int):
        key = (n_new, T)
        if key not in self._admit_cache:

            def admit(params, state: DecodeState, slots, prompt, prompt_len, rng):
                sub = init_decode_state(self.cfg, n_new, self.S, dtype=state.k.dtype)
                sub, out = prefill(
                    params,
                    self.cfg,
                    self.token_cfg,
                    self.settings,
                    sub,
                    prompt,
                    prompt_len,
                    rng,
                )
                new_state = state._replace(
                    k=state.k.at[:, slots].set(sub.k),
                    v=state.v.at[:, slots].set(sub.v),
                    # Invalidate any stale ring-tail entries of the reused
                    # slots; the prompt K/V went straight to the history.
                    tail_pos=state.tail_pos.at[slots].set(-1),
                    flushed=state.flushed.at[slots].set(sub.flushed),
                    pos=state.pos.at[slots].set(sub.pos),
                    prev_tokens=state.prev_tokens.at[slots].set(sub.prev_tokens),
                    finished=state.finished.at[slots].set(sub.finished),
                    k_scale=None
                    if state.k_scale is None
                    else state.k_scale.at[:, slots].set(sub.k_scale),
                    v_scale=None
                    if state.v_scale is None
                    else state.v_scale.at[:, slots].set(sub.v_scale),
                )
                return new_state, out

            from smoltts_tpu.lm.pipeline import _donate_names

            self._admit_cache[key] = jax.jit(admit, donate_argnames=_donate_names("state"))
        return self._admit_cache[key]

    def _admit_vocode_fn(self, n_new: int):
        """Vocode the admission (first) frames of n_new fresh slots: step a
        zero streaming state for those frames, scatter it into the slot-
        batched vocoder state."""
        if n_new not in self._admit_vocode_cache:
            from smoltts_tpu.codec.mimi import (
                decode_stream_init,
                mimi_decode_step,
                scatter_stream_state,
            )

            def fn(mimi_params, mstate, slots, codes):
                kv8 = mstate.transformer.k_scale is not None
                sub = decode_stream_init(
                    self.mimi_cfg,
                    n_new,
                    dtype=mstate.upsample_tail.dtype,
                    kv_dtype=jnp.int8 if kv8 else None,
                )
                sub, pcm = mimi_decode_step(
                    mimi_params, self.mimi_cfg, sub, codes[:, :, None]
                )
                pcm = self._emit_pcm(pcm)
                return scatter_stream_state(mstate, sub, slots), pcm

            self._admit_vocode_cache[n_new] = jax.jit(fn)
        return self._admit_vocode_cache[n_new]

    def _admit_pending(self) -> None:
        """Prefill queued prompts into free slots; enqueue their first frames
        (fetched later by the in-flight pipeline).

        Admission batch sizes are quantized to `admit_sizes` (default all
        powers of two; an admission of 7 runs as 4+2+1): the admit program
        compiles per (n_new, T), and continuous churn would otherwise hit
        arbitrary n — a compile storm at serving time."""
        while self._pending and self._free:
            n = min(len(self._pending), len(self._free))
            n = max(s for s in self.admit_sizes if s <= n)  # largest allowed
            batch = [self._pending.pop(0) for _ in range(n)]
            slots = [self._free.pop(0) for _ in range(n)]
            for (sid, _), slot in zip(batch, slots):
                self._streams[sid].slot = slot
                self._slot_to_stream[slot] = sid

            prompt, lens = pad_prompts(
                [p for _, p in batch], pad_to_multiple=self.prompt_bucket
            )
            if self.mimi_state is not None:
                from smoltts_tpu.codec.mimi import reset_stream_slots

                self.mimi_state = reset_stream_slots(
                    self.mimi_state, jnp.asarray(slots, jnp.int32)
                )
            self._slot_pos[slots] = lens  # true lengths: reads past pos are masked
            self.rng, sub = jax.random.split(self.rng)
            admit = self._admit_fn(n, prompt.shape[-1])
            self.state, out = admit(
                self.params,
                self.state,
                jnp.asarray(slots, jnp.int32),
                jnp.asarray(prompt),
                jnp.asarray(lens),
                sub,
            )
            pcm0 = None
            if self.mimi_state is not None:
                vocode = self._admit_vocode_fn(n)
                self.mimi_state, pcm0 = vocode(
                    self.mimi_params,
                    self.mimi_state,
                    jnp.asarray(slots, jnp.int32),
                    out.audio_codes,
                )
            # (row index in out) -> stream id, in submission order. Urgent:
            # these are first frames — take_due releases them immediately.
            import time as _time

            t_admit = _time.monotonic()
            for sid, _ in batch:
                if sid in self.timings:
                    self.timings[sid]["admit"] = t_admit
            self._queue.append(Record(
                (out.audio_codes, out.is_audio, out.finished, out.slow_token, pcm0),
                [(i, sid) for i, (sid, _) in enumerate(batch)],
                1,
                urgent=True,
                meta={},
            ))

    def _bookkeep(self, sid: int, frame: dict) -> Optional[dict]:
        """Account one fetched frame; None = drop (stream already released —
        the device ran ahead of the host's lagged eviction)."""
        h = self._streams.get(sid)
        if h is None or h.done:
            return None
        h.frames_emitted += 1
        if frame["finished"] or h.frames_emitted >= h.max_frames:
            h.done = True
            frame["finished"] = True
            self._release(sid)
        return frame

    def _free_slot(self, h: StreamHandle) -> None:
        """Return a stream's slot to the pool and silence it on device.

        Decoupled from stream release: a budget-limited stream's slot frees
        PROACTIVELY when its last frame is *dispatched* (the host knows the
        frame budget), so a queued prompt reuses the slot without waiting
        for the lagged fetch to observe the finish. The stream handle stays
        in `_streams` until its in-flight frames are fetched and emitted —
        records map rows to stream ids, not slots, so reuse is unambiguous.
        """
        if h.slot < 0:
            return
        self._slot_to_stream.pop(h.slot, None)
        self._free.append(h.slot)
        # Mark the slot finished on device so it stops consuming sampler
        # work. The slot index is passed as an ARRAY argument: an eager
        # `at[int].set` bakes the index into the program as a constant and
        # compiles once PER SLOT VALUE — ~64 surprise remote compiles
        # (seconds each, engine lock held) sprinkled through a serving run.
        self.state = self.state._replace(
            finished=_mark_finished(self.state.finished, jnp.asarray(h.slot))
        )
        h.slot = -1

    @staticmethod
    def fetch(records: list) -> list:
        """Fetch dispatched steps' outputs: ONE device round trip for the
        whole batch. Pure device I/O — safe to run OUTSIDE the engine lock,
        concurrently with dispatching (EngineLoop overlaps the two threads so
        the round-trip latency doesn't gate throughput)."""
        import time as _time

        t0 = _time.monotonic()
        out = jax.device_get([r.payload for r in records])
        t1 = _time.monotonic()
        for r in records:
            if r.meta is not None:
                r.meta["fetch_start"] = t0
                r.meta["fetch_end"] = t1
        return out

    def account(self, records: list, fetched: list) -> List[Tuple[int, dict]]:
        """Lagged bookkeeping over fetched results, in dispatch order.
        Mutates engine state (eviction, slot reuse) — call under the lock.

        A record holds 1 frame ([B, ...] payload) or a chunk of K frames
        (frame-major [K, B, ...]); frames emit in order per stream."""
        emitted = []
        if records:
            self.stats["fetch_calls"] += 1
            self.stats["records_fetched"] += len(records)
            self.stats["urgent_fetched"] += sum(r.urgent for r in records)
        for (codes, is_audio, fin, slow, pcm), rec in zip(fetched, records):
            rows, n_frames = rec.rows, rec.n_frames
            for k in range(n_frames):
                ck, ak, fk, sk = (
                    (codes, is_audio, fin, slow)
                    if n_frames == 1
                    else (codes[k], is_audio[k], fin[k], slow[k])
                )
                pk = pcm if (pcm is None or n_frames == 1) else pcm[k]
                for row, sid in rows:
                    frame = {
                        "audio_codes": ck[row],
                        "is_audio": bool(ak[row]),
                        "finished": bool(fk[row]),
                        "slow_token": int(sk[row]),
                    }
                    if pk is not None:
                        frame["pcm"] = pk[row, :, 0]
                    frame = self._bookkeep(sid, frame)
                    if frame is not None:
                        emitted.append((sid, frame))
                        # Admission records carry first frames: complete the
                        # stream's latency decomposition (see pop_timing).
                        t = rec.meta is not None and self.timings.get(sid)
                        if t and "first" not in t and "admit" in t:
                            import time as _time

                            t["fetch_start"] = rec.meta["fetch_start"]
                            t["fetch_end"] = rec.meta["fetch_end"]
                            t["first"] = _time.monotonic()
        return emitted

    def take_due(self, kind: str = "all") -> list:
        """Pop the records whose fetch is due (stay `inflight` behind while
        work continues; batch by `fetch_every`; drain fully when idle).

        URGENT records (admission first frames) are released immediately,
        out of queue order: holding them behind `inflight` dispatches would
        add inflight * chunk_frames frame-times to first-audio latency.
        Safe — see Record.urgent.

        kind: "all" (default), "urgent" (admission records only — for a
        dedicated low-latency fetcher that never queues a first-audio fetch
        behind a multi-MB bulk PCM transfer), or "bulk" (everything else).
        """
        urgent = []
        if kind in ("all", "urgent"):
            urgent = [r for r in self._queue if r.urgent]
            if urgent:
                self._queue = collections.deque(
                    r for r in self._queue if not r.urgent
                )
            if kind == "urgent":
                return urgent
        bulk = [r for r in self._queue if not r.urgent]
        target = self.inflight if (self._pending or self._slot_to_stream) else 0
        due = len(bulk) - target
        if due <= 0 or (target > 0 and due < self.fetch_every):
            return urgent
        taken = set(id(r) for r in bulk[:due])
        self._queue = collections.deque(
            r for r in self._queue if id(r) not in taken
        )
        return urgent + bulk[:due]

    def _materialize(self, records: list) -> List[Tuple[int, dict]]:
        return self.account(records, self.fetch(records))

    def _release(self, sid: int):
        h = self._streams.pop(sid, None)
        if h is not None:
            self._free_slot(h)

    def step(self) -> List[Tuple[int, dict]]:
        """Admit pending streams, dispatch one frame for all live slots, and
        return the frames whose (lagged) fetch completed this call.

        Returns [(stream_id, {audio_codes [ncb], is_audio, finished})].
        """
        self.dispatch_step()

        # Drain fetched results, staying `inflight` dispatches behind and
        # fetching in `fetch_every` batches; once nothing new can be
        # dispatched, drain fully. Releases during a drain may free slots for
        # queued prompts — they are admitted on the next step() call.
        emitted: List[Tuple[int, dict]] = []
        while True:
            records = self.take_due()
            if not records:
                break
            emitted.extend(self._materialize(records))
        return emitted

    def dispatch_step(self, admit_only: bool = False) -> None:
        """Admit pending streams and dispatch one frame for all live slots
        (no result fetch — results queue for take_due/fetch/account).

        admit_only=True performs just the admission (prefill + urgent first
        frame) without advancing live slots — used by EngineLoop to admit
        past the max_ahead gate without growing the un-fetched bulk queue."""
        self._admit_pending()
        if admit_only:
            return

        live_slots = list(self._slot_to_stream.items())
        if live_slots:
            # Chunked dispatch: K frames per device program (lax.scan) — the
            # per-frame dispatch/fetch overhead drops K-fold. Admission does
            # NOT force K down: pending prompts are admitted at the top of
            # every dispatch_step (before this dispatch), and budget-limited
            # slots free proactively at dispatch time (_free_slot), so a
            # queued prompt's wait is bounded by the in-flight device queue
            # (EngineLoop.max_ahead records), not by K.
            K = self.chunk_frames if self.mimi_state is not None else 1
            if self._since_flush + K > self._flush_every:
                self.state, self.mimi_state = self._flush(self.state, self.mimi_state)
                self._since_flush = 0
            # Smallest compiled bucket covering every live position (each step
            # attends positions < pos plus the current token): freed slots'
            # device positions keep advancing but their output is masked, so
            # they don't hold the bucket up.
            needed = int(max(self._slot_pos[slot] for slot, _ in live_slots)) + K
            lim = next(b for b in self.attend_buckets if b >= min(needed, self.S))
            self.last_attend_limit = lim
            pcm = None
            # The key splits INSIDE the frame program (threaded through its
            # return): a host-side jax.random.split per frame costs ~15 ms
            # through a tunneled runtime and serializes the pipeline.
            if K > 1:
                self.state, self.mimi_state, out, pcm, self.rng = (
                    self._decode_vocode_chunk(
                        self.params, self.mimi_params, self.state, self.mimi_state,
                        self.rng, lim,
                    )
                )
            elif self.mimi_state is not None:
                self.state, self.mimi_state, out, pcm, self.rng = self._decode_vocode(
                    self.params, self.mimi_params, self.state, self.mimi_state,
                    self.rng, lim,
                )
                out = (out.audio_codes, out.is_audio, out.finished, out.slow_token)
            else:
                self.state, out, self.rng = self._decode(
                    self.params, self.state, self.rng, lim
                )
                out = (out.audio_codes, out.is_audio, out.finished, out.slow_token)
            for slot, _ in live_slots:
                self._slot_pos[slot] += K
            self._since_flush += K
            self._queue.append(Record(
                (*out, pcm), [(s, sid) for s, sid in live_slots], K,
                seq=self._seq,
            ))
            self._seq += 1
            self.stats["dispatches"] += 1
            self.stats["frames_dispatched"] += K * len(live_slots)
            # Proactive slot reuse: the host knows a budget-limited stream's
            # last frame the moment it is dispatched.
            for _, sid in live_slots:
                h = self._streams.get(sid)
                if h is None:
                    continue
                h.frames_dispatched += K
                if h.frames_dispatched >= h.max_frames:
                    self._free_slot(h)

    def has_work(self) -> bool:
        return bool(self._pending or self._slot_to_stream or self._queue)


class EngineLoop:
    """Background threads driving a DecodeEngine; frames fan out to
    per-stream queues.

    The DISPATCH thread admits prompts and enqueues device steps; `fetchers`
    FETCH threads perform the (potentially slow — one network round trip on
    tunneled runtimes) result fetches OUTSIDE the engine lock, so device
    dispatch never stalls behind host I/O. Multiple fetchers overlap
    transfers: on hosts where a chunk record's PCM transfer takes longer
    than the chunk's device time, a single fetcher makes the whole engine
    fetch-bound. Non-urgent records are ACCOUNTED in dispatch order (they
    all carry frames of the same live slots — Record.seq); urgent records
    (admission first frames) account the moment their fetch lands, so a
    long in-progress PCM transfer never delays first audio.

    `max_ahead` bounds how many un-fetched records dispatch may run ahead —
    it is ALSO the first-audio latency knob: a newly admitted stream's
    prefill executes behind at most `max_ahead` queued device programs
    (~max_ahead * chunk_frames frame-times), and its first PCM is fetched
    urgently (Record.urgent)."""

    def __init__(
        self,
        engine: DecodeEngine,
        poll_interval: float = 0.002,
        max_ahead: Optional[int] = None,
        fetchers: int = 2,
    ):
        self.engine = engine
        self.poll_interval = poll_interval
        self._queues: Dict[int, "queue.Queue"] = {}
        self._lock = threading.Lock()
        self._stop = threading.Event()
        # Account ordering for non-urgent records across parallel fetchers.
        # Starts from the oldest record still sitting in the engine's queue
        # at attach time (server restart, test harness): records dispatched
        # before the loop existed must still drain through the in-order
        # cursor, or with fetchers>1 they could be accounted/emitted out of
        # dispatch order per stream. Sequence numbers consumed before the
        # loop existed AND already fetched never reappear, so starting at
        # the queue minimum (falling back to the current cursor) is safe.
        self._acct_cv = threading.Condition(self._lock)
        self._next_acct = min(
            (r.seq for r in engine._queue if r.seq is not None),
            default=engine._seq,
        )
        # Must exceed inflight + fetch_every or the fetch threads would only
        # drain at idle (take_due holds `inflight` back and batches
        # `fetch_every` at a time).
        self._max_ahead = (
            max_ahead
            if max_ahead is not None
            else engine.inflight + max(2, engine.fetch_every)
        )
        # ENFORCE the drain invariant: with max_ahead < inflight +
        # fetch_every the dispatch gate caps the queue below the bulk
        # fetchers' batch threshold and NOTHING ever drains — a hard wedge
        # (hit live: max_ahead=2 against fetch_every=8; every stream froze
        # after its first frame). An explicit shallow max_ahead expresses a
        # latency preference, so shrink the engine's fetch batching — and,
        # when max_ahead <= inflight leaves no room even at fetch_every=1
        # (hit in review: max_ahead=2 against the engine default inflight=2),
        # the engine's inflight depth too — to fit rather than deepening
        # the queue.
        if self._max_ahead < engine.inflight + engine.fetch_every:
            engine.fetch_every = max(1, self._max_ahead - engine.inflight)
            if self._max_ahead < engine.inflight + engine.fetch_every:
                engine.inflight = max(0, self._max_ahead - engine.fetch_every)
        assert self._max_ahead >= engine.inflight + engine.fetch_every
        self._dispatcher = threading.Thread(target=self._dispatch_loop, daemon=True)
        # With >= 2 fetchers, one is DEDICATED to urgent (admission first-
        # frame) records: a first-audio fetch is tiny (one frame) but would
        # otherwise queue behind in-progress multi-MB bulk PCM transfers on
        # the shared host link — measured 0.66 s per bulk fetch on this
        # host, which alone blows the < 200 ms first-audio budget.
        n = max(1, int(fetchers))
        kinds = (["urgent"] + ["bulk"] * (n - 1)) if n >= 2 else ["all"]
        self._fetchers = [
            threading.Thread(target=self._fetch_loop, args=(kind,), daemon=True)
            for kind in kinds
        ]
        self._dispatcher.start()
        for t in self._fetchers:
            t.start()

    def submit(self, prompt: np.ndarray, max_frames: Optional[int] = None) -> "queue.Queue":
        q: "queue.Queue" = queue.Queue()
        with self._lock:
            sid = self.engine.submit(prompt, max_frames)
            self._queues[sid] = q
        q.sid = sid  # for engine.pop_timing(sid) latency decomposition
        return q

    def _dispatch_loop(self):
        import time

        while not self._stop.is_set():
            with self._lock:
                gate_open = len(self.engine._queue) < self._max_ahead
                admit_past_gate = bool(
                    not gate_open and self.engine._pending and self.engine._free
                )
                work = (
                    bool(self.engine._pending or self.engine._slot_to_stream)
                    and gate_open
                ) or admit_past_gate
                if work:
                    # Admissions BYPASS the max_ahead gate (admit_only: no
                    # bulk frame dispatch): a queued prompt's prefill
                    # shouldn't wait for lagging bulk fetches to drain the
                    # record queue — the gate exists to bound un-fetched
                    # bulk buffers, and an admission adds one small urgent
                    # record that the dedicated urgent fetcher clears.
                    self.engine.dispatch_step(admit_only=admit_past_gate)
            if not work:
                time.sleep(self.poll_interval)

    def _emit(self, frames) -> None:
        for sid, frame in frames:
            q = self._queues.get(sid)
            if q is not None:
                q.put(frame)
                if frame["finished"]:
                    q.put(None)  # sentinel
                    self._queues.pop(sid, None)

    def _account_in_order(self, records, fetched) -> None:
        """Account a fetched batch: urgent records immediately, non-urgent
        strictly in dispatch (`seq`) order across all fetcher threads."""
        for rec, data in zip(records, fetched):
            with self._acct_cv:
                if rec.seq is not None:
                    while self._next_acct < rec.seq and not self._stop.is_set():
                        self._acct_cv.wait(0.05)
                frames = self.engine.account([rec], [data])
                if rec.seq is not None:
                    # max(): a record dispatched before this loop attached
                    # (seq < initial _next_acct) must not regress the cursor.
                    self._next_acct = max(self._next_acct, rec.seq + 1)
                    self._acct_cv.notify_all()
            self._emit(frames)

    def _fetch_loop(self, kind: str = "all"):
        import time

        while not self._stop.is_set():
            with self._lock:
                records = self.engine.take_due(kind)
            if not records:
                time.sleep(self.poll_interval)
                continue
            fetched = self.engine.fetch(records)  # slow I/O, lock NOT held
            self._account_in_order(records, fetched)

    def stop(self):
        self._stop.set()
        with self._acct_cv:
            self._acct_cv.notify_all()
        self._dispatcher.join(timeout=5)
        for t in self._fetchers:
            t.join(timeout=5)
