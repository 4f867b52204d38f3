"""Profiling & observability utilities.

The reference's tracing story is one Metal GPU capture and wall-clock prints
(SURVEY.md §5). Here profiling is first-class:

- `trace()` — context manager around `jax.profiler.trace` (Perfetto/
  TensorBoard compatible xplane output).
- `device_op_summary()` — parse an xplane trace into per-op device-time
  totals (requires tensorflow's xplane proto; returns [] if unavailable).
  This is what found the vmapped-scatter pathology in the decode loop.
- `ServingMetrics` — the serving-side counters the reference prints ad hoc
  (prefill ms, tokens/s, x-realtime; lm/generate.py:187-214) kept as running
  aggregates with percentiles: first-audio latency and audio-seconds/s.
"""

from __future__ import annotations

import collections
import contextlib
import glob
import threading
import time
from typing import Dict, List, Optional, Tuple


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/smoltts_trace"):
    import jax

    with jax.profiler.trace(log_dir):
        yield log_dir


def device_op_summary(log_dir: str, top_k: int = 25) -> List[Tuple[str, float, int]]:
    """[(op_name, total_us, count)] for device planes of the newest trace."""
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore
    except ImportError:
        return []
    files = sorted(glob.glob(f"{log_dir}/**/*.xplane.pb", recursive=True))
    if not files:
        return []
    xs = xplane_pb2.XSpace()
    with open(files[-1], "rb") as f:
        xs.ParseFromString(f.read())
    totals: collections.Counter = collections.Counter()
    counts: collections.Counter = collections.Counter()
    for plane in xs.planes:
        if "TPU" not in plane.name and "GPU" not in plane.name:
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, str(ev.metadata_id))
                totals[name] += ev.duration_ps / 1e6
                counts[name] += 1
    return [(n, us, counts[n]) for n, us in totals.most_common(top_k)]


class ServingMetrics:
    """Thread-safe serving counters: first-audio latency, throughput."""

    def __init__(self, frame_rate: float = 12.5, window: int = 512):
        self.frame_rate = frame_rate
        self._lock = threading.Lock()
        self._first_audio_ms: collections.deque = collections.deque(maxlen=window)
        self._frames = 0
        self._started = time.monotonic()
        self.requests = 0

    def record_request(self) -> None:
        with self._lock:
            self.requests += 1

    def record_first_audio(self, latency_s: float) -> None:
        with self._lock:
            self._first_audio_ms.append(latency_s * 1e3)

    def record_frames(self, n: int) -> None:
        with self._lock:
            self._frames += n

    @staticmethod
    def _pct(values: List[float], q: float) -> Optional[float]:
        if not values:
            return None
        values = sorted(values)
        idx = min(len(values) - 1, int(q * len(values)))
        return values[idx]

    def snapshot(self) -> Dict[str, float]:
        with self._lock:
            vals = list(self._first_audio_ms)
            elapsed = max(time.monotonic() - self._started, 1e-9)
            out = {
                "requests": self.requests,
                "frames": self._frames,
                "audio_seconds_per_s": (self._frames / self.frame_rate) / elapsed,
                "uptime_s": elapsed,
            }
        p50 = self._pct(vals, 0.50)
        p99 = self._pct(vals, 0.99)
        if p50 is not None:
            out["first_audio_ms_p50"] = p50
            out["first_audio_ms_p99"] = p99
        return out
