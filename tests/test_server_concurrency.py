"""HTTP stream-route executor starvation regression (VERDICT r4 #3).

The defect (fixed in 249330c): the /stream route parked one blocking
`q.get` per live stream in asyncio's DEFAULT executor — min(32, cpus+4)
threads (~6 on the bench host) — so beyond that many concurrent requests
the rest starved for the full duration of the occupying streams even while
their frames sat ready in their queues (measured: 43 s first-chunk at 64
concurrent). build_app now sizes a dedicated executor to the engine slot
count.

This test reproduces the starvation mechanism deterministically with a
stub engine loop (frame cadence under test control — a real tiny engine on
CPU produces frames too fast for the starved pool to be observable):

- 36 "slow" streams whose queues stay EMPTY for 8 s (their q.get blocks,
  each holding one executor thread — 36 > the 32-thread ceiling of the
  default pool on any host);
- then 16 "fast" streams whose first frames are ALREADY in their queues at
  submit time.

Fixed server (dedicated executor sized num_slots + 8 = 72): every fast
stream's first chunk arrives in milliseconds. Pre-fix server (verified red
against `git show 249330c~1:smoltts_tpu/server/app.py`: fast first-chunk
p50 ~8 s — gated behind the blocked slow gets): the assertion below fails.
"""

import http.client
import queue as _queue
import socket
import threading
import time
from types import SimpleNamespace

import numpy as np

from smoltts_tpu.server.app import build_app


class _StubEngineLoop:
    """Minimal EngineLoop facade: submit() -> Queue; frames are injected by
    the test. Carries .engine.num_slots (executor sizing) and
    .engine.pop_timing (route does not call it, but keep the surface)."""

    def __init__(self, num_slots=64):
        self.engine = SimpleNamespace(num_slots=num_slots, pop_timing=lambda sid: None)
        self.queues = []
        self._lock = threading.Lock()

    def submit(self, prompt, max_frames=None):
        q = _queue.Queue()
        q.sid = len(self.queues)
        with self._lock:
            self.queues.append(q)
        return q


class _StubCore:
    """TTSCore facade for the stream route: only _get_prompt is used."""

    def __init__(self):
        self.model = SimpleNamespace(
            _get_prompt=lambda text, voice: np.zeros((9, 4), np.int32),
            sampling_rate=24_000,
        )


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_fast_streams_not_starved_by_blocked_slow_streams():
    N_SLOW, N_FAST, T_SLOW = 36, 16, 8.0
    loop = _StubEngineLoop(num_slots=64)
    app = build_app(_StubCore(), engine_loop=loop)
    port = _free_port()
    threading.Thread(target=app.run, args=("127.0.0.1", port), daemon=True).start()
    for _ in range(100):
        try:
            with socket.create_connection(("127.0.0.1", port), timeout=0.2):
                break
        except OSError:
            time.sleep(0.05)

    frame = {"pcm": np.zeros(64, np.float32), "finished": False}
    firsts = {}
    lock = threading.Lock()

    def client(i):
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        t0 = time.perf_counter()
        conn.request(
            "POST", "/v1/text-to-speech/0/stream", '{"text": "x"}',
            {"Content-Type": "application/json"},
        )
        resp = conn.getresponse()
        assert resp.status == 200
        chunk = resp.read(64)  # blocks until the first PCM chunk
        with lock:
            firsts[i] = time.perf_counter() - t0
        resp.read()
        conn.close()

    # Slow cohort first: their queues stay empty, each parks one blocking
    # q.get in the server's executor.
    slow_threads = [
        threading.Thread(target=client, args=(i,)) for i in range(N_SLOW)
    ]
    for t in slow_threads:
        t.start()
    # Wait until the server has materialized every slow stream's queue
    # (request parsed, q.get parked).
    deadline = time.time() + 10
    while len(loop.queues) < N_SLOW and time.time() < deadline:
        time.sleep(0.02)
    assert len(loop.queues) >= N_SLOW
    time.sleep(0.3)  # let the q.get executor tasks actually park

    # Fast cohort: first frame is ALREADY in the queue before the request's
    # q.get is even scheduled — delivery must not wait on the slow cohort.
    t_fast = time.perf_counter()
    fast_threads = [
        threading.Thread(target=client, args=(N_SLOW + i,)) for i in range(N_FAST)
    ]
    for t in fast_threads:
        t.start()
    while len(loop.queues) < N_SLOW + N_FAST and time.perf_counter() - t_fast < 10:
        time.sleep(0.01)
    for q in loop.queues[N_SLOW:]:
        q.put(dict(frame))
        q.put(dict(frame, finished=True))
        q.put(None)
    for t in fast_threads:
        t.join(timeout=30)

    # Release the slow cohort so nothing leaks into other tests.
    for q in loop.queues[:N_SLOW]:
        q.put(dict(frame, finished=True))
        q.put(None)
    for t in slow_threads:
        t.join(timeout=30)

    fast_firsts = sorted(
        firsts.get(N_SLOW + i, float("inf")) for i in range(N_FAST)
    )
    p50 = fast_firsts[len(fast_firsts) // 2]
    worst = fast_firsts[-1]
    # Fixed server: ms. Pre-fix default-executor server: ~T_SLOW (8 s) —
    # every fast first-chunk waits behind the 36 parked slow gets.
    assert p50 < 2.0, f"fast-stream first-chunk p50 {p50:.2f}s (starved executor?)"
    assert worst < min(T_SLOW * 0.75, 6.0), f"worst fast first-chunk {worst:.2f}s"
