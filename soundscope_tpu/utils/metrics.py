"""Observability: real-time-factor counters and profiler hooks.

The reference has no runtime tracing (SURVEY.md §5 — a render dirty-flag
is its only perf mechanism). The TPU engine gets first-class
observability: per-op wall/audio-time counters (RT factor), a tick-rate
monitor for the UI loop, and a context manager around jax.profiler for
xprof traces.
"""

from __future__ import annotations

import collections
import contextlib
import threading
import time


class RTCounter:
    """Tracks audio-seconds processed per wall-second per op."""

    def __init__(self):
        self._lock = threading.Lock()
        self._stats = collections.defaultdict(lambda: [0.0, 0.0, 0])  # wall, audio, calls

    @contextlib.contextmanager
    def measure(self, name: str, audio_seconds: float):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            with self._lock:
                s = self._stats[name]
                s[0] += dt
                s[1] += audio_seconds
                s[2] += 1

    def add_audio(self, name: str, audio_seconds: float):
        """Credit audio-seconds after the fact (for ops whose audio length
        is only known once they finish, e.g. decode)."""
        with self._lock:
            self._stats[name][1] += audio_seconds

    def report(self) -> dict:
        with self._lock:
            return {
                name: {
                    "wall_s": round(w, 4),
                    "audio_s": round(a, 2),
                    "calls": c,
                    "rt_factor": round(a / w, 1) if w > 0 else None,
                }
                for name, (w, a, c) in self._stats.items()
            }

    def reset(self):
        with self._lock:
            self._stats.clear()


GLOBAL = RTCounter()


class TickMonitor:
    """UI loop cadence monitor (the 8 ms budget, reference tui.rs:1279)."""

    def __init__(self, window: int = 256):
        self._times = collections.deque(maxlen=window)
        self._last = None

    def tick(self):
        now = time.perf_counter()
        if self._last is not None:
            self._times.append(now - self._last)
        self._last = now

    @property
    def mean_ms(self) -> float:
        return 1000.0 * sum(self._times) / len(self._times) if self._times else 0.0

    @property
    def worst_ms(self) -> float:
        return 1000.0 * max(self._times) if self._times else 0.0


@contextlib.contextmanager
def profile_trace(logdir: str):
    """xprof trace of the enclosed block (view with tensorboard/xprof)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
