"""Timer spans + timing registry.

Counterpart of the reference's `dolfinx::common::Timer`/`list_timings`
surface: every phase is wrapped in a `~MPC:`-prefixed span
(cpp/assemble_matrix.cpp:677, cpp/utils.h:149, assemble_vector.py:99) and
summarized via `list_timings(comm)`.  Here spans are wall-clock context
managers that also open a `jax.profiler.TraceAnnotation` so the same names
show up in TPU profiler traces."""

from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager

__all__ = ["Timer", "timed", "list_timings", "reset_timings", "timings"]

_registry: dict = defaultdict(lambda: [0, 0.0, 0.0])  # name -> [count, total, max]


class Timer:
    """`with Timer("~MPC: Assemble matrix"):` — accumulates into the global
    registry; also usable as start()/stop() like the dolfinx Timer."""

    def __init__(self, name: str):
        self.name = name
        self._t0 = None
        self._ann = None

    def start(self):
        self._t0 = time.perf_counter()
        try:
            import jax.profiler

            self._ann = jax.profiler.TraceAnnotation(self.name)
            self._ann.__enter__()
        except Exception:
            self._ann = None
        return self

    def stop(self) -> float:
        dt = time.perf_counter() - self._t0
        if self._ann is not None:
            self._ann.__exit__(None, None, None)
            self._ann = None
        rec = _registry[self.name]
        rec[0] += 1
        rec[1] += dt
        rec[2] = max(rec[2], dt)
        return dt

    def elapsed(self) -> float:
        return time.perf_counter() - self._t0

    def __enter__(self):
        return self.start()

    def __exit__(self, *a):
        self.stop()


@contextmanager
def timed(name: str):
    t = Timer(name).start()
    try:
        yield t
    finally:
        t.stop()


def timings() -> dict:
    """{name: (count, total_s, max_s)}"""
    return {k: tuple(v) for k, v in _registry.items()}


def reset_timings():
    _registry.clear()


def list_timings(comm=None, file=None):
    """Print the registry (reference `list_timings(comm)` shape)."""
    rows = sorted(_registry.items())
    w = max((len(k) for k, _ in rows), default=10)
    print(f"{'name':{w}s} {'calls':>6s} {'total[s]':>10s} {'avg[s]':>10s} {'max[s]':>10s}", file=file)
    for k, (cnt, tot, mx) in rows:
        print(f"{k:{w}s} {cnt:6d} {tot:10.4f} {tot/max(cnt,1):10.4f} {mx:10.4f}", file=file)
