"""Tracing / profiling helpers (the reference has none — SURVEY.md §5).

Wraps jax.profiler for device traces and adds lightweight wall-clock +
bandwidth counters for the codec pipeline stages, so `bic compress -v` and
bench runs can report per-stage MB/s without hand instrumentation.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field


@dataclass
class StageStats:
    seconds: float = 0.0
    bytes_moved: int = 0
    calls: int = 0

    @property
    def mbps(self) -> float:
        return self.bytes_moved / self.seconds / 1e6 if self.seconds else 0.0


@dataclass
class PipelineProfile:
    stages: dict = field(default_factory=dict)

    @contextlib.contextmanager
    def stage(self, name: str, nbytes: int = 0):
        st = self.stages.setdefault(name, StageStats())
        t0 = time.perf_counter()
        try:
            yield st
        finally:
            st.seconds += time.perf_counter() - t0
            st.bytes_moved += nbytes
            st.calls += 1

    def report(self) -> str:
        lines = []
        for name, st in self.stages.items():
            lines.append(f"{name:24s} {st.seconds*1e3:9.2f} ms  "
                         f"{st.mbps:9.1f} MB/s  x{st.calls}")
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(logdir: str):
    """jax.profiler trace scope (view with tensorboard/xprof)."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
