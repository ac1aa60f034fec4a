"""Timing / observability utilities.

The reference's only instrumentation is an FPS counter printed once per
second (src/app.rs:230-242); FpsCounter reproduces it.  StageTimer adds
per-stage wall timing via block_until_ready deltas, and `profile_trace`
wraps jax.profiler for full device traces (SURVEY.md §5.1).
"""

from __future__ import annotations

import contextlib
import time

import jax


class FpsCounter:
    """Prints `FPS --- N` once per second, like src/app.rs:230-242."""

    def __init__(self, enabled: bool = True, out=print):
        self.enabled = enabled
        self._out = out
        self._begin = time.monotonic()
        self._frames = 0

    def tick(self):
        if not self.enabled:
            return
        self._frames += 1
        now = time.monotonic()
        if now - self._begin > 1.0:
            self._out(f"FPS --- {self._frames}")
            self._begin = now
            self._frames = 0


class StageTimer:
    """Accumulates named stage wall times (device-synchronized)."""

    def __init__(self):
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str, sync=None):
        t0 = time.perf_counter()
        yield
        if sync is not None:
            jax.block_until_ready(sync)
        dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> str:
        lines = []
        for name, total in sorted(self.totals.items()):
            n = self.counts[name]
            lines.append(f"{name}: {1e3 * total / n:.3f} ms/iter over {n} iters")
        return "\n".join(lines)


@contextlib.contextmanager
def profile_trace(log_dir: str | None):
    """Optional jax.profiler trace around a block (--profile flag)."""
    if not log_dir:
        yield
        return
    with jax.profiler.trace(log_dir):
        yield
