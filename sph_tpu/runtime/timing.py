"""Timing and profiling utilities.

The reference timed each kernel launch with host stopwatches between
``queue.finish()`` calls (`/root/reference/src/owHelper.cpp:1806-1841`,
call sites `owPhysicsFluidSimulator.cpp:88-120`). With the whole step fused
into one XLA program there are no per-kernel host boundaries to time — the
equivalents here are (a) wall-clock per stepped chunk with
``block_until_ready`` and (b) ``jax.profiler`` traces, where XLA/Pallas
per-op cost shows up instead of host timers.
"""
from __future__ import annotations

import contextlib
import time


class StepTimer:
    """Wall-clock accumulator; ``watch_report``-style printed sections."""

    def __init__(self, log=print):
        self._log = log
        self._t0 = time.perf_counter()
        self._t1 = self._t0
        self.sections: dict[str, float] = {}

    def refresh(self) -> None:
        self._t0 = self._t1 = time.perf_counter()

    def report(self, label: str) -> float:
        now = time.perf_counter()
        ms = (now - self._t1) * 1e3
        self._t1 = now
        self.sections[label] = self.sections.get(label, 0.0) + ms
        if self._log:
            self._log(f"{label}: \t{ms:9.3f} ms")
        return ms

    @property
    def elapsed_ms(self) -> float:
        return (time.perf_counter() - self._t0) * 1e3


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Capture a ``jax.profiler`` trace (view with tensorboard/xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
