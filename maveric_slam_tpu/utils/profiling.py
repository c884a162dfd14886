"""Profiling/observability hooks.

The reference marks regions with comments for external timing
(/*** MEASURE THIS ***/, e.g. src/local_bundle_adjustment.c:153) and logs
via printf. Here: wall-clock scopes with device synchronization, running
statistics, and optional XLA profiler traces viewable in TensorBoard/xprof.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator

import jax


class Timer:
    """Accumulating named timers with device-sync'd boundaries."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def scope(self, name: str, sync: bool = True) -> Iterator[None]:
        if sync:
            jax.effects_barrier()
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync:
                jax.effects_barrier()
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "total_s": self.totals[name],
                "count": self.counts[name],
                "mean_ms": 1000.0 * self.totals[name] / max(self.counts[name], 1),
            }
            for name in self.totals
        }

    def report(self) -> str:
        lines = []
        for name, s in sorted(
            self.summary().items(), key=lambda kv: -kv[1]["total_s"]
        ):
            lines.append(
                f"{name:32s} {s['count']:6d}x  {s['mean_ms']:8.2f} ms/call"
                f"  {s['total_s']:8.2f} s total"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def xla_trace(logdir: str) -> Iterator[None]:
    """Capture an XLA profiler trace (open with TensorBoard's profile tab)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def block(tree):
    """Block on all arrays in a pytree (accurate timing boundaries)."""
    return jax.block_until_ready(tree)
