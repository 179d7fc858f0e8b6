"""Timing + memory observability.

Equivalent of the reference's instrumentation (SURVEY 5.1): per-step
wall-clock timers (``frame/module_timing.F``; ``module_integrate.F:341,511``),
section timers for the coag/emission/chem/transport splits
(``wrf_pmc_driver.F90:148-263``, ``wrf_pmc_trans.F90:93-175``), and the
getrusage maxrss tracker (``interface/mem.c:6-32``) — here the C shim is
unnecessary: Python's ``resource`` module exposes the same syscall.
"""

from __future__ import annotations

import resource
import time
from collections import defaultdict
from contextlib import contextmanager


class SectionTimers:
    """Named cumulative wall-clock timers (start_timing/end_timing)."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextmanager
    def section(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            n = self.counts[name]
            tot = self.totals[name]
            lines.append(f"  {name:<28s} {tot:9.3f} s  ({n} calls, "
                         f"{tot / max(n, 1) * 1e3:8.2f} ms/call)")
        return "\n".join(lines)


def memtrack_mb() -> float:
    """Max resident set size in MB (memtrack_, interface/mem.c)."""
    kb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    return kb / 1024.0
