"""Run observability logs — the reference's timesteps_*.txt + deadtime.

Columns follow engine.c:2270-2303: step, time (or scale-factor),
time-step size, active counts, min/max bins, wall-clock per step and the
fraction of wall-clock spent outside device execution ("deadtime").
"""

from __future__ import annotations

import time as wallclock
from typing import Dict

import numpy as np


class TimestepsWriter:
    def __init__(self, path: str, cosmological: bool = False):
        self.path = path
        self.cosmological = cosmological
        self._last = wallclock.time()
        with open(path, "w") as f:
            f.write("# step  time/a  dt  n_active  min_bin  max_bin  "
                    "ghost_iters  wall_ms  deadtime_frac\n")

    def write(self, step: int, time: float, dt: float, diag: Dict,
              busy_ms: float = 0.0):
        """busy_ms: wall time spent blocked on device execution this step;
        deadtime = the remainder (host bookkeeping, I/O, table builds) —
        the analog of the reference's scheduler deadtime (engine.c:2646)."""
        now = wallclock.time()
        wall_ms = (now - self._last) * 1000.0
        self._last = now
        dead = max(0.0, wall_ms - busy_ms) / wall_ms if wall_ms > 0 else 0.0
        counts = np.asarray(diag["bin_counts"])
        occupied = np.nonzero(counts)[0]
        bmin = int(occupied[0]) if len(occupied) else 0
        bmax = int(occupied[-1]) if len(occupied) else 0
        with open(self.path, "a") as f:
            f.write(f"{step} {time:.8e} {dt:.6e} "
                    f"{int(diag['n_active'])} {bmin} {bmax} "
                    f"{int(diag['n_ghost_iter'])} {wall_ms:.1f} "
                    f"{dead:.3f}\n")


class PhaseTimers:
    """Cumulative per-phase wall-clock — the analog of the reference's
    task-timing dumps (scheduler timers + engine.c "took N ms" lines).

    The bulk-synchronous engine has no task DAG, so the natural phase
    granularity is the launch category: stepping, mesh updates, snapshot
    I/O, statistics, restarts, rebuild-bearing launches.
    """

    def __init__(self):
        self.acc: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    class _Scope:
        def __init__(self, timers, name):
            self.timers, self.name = timers, name

        def __enter__(self):
            self.t0 = wallclock.time()

        def __exit__(self, *exc):
            dt = wallclock.time() - self.t0
            self.timers.acc[self.name] = \
                self.timers.acc.get(self.name, 0.0) + dt
            self.timers.counts[self.name] = \
                self.timers.counts.get(self.name, 0) + 1

    def phase(self, name: str) -> "PhaseTimers._Scope":
        return PhaseTimers._Scope(self, name)

    def summary(self) -> str:
        total = sum(self.acc.values()) or 1.0
        lines = ["# phase  calls  total_s  frac"]
        for name in sorted(self.acc, key=lambda n: -self.acc[n]):
            lines.append(f"{name} {self.counts[name]} "
                         f"{self.acc[name]:.2f} {self.acc[name]/total:.3f}")
        return "\n".join(lines)

    def dump(self, path: str):
        with open(path, "w") as f:
            f.write(self.summary() + "\n")
