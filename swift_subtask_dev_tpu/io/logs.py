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
