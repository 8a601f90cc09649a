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


class MemuseLedger:
    """Device-memory ledger — the analog of the reference's swift_malloc
    accounting (memuse.h:82, memuse_report-*.dat): every engine-state
    array's label, shape, dtype and bytes, per species, plus the process
    totals from the JAX runtime."""

    def __init__(self, path: str = "memuse_report.txt"):
        self.path = path

    @staticmethod
    def _walk(state, prefix=""):
        rows = []
        for k, v in sorted(state.items()):
            if isinstance(v, dict):
                rows += MemuseLedger._walk(v, prefix + k + "/")
            elif hasattr(v, "nbytes"):
                rows.append((prefix + k, tuple(getattr(v, "shape", ())),
                             str(getattr(v, "dtype", "?")), int(v.nbytes)))
        return rows

    def dump(self, state, step: int = 0, extra_note: str = ""):
        rows = self._walk(state)
        total = sum(r[3] for r in rows)
        with open(self.path, "w") as f:
            f.write(f"# memuse ledger at step {step} {extra_note}\n")
            f.write("# label shape dtype bytes\n")
            for label, shape, dtype, nbytes in rows:
                f.write(f"{label} {list(shape)} {dtype} {nbytes}\n")
            f.write(f"# total_state_bytes {total}\n")
            try:
                import jax
                stats = jax.devices()[0].memory_stats() or {}
                for k in ("bytes_in_use", "peak_bytes_in_use",
                          "bytes_limit"):
                    if k in stats:
                        f.write(f"# device_{k} {stats[k]}\n")
            except Exception:
                pass
        return total


class GhostStats:
    """Histogram of smoothing-length iteration counts per step — the
    reference's ghost_stats.c h-convergence histograms."""

    def __init__(self, max_iter: int = 31):
        import numpy as _np
        self.hist = _np.zeros(max_iter + 1, int)
        self.n_steps = 0

    def record(self, n_iter: int):
        self.hist[min(int(n_iter), len(self.hist) - 1)] += 1
        self.n_steps += 1

    def dump(self, path: str = "ghost_stats.txt"):
        with open(path, "w") as f:
            f.write("# ghost h-iteration histogram "
                    f"({self.n_steps} steps)\n# iters steps\n")
            for i, c in enumerate(self.hist):
                if c:
                    f.write(f"{i} {c}\n")
        return path
