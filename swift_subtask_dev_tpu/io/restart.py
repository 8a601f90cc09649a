"""Checkpoint / restart — the reference's restart.c re-imagined.

The reference streams the whole engine object graph to per-rank binary
files (engine_struct_dump engine.c:3688); tasks are rebuilt, state is
restored.  Here the engine state is a pytree of arrays plus a small dict
of host metadata — one npz + json pair restores bit-identical state (the
jitted step functions are pure, so nothing else needs saving; the analog
of "tasks are not checkpointed").
"""

from __future__ import annotations

import json
import os
import time as wallclock
from typing import Dict, Optional, Tuple

import numpy as np


def _flatten(state: Dict, prefix: str = "") -> Dict:
    """Nested species states ({'gas': {...}}) -> '/'-joined flat keys."""
    out = {}
    for k, v in state.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + k + "/"))
        else:
            out[prefix + k] = np.asarray(v)
    return out


def _unflatten(arrays: Dict) -> Dict:
    out: Dict = {}
    for k, v in arrays.items():
        parts = k.split("/")
        d = out
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = v
    return out


def save_checkpoint(path: str, state: Dict, meta: Dict) -> None:
    """Write state arrays (npz) + metadata (json) atomically.

    The previous generation is kept as ``<path>.prev.*`` (restart.c:333),
    so a crash mid-write can always fall back one checkpoint.
    """
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    for ext in (".npz", ".meta.json"):
        if os.path.exists(path + ext):
            os.replace(path + ext, path + ".prev" + ext)
    arrays = _flatten(state)
    tmp = path + ".tmp.npz"
    np.savez_compressed(tmp, **arrays)
    os.replace(tmp, path + ".npz")
    with open(path + ".meta.json.tmp", "w") as f:
        json.dump(meta, f)
    os.replace(path + ".meta.json.tmp", path + ".meta.json")


def stop_file_present(restart_dir: str, name: str = "stop") -> bool:
    """The reference polls <restart_dir>/stop each step (restart.c:310):
    if present, dump a checkpoint and exit cleanly."""
    return os.path.exists(os.path.join(restart_dir, name))


class RestartPolicy:
    """Timed checkpoint cadence + max-run-time guard (restart.c:310-376).

    Mirrors the Restarts: parameter block: ``delta_hours`` between
    checkpoint dumps, ``max_run_time`` (hours) after which the run should
    checkpoint and stop (for queue-chained jobs; the resubmit command
    itself is out of scope — the caller exits with a distinct code).
    """

    def __init__(self, delta_hours: float = 5.0,
                 max_run_time_hours: Optional[float] = None,
                 restart_dir: str = "restart"):
        self.delta_s = delta_hours * 3600.0
        self.max_run_s = (max_run_time_hours * 3600.0
                          if max_run_time_hours else None)
        self.restart_dir = restart_dir
        self.t_start = wallclock.time()
        self.t_last_dump = self.t_start

    def should_checkpoint(self) -> bool:
        return wallclock.time() - self.t_last_dump >= self.delta_s

    def checkpointed(self) -> None:
        self.t_last_dump = wallclock.time()

    def should_stop(self) -> bool:
        if stop_file_present(self.restart_dir):
            self.stop_reason = "stopfile"
            return True
        if self.max_run_s is not None and \
                wallclock.time() - self.t_start >= self.max_run_s:
            self.stop_reason = "maxtime"
            return True
        return False

    def resubmit(self, command: str) -> int:
        """Re-queue the job after a max_run_time stop — the analog of
        restart_resubmit (restart.c; swift.c:1873 runs it only when the
        stop came from the run-time limit, not the stop file).  Returns
        the command's exit code."""
        import subprocess
        return subprocess.call(command, shell=True)


def load_checkpoint(path: str) -> Tuple[Dict, Dict]:
    with np.load(path + ".npz") as z:
        state = _unflatten({k: z[k] for k in z.files})
    with open(path + ".meta.json") as f:
        meta = json.load(f)
    return state, meta


def engine_meta(engine) -> Dict:
    return {
        "ti_current": engine.timeline.ti_current,
        "time_begin": engine.timeline.time_begin,
        "time_end": engine.timeline.time_end,
        "step_count": engine.step_count,
        "ti_end_min": getattr(engine, "_ti_end_min", 0),
        # split PM-mesh timestep bookkeeping (engine.c:2406 ti_mesh)
        "ti_mesh_end": getattr(engine, "ti_mesh_end", None),
        "ti_mesh_mid": getattr(engine, "ti_mesh_mid", None),
        "n_mesh_updates": getattr(engine, "n_mesh_updates", 0),
        "grid": {"box": list(engine.grid.box),
                 "cdim": list(engine.grid.cdim), "K": engine.grid.K},
    }


def restore_engine(engine, state: Dict, meta: Dict) -> None:
    import jax.numpy as jnp
    g = meta["grid"]
    assert tuple(g["cdim"]) == engine.grid.cdim and g["K"] == engine.grid.K, \
        "checkpoint grid does not match engine grid"

    def to_dev(d):
        return {k: (to_dev(v) if isinstance(v, dict) else jnp.asarray(v))
                for k, v in d.items()}

    engine.state = to_dev(state)
    engine.timeline.ti_current = int(meta["ti_current"])
    engine.step_count = int(meta["step_count"])
    engine._ti_end_min = int(meta["ti_end_min"])
    if meta.get("ti_mesh_end") is not None:
        engine.ti_mesh_end = int(meta["ti_mesh_end"])
        engine.ti_mesh_mid = int(meta["ti_mesh_mid"])
        engine.n_mesh_updates = int(meta.get("n_mesh_updates", 0))
