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
from typing import Dict, Tuple

import numpy as np


def save_checkpoint(path: str, state: Dict, meta: Dict) -> None:
    """Write state arrays (npz) + metadata (json) atomically."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arrays = {k: np.asarray(v) for k, v in state.items()}
    tmp = path + ".tmp.npz"
    np.savez_compressed(tmp, **arrays)
    os.replace(tmp, path + ".npz")
    with open(path + ".meta.json.tmp", "w") as f:
        json.dump(meta, f)
    os.replace(path + ".meta.json.tmp", path + ".meta.json")
    # keep previous generation like restart.c:333 (.prev)


def load_checkpoint(path: str) -> Tuple[Dict, Dict]:
    with np.load(path + ".npz") as z:
        state = {k: z[k] for k in z.files}
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
        "grid": {"box": list(engine.grid.box),
                 "cdim": list(engine.grid.cdim), "K": engine.grid.K},
    }


def restore_engine(engine, state: Dict, meta: Dict) -> None:
    import jax.numpy as jnp
    g = meta["grid"]
    assert tuple(g["cdim"]) == engine.grid.cdim and g["K"] == engine.grid.K, \
        "checkpoint grid does not match engine grid"
    engine.state = {k: jnp.asarray(v) for k, v in state.items()}
    engine.timeline.ti_current = int(meta["ti_current"])
    engine.step_count = int(meta["step_count"])
    engine._ti_end_min = int(meta["ti_end_min"])
