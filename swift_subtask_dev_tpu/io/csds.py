"""Continuous Simulation Data Stream — TPU-native core of src/csds.c.

The reference logs each particle's state into an append-only binary "logfile"
whenever the particle has taken ``delta_step`` steps since its last
record (csds_should_write_record, csds.h; csds_log_part csds.c:200),
with a mask describing which fields each record carries, enabling
time-interpolated reconstruction of any particle's history.

Bulk-synchronous analog:

* each particle carries a ``csds_last_ti`` stamp; after every step a
  jitted predicate flags ACTIVE particles whose elapsed integer time
  exceeds the per-particle logging interval (delta_step * their current
  timestep), i.e. exactly the particles that just finished >=
  delta_step of their own steps;
* flagged slots are gathered host-side and appended to an in-memory
  record buffer, flushed to one HDF5 stream file (the reference uses a
  raw mmap'd logfile + index files; a single HDF5 with a record offset
  table gives the same reconstruction capability here).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List

import h5py
import jax
import jax.numpy as jnp
import numpy as np

F32 = jnp.float32
I32 = jnp.int32


@dataclass
class CSDSParams:
    """CSDS: YAML section analog (csds_init, csds.c:832)."""

    delta_step: int = 10          # particle steps between records
    basename: str = "csds"


def _due_mask(time_bin, last_ti_hi, ti_hi, active, mask, delta_step):
    """Particles due for a record: active, and >= delta_step of their own
    steps elapsed since their last record.

    Integer times ride as the high bits (ti >> 28, range 2^30) so
    plain i32 device math covers the 2^56 timeline.
    """
    elapsed = ti_hi - last_ti_hi
    # dti of one particle step, in the same >>28 units (bins > 28 only;
    # finer bins log on every one of their (sub-resolution) steps)
    # dti(bin) = 1 << (bin + 1) (timeline.h get_integer_timestep)
    dti_hi = jnp.where(time_bin + 1 > 28,
                       1 << jnp.clip(time_bin + 1 - 28, 0, 29), 1)
    due = (mask > 0) & (active > 0) \
        & (elapsed >= delta_step * dti_hi)
    return due


_JIT_DUE = jax.jit(_due_mask)


class CSDSWriter:
    """Buffers per-particle records and writes one HDF5 stream."""

    def __init__(self, params: CSDSParams, grid):
        self.p = params
        self.grid = grid
        self.corners = np.asarray(grid.cell_corners())
        self.bufs: Dict[str, List[np.ndarray]] = {
            "ParticleIDs": [], "Times": [], "Coordinates": [],
            "Velocities": [], "InternalEnergies": [], "Densities": []}
        self.n_records = 0
        self._last_hi = None

    def after_step(self, state: Dict, ti: int, time: float):
        """Append records for every particle due this step; returns the
        number of records written (csds_log_part batched)."""
        from ..utils import timeline as tl
        ti_hi = np.int32(ti >> 28)
        if self._last_hi is None:
            self._last_hi = jnp.zeros(state["mask"].shape, I32)
        tb = jnp.clip(state["time_bin"], 0, 56)
        # bin b was active at ti iff ti is a multiple of its step
        act_tbl = jnp.asarray(
            [1.0 if ti % tl.get_integer_timestep(max(b, 1)) == 0 else 0.0
             for b in range(tl.NUM_TIME_BINS + 1)], F32)
        active = act_tbl[tb] * state["mask"]
        due = np.asarray(_JIT_DUE(state["time_bin"], self._last_hi,
                                  jnp.int32(ti_hi), active,
                                  state["mask"],
                                  jnp.int32(self.p.delta_step)))
        idx = np.nonzero(due.reshape(-1))
        n = len(idx[0])
        if n:
            pos = (self.corners[:, None, :]
                   + np.asarray(state["off"])).reshape(-1, 3)[idx]
            vkey = "v_full" if "v_full" in state else "v"
            self.bufs["ParticleIDs"].append(
                np.asarray(state["pid"]).reshape(-1)[idx])
            self.bufs["Times"].append(np.full(n, time, np.float64))
            self.bufs["Coordinates"].append(
                np.mod(pos, np.asarray(self.grid.box)))
            self.bufs["Velocities"].append(
                np.asarray(state[vkey]).reshape(-1, 3)[idx])
            for name, key in (("InternalEnergies", "u_full"),
                              ("Densities", "rho")):
                if key in state:
                    self.bufs[name].append(
                        np.asarray(state[key]).reshape(-1)[idx])
            # stamp the logged particles
            self._last_hi = jnp.where(jnp.asarray(due), jnp.int32(ti_hi),
                                      self._last_hi)
            self.n_records += n
        return n

    def flush(self, path=None):
        path = path or f"{self.p.basename}_0000.hdf5"
        with h5py.File(path, "w") as f:
            h = f.create_group("Header")
            h.attrs["NumRecords"] = self.n_records
            h.attrs["DeltaStep"] = self.p.delta_step
            g = f.create_group("Records")
            for name, chunks in self.bufs.items():
                if chunks:
                    g.create_dataset(name, data=np.concatenate(chunks))
            # per-particle record index (csds index file analog): sorted
            # (pid, time) order offsets enable history reconstruction
            if self.bufs["ParticleIDs"]:
                pid = np.concatenate(self.bufs["ParticleIDs"])
                t = np.concatenate(self.bufs["Times"])
                order = np.lexsort((t, pid))
                g.create_dataset("HistoryOrder", data=order.astype(np.int64))
        return path
