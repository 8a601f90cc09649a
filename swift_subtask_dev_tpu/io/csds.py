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
    format: str = "hdf5"          # 'hdf5' stream or 'binary' logfile
    # (the reference's mmap logfile + index files, csds.c:200)


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
        self._bin = (CSDSBinaryLog(f"{params.basename}.dump")
                     if params.format == "binary" else None)

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
            rec = {
                "ParticleIDs": np.asarray(state["pid"]).reshape(-1)[idx],
                "Times": np.full(n, time, np.float64),
                "Coordinates": np.mod(pos, np.asarray(self.grid.box)),
                "Velocities": np.asarray(state[vkey]).reshape(-1, 3)[idx],
            }
            for name, key in (("InternalEnergies", "u_full"),
                              ("Densities", "rho")):
                if key in state:
                    rec[name] = np.asarray(state[key]).reshape(-1)[idx]
            if self._bin is not None:
                self._bin.append(rec)
            else:
                for name, v in rec.items():
                    self.bufs[name].append(v)
            # stamp the logged particles
            self._last_hi = jnp.where(jnp.asarray(due), jnp.int32(ti_hi),
                                      self._last_hi)
            self.n_records += n
        return n

    def flush(self, path=None):
        if self._bin is not None:
            self._bin.close()
            return self._bin.path
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


# ---------------------------------------------------------------------------
# Binary logfile format + reader (the reference's actual CSDS contract:
# csds.c:200-267 — append-only records with field masks and back-offsets
# into an mmap'd logfile, reconstructable per particle).
# ---------------------------------------------------------------------------

CSDS_MAGIC = b"SWIFTTPUCSDS1\n"

# (mask bit, name, numpy dtype, components)
CSDS_FIELDS = (
    (0, "ParticleIDs", "<i8", 1),
    (1, "Times", "<f8", 1),
    (2, "Coordinates", "<f4", 3),
    (3, "Velocities", "<f4", 3),
    (4, "InternalEnergies", "<f4", 1),
    (5, "Densities", "<f4", 1),
)


def _record_dtype(mask: int) -> np.dtype:
    fields = [("hdr", "<u8")]   # u16 mask << 48 | u48 back-offset
    for bit, name, dt, nc in CSDS_FIELDS:
        if mask & (1 << bit):
            fields.append((name, dt, (nc,)) if nc > 1 else (name, dt))
    return np.dtype(fields)


class CSDSBinaryLog:
    """Append-only binary logfile with per-particle back-offset chains.

    Layout: MAGIC, then raw records.  Each record starts with a u64
    header word: (field mask << 48) | offset_of_previous_record_of_this
    particle (absolute file offset; 0 = first record).  A JSON sidecar
    ``<path>.index`` maps pid -> last record offset (the reference's
    periodically-dumped index files, csds_io.c)."""

    def __init__(self, path: str):
        self.path = path
        self.f = open(path, "wb")
        self.f.write(CSDS_MAGIC)
        self.offset = len(CSDS_MAGIC)
        self.last_offset: Dict[int, int] = {}
        self.n_records = 0

    def append(self, fields: Dict[str, np.ndarray]):
        """Append one record per row; ``fields`` must include
        ParticleIDs and may include any CSDS_FIELDS subset."""
        mask = 0
        for bit, name, _, _ in CSDS_FIELDS:
            if name in fields:
                mask |= 1 << bit
        dt = _record_dtype(mask)
        pid = np.asarray(fields["ParticleIDs"]).astype(np.int64)
        n = len(pid)
        rec = np.zeros(n, dt)
        for bit, name, fdt, nc in CSDS_FIELDS:
            if name in fields:
                rec[name] = np.asarray(fields[name])
        offs = np.empty(n, np.uint64)
        here = self.offset
        sz = dt.itemsize
        for i, p in enumerate(pid):
            offs[i] = self.last_offset.get(int(p), 0)
            self.last_offset[int(p)] = here + i * sz
        rec["hdr"] = (np.uint64(mask) << np.uint64(48)) | offs
        self.f.write(rec.tobytes())
        self.offset += n * sz
        self.n_records += n

    def close(self):
        self.f.close()
        import json
        with open(self.path + ".index", "w") as f:
            json.dump({"n_records": self.n_records,
                       "last_offset": {str(k): v for k, v in
                                       self.last_offset.items()}}, f)


def csds_read_trajectory(path: str, pid: int):
    """Walk a particle's back-offset chain from its last record (the
    reference reader's reconstruction primitive).  Returns a dict of
    field -> array ordered OLDEST first."""
    import json
    with open(path + ".index") as f:
        index = json.load(f)
    off = index["last_offset"].get(str(pid))
    if off is None:
        return {}
    out: Dict[str, List] = {}
    with open(path, "rb") as f:
        magic = f.read(len(CSDS_MAGIC))
        assert magic == CSDS_MAGIC, "not a CSDS logfile"
        while off:
            f.seek(off)
            hdr = np.frombuffer(f.read(8), "<u8")[0]
            mask = int(hdr >> np.uint64(48))
            back = int(hdr & np.uint64((1 << 48) - 1))
            dt = _record_dtype(mask)
            f.seek(off)
            rec = np.frombuffer(f.read(dt.itemsize), dt)[0]
            for bit, name, _, nc in CSDS_FIELDS:
                if mask & (1 << bit):
                    out.setdefault(name, []).append(np.array(rec[name]))
            off = back
    return {k: np.asarray(v[::-1]) for k, v in out.items()}


def csds_scan(path: str):
    """Sequential scan of every record (offset, mask, record) — the
    forward-reading debug path of the reference reader."""
    with open(path, "rb") as f:
        data = f.read()
    off = len(CSDS_MAGIC)
    assert data[:off] == CSDS_MAGIC
    while off < len(data):
        hdr = np.frombuffer(data[off:off + 8], "<u8")[0]
        mask = int(hdr >> np.uint64(48))
        dt = _record_dtype(mask)
        rec = np.frombuffer(data[off:off + dt.itemsize], dt)[0]
        yield off, mask, rec
        off += dt.itemsize
