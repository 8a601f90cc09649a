"""On-the-fly structure finding — the VELOCIraptor-hook analog.

The reference dlopens the external VELOCIraptor library and hands it the
particle arrays at configured output times (velociraptor_interface.c:224
velociraptor_invoke; engine.c:3268 reads the StructureFinding: YAML
section).  An external C++ tool cannot ride a jitted TPU step, so here
the SAME invocation surface (Snapshots:invoke_stf + StructureFinding:
basename/config_file_name/time_first/scale_factor_first/delta_time)
drives the in-process FOF group finder (ops/fof.py) over the live engine
state instead, writing one ``<basename>_%04d.hdf5`` catalogue per
invocation — the ``.properties`` output of the reference's workflow.

The cadence semantics mirror the snapshot triggers (engine_io.c):
multiplicative in the scale factor for cosmological runs, additive in
time otherwise.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, Optional

import numpy as np


@dataclass
class StructureFindingParams:
    basename: str = "stf"
    config_file_name: str = ""       # accepted for parity; recorded only
    subdir_per_output: str = ""
    delta_time: float = -1.0
    first: float = 0.0               # time_first / scale_factor_first
    linking_length: float = 0.0      # 0 -> 0.2 * mean separation
    min_group_size: int = 32

    @staticmethod
    def from_params(params, cosmological: bool
                    ) -> Optional["StructureFindingParams"]:
        """None unless Snapshots:invoke_stf is on (engine.c:3144)."""
        if not params.opt_int("Snapshots", "invoke_stf", 0):
            return None
        sec = "StructureFinding"
        first = params.opt_float(
            sec, "scale_factor_first" if cosmological else "time_first",
            0.1 if cosmological else 0.0)
        return StructureFindingParams(
            basename=params.opt_string(sec, "basename", "stf"),
            config_file_name=params.opt_string(sec, "config_file_name",
                                               ""),
            subdir_per_output=params.opt_string(sec, "subdir_per_output",
                                                ""),
            delta_time=params.opt_float(sec, "delta_time", -1.0),
            first=first,
            linking_length=params.opt_float(sec, "linking_length", 0.0),
            min_group_size=params.opt_int(sec, "min_group_size", 32))


class StructureFinder:
    """Invokes FOF over the live (multi-)species state on the STF cadence
    and writes group catalogues."""

    def __init__(self, p: StructureFindingParams, grid, box,
                 cosmological: bool):
        self.p = p
        self.grid = grid
        self.box = np.asarray(box, np.float64)
        self.cosmological = cosmological
        self.next_time = p.first
        self.index = 0

    def rebind(self, grid):
        """Re-grids replace the engine grid mid-run."""
        self.grid = grid

    def _gather_particles(self, species: Dict[str, Dict]):
        corners = self.grid.cell_corners()
        pos, pid, m, v = [], [], [], []
        for name, sp in species.items():
            mask = np.asarray(sp["mask"]) > 0
            if not mask.any():
                continue
            x = np.mod(corners[:, None, :] + np.asarray(sp["off"]),
                       self.box)[mask]
            pos.append(x)
            pid.append(np.asarray(sp["pid"])[mask])
            m.append(np.asarray(sp["m"])[mask])
            vkey = "v_full" if "v_full" in sp else "v"
            v.append(np.asarray(sp[vkey])[mask])
        if not pos:
            return None
        return (np.concatenate(pos), np.concatenate(pid),
                np.concatenate(m), np.concatenate(v))

    def invoke(self, species: Dict[str, Dict], time: float) -> str:
        """One structure-finding pass (velociraptor_invoke analog).
        Returns the catalogue path."""
        import h5py
        import jax.numpy as jnp
        from ..grid import CellGrid, bucket_fields
        from ..ops.fof import fof_labels, group_catalogue

        gathered = self._gather_particles(species)
        path_dir = self.p.subdir_per_output
        if path_dir:
            path_dir = f"{path_dir}_{self.index:04d}"
            os.makedirs(path_dir, exist_ok=True)
        path = os.path.join(path_dir,
                            f"{self.p.basename}_{self.index:04d}.hdf5")
        if gathered is None:
            self.index += 1
            return path
        pos, pids, masses, vels = gathered
        n = len(pos)
        ell = self.p.linking_length
        if ell <= 0:
            ell = 0.2 * float(np.prod(self.box)) ** (1 / 3) / n ** (1 / 3)

        grid = CellGrid.build_for_positions(
            tuple(self.box), max(ell, float(min(self.box)) / 64), pos,
            headroom=1.6)
        f, mask, off, _ = bucket_fields(
            grid, jnp.asarray(pos),
            {"pid": jnp.asarray(pids.astype(np.int64) & 0x7FFFFFFF,
                                jnp.int32),
             "m": jnp.asarray(masses, jnp.float32),
             "v": jnp.asarray(vels, jnp.float32)})
        labels, _ = fof_labels(grid, mask, off, ell)
        corners = grid.cell_corners()
        pos_tiled = np.mod(corners[:, None, :] + np.asarray(off),
                           self.box)
        cat = group_catalogue(np.asarray(labels), np.asarray(mask),
                              min_size=self.p.min_group_size,
                              m=np.asarray(f["m"]), pos=pos_tiled,
                              v=np.asarray(f["v"]), box=self.box)
        valid = np.asarray(mask).reshape(-1) > 0
        with h5py.File(path, "w") as fo:
            g = fo.create_group("Groups")
            g.create_dataset("GroupSizes", data=cat["group_sizes"])
            g.create_dataset("Masses", data=cat["group_mass"])
            g.create_dataset("Centres", data=cat["group_com"])
            g.create_dataset("Velocities", data=cat["group_vel"])
            g.attrs["NumGroups"] = cat["n_groups"]
            g.attrs["LinkingLength"] = ell
            g.attrs["Time"] = time
            g.attrs["ConfigFile"] = self.p.config_file_name
            p = fo.create_group("Particles")
            p.create_dataset("ParticleIDs",
                             data=np.asarray(f["pid"]).reshape(-1)[valid])
            p.create_dataset("GroupIDs",
                             data=cat["group_id"].reshape(-1)[valid])
        self.index += 1
        return path

    def after_step(self, species: Dict[str, Dict], t_now: float):
        """Cadence check + invoke (engine_io.c engine_check_for_dumps)."""
        if self.p.delta_time <= 0 or t_now < self.next_time:
            return None
        path = self.invoke(species, t_now)
        if self.cosmological and self.p.delta_time > 1.0:
            self.next_time = max(self.next_time, t_now) \
                * self.p.delta_time
        else:
            self.next_time = t_now + self.p.delta_time
        return path
