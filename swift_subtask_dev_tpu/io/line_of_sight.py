"""Line-of-sight outputs — the reference's line_of_sight.c.

A sightline is an axis-parallel line through (x, y); every gas particle
whose smoothing kernel overlaps it (impact parameter < gamma*h,
los_first_loop_mapper line_of_sight.c:103) is written to a /LOS_XXXX
group of an HDF5 file with its full hydro state, exactly what absorption
-spectrum post-processing (e.g. SpecWizard) consumes.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import h5py
import numpy as np

from ..grid.cellgrid import CellGrid, global_positions

AXES = {0: (1, 2), 1: (0, 2), 2: (0, 1)}  # projection plane per LOS axis


def select_los_particles(pos: np.ndarray, h: np.ndarray, gamma: float,
                         axis: int, point: Tuple[float, float],
                         box: Sequence[float]):
    """Boolean mask of particles whose kernel overlaps the sightline."""
    a1, a2 = AXES[axis]
    d1 = pos[:, a1] - point[0]
    d2 = pos[:, a2] - point[1]
    d1 -= np.round(d1 / box[a1]) * box[a1]
    d2 -= np.round(d2 / box[a2]) * box[a2]
    b2 = d1 ** 2 + d2 ** 2
    return b2 < (gamma * h) ** 2


def write_los(path: str, grid: CellGrid, state: Dict, gamma: float,
              sightlines: Sequence[Tuple[int, float, float]],
              time: float = 0.0):
    """Write LOS_#### groups (reference los_io layout).

    sightlines: list of (axis, c1, c2) — positions in the plane normal to
    axis.  Returns per-sightline particle counts.
    """
    mask = np.asarray(state["mask"]) > 0
    pos = global_positions(grid, np.asarray(state["off"]))[mask]
    h = np.asarray(state["h"])[mask]
    counts = []
    with h5py.File(path, "w") as f:
        hdr = f.create_group("Header")
        hdr.attrs["BoxSize"] = np.asarray(grid.box)
        hdr.attrs["Time"] = time
        hdr.attrs["NumLOS"] = len(sightlines)
        for i, (axis, c1, c2) in enumerate(sightlines):
            sel = select_los_particles(pos, h, gamma, axis, (c1, c2),
                                       grid.box)
            g = f.create_group(f"LOS_{i:04d}")
            g.attrs["Xaxis" if axis != 0 else "Yaxis"] = c1
            g.attrs["axis"] = axis
            g.attrs["NumParts"] = int(sel.sum())
            g.create_dataset("Coordinates", data=pos[sel])
            g.create_dataset("SmoothingLengths", data=h[sel])
            for name, key in [("Masses", "m"), ("Velocities", "v_full"),
                              ("InternalEnergies", "u_full"),
                              ("Densities", "rho")]:
                g.create_dataset(name,
                                 data=np.asarray(state[key])[mask][sel])
            counts.append(int(sel.sum()))
    return counts
