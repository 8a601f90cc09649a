"""Global conserved-quantity statistics (reference src/statistics.c).

The reference reduces mass, E_kin, E_int, E_pot, E_rad, entropy, momentum,
angular momentum and centre of mass per species into ``statistics.txt``
via a custom MPI reduce op (statistics.c:635,954).  Here the reductions
are single jitted ``jnp.sum`` calls (a psum under sharding) over the
tiled state; angular momentum uses absolute positions reconstructed from
the cell corners + offsets.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import mhd


@jax.jit
def gas_statistics(s: Dict) -> Dict[str, jnp.ndarray]:
    """Minimal gas reductions (no positions needed)."""
    m = s["m"] * s["mask"]
    v = jnp.where(s["mask"][..., None] > 0, s["v_full"], 0.0)
    e_kin = 0.5 * jnp.sum(m * jnp.sum(v * v, axis=-1))
    e_int = jnp.sum(m * jnp.where(s["mask"] > 0, s["u_full"], 0.0))
    mom = jnp.sum(m[..., None] * v, axis=(0, 1))
    return {
        "total_mass": jnp.sum(m),
        "e_kin": e_kin,
        "e_int": e_int,
        "e_tot": e_kin + e_int,
        "momentum": mom,
    }


@partial(jax.jit, static_argnums=(0,))
def species_statistics(grid, s: Dict) -> Dict[str, jnp.ndarray]:
    """Full reductions for one species (statistics.c:170-320 analog).

    Uses ``v_full`` when present (gas) else ``v``; ``u_full`` and ``pot``
    are optional.  E_pot follows the reference convention
    0.5 * m * potential summed over particles (pair double-count halved).
    """
    mask = s["mask"]
    m = s["m"] * mask
    vkey = "v_full" if "v_full" in s else "v"
    v = jnp.where(mask[..., None] > 0, s[vkey], 0.0)
    corners = jnp.asarray(grid.cell_corners().reshape(grid.C, 1, 3),
                          jnp.float32)
    x = jnp.where(mask[..., None] > 0, corners + s["off"], 0.0)

    e_kin = 0.5 * jnp.sum(m * jnp.sum(v * v, axis=-1))
    e_int = (jnp.sum(m * jnp.where(mask > 0, s["u_full"], 0.0))
             if "u_full" in s else jnp.float32(0.0))
    # MHD diagnostics (statistics.c:248-255; zero under the None scheme)
    e_mag = mhd.magnetic_energy(s)
    h_mag = mhd.magnetic_helicity(s)
    h_cross = mhd.cross_helicity(s)
    div_b = mhd.divB_error(s)
    pot = s.get("pot", None)
    if pot is not None and "pot_mesh" in s:
        pot = pot + s["pot_mesh"]     # split-mesh runs carry the PM part
    e_pot = (0.5 * jnp.sum(m * jnp.where(mask > 0, pot, 0.0))
             if pot is not None else jnp.float32(0.0))
    mom = jnp.sum(m[..., None] * v, axis=(0, 1))
    ang = jnp.sum(m[..., None] * jnp.cross(x, v), axis=(0, 1))
    total_m = jnp.sum(m)
    com = jnp.sum(m[..., None] * x, axis=(0, 1)) / jnp.maximum(total_m,
                                                               1e-30)
    return {
        "total_mass": total_m,
        "e_kin": e_kin,
        "e_int": e_int,
        "e_pot": e_pot,
        "e_mag": e_mag,
        "e_tot": e_kin + e_int + e_pot + e_mag,
        "h_mag": h_mag,
        "h_cross": h_cross,
        "divB_err": div_b,
        "momentum": mom,
        "ang_momentum": ang,
        "com": com,
    }


def collect_statistics(grid, species: Dict[str, Dict]
                       ) -> Dict[str, Dict[str, np.ndarray]]:
    """Reduce every species and an aggregate 'total' row.

    species: {"gas": state, "dm": state, ...} — each a (C, K) tile dict on
    ``grid`` (K may differ across species).
    """
    out = {name: {k: np.asarray(v) for k, v in
                  species_statistics(grid, s).items()}
           for name, s in species.items()}
    tot = {}
    for k in ("total_mass", "e_kin", "e_int", "e_pot", "e_mag", "e_tot",
              "h_mag", "h_cross", "divB_err"):
        tot[k] = np.sum([o[k] for o in out.values()], axis=0)
    for k in ("momentum", "ang_momentum"):
        tot[k] = np.sum([o[k] for o in out.values()], axis=0)
    m_all = max(float(tot["total_mass"]), 1e-30)
    tot["com"] = np.sum([o["com"] * float(o["total_mass"])
                         for o in out.values()], axis=0) / m_all
    out["total"] = tot
    return out


class SFHWriter:
    """Star-formation-history log (SFR.txt), one line per step —
    star_formation_logger.h:158 star_formation_logger_write_to_log_file.

    Columns (internal physical units, like the reference):
    step, time, a, z, new stellar mass this step, SFR of active
    star-forming gas, SFR*dt of active gas, total SFR
    (active + sticky inactive)."""

    def __init__(self, path: str = "SFR.txt"):
        self.path = path
        with open(path, "w") as f:
            f.write("# Star Formation History Logger file\n"
                    "# (0) step  (1) time  (2) a  (3) z  "
                    "(4) new stellar mass  (5) SFR (active)  "
                    "(6) SFR*dt (active)  (7) total SFR\n")

    def write(self, step: int, time: float, a: float, diag: Dict):
        sfr_act = float(diag.get("sfr_total", 0.0))
        total = sfr_act + float(diag.get("sfr_inactive", 0.0))
        z = 1.0 / a - 1.0 if a > 0 else 0.0
        with open(self.path, "a") as f:
            f.write(f"{step:6d} {time:16e} {a:12.7f} {z:12.7f} "
                    f"{float(diag.get('m_stars_formed', 0.0)):14e} "
                    f"{sfr_act:14e} "
                    f"{float(diag.get('sfrdt_total', 0.0)):14e} "
                    f"{total:14e}\n")


class StatisticsWriter:
    """Append-only statistics file matching the reference's column set
    (statistics.c:690 statistics_print_to_file)."""

    COLS = ("# step time mass e_tot e_kin e_int e_pot e_mag "
            "px py pz Lx Ly Lz H_mag H_cross divB_err\n")

    def __init__(self, path: str):
        self.path = path
        with open(path, "w") as f:
            f.write(self.COLS)

    def write(self, step: int, time: float, stats: Dict):
        mom = np.asarray(stats["momentum"])
        ang = np.asarray(stats.get("ang_momentum", np.zeros(3)))
        e_pot = float(stats.get("e_pot", 0.0))
        with open(self.path, "a") as f:
            f.write(
                f"{step} {time:.8e} {float(stats['total_mass']):.8e} "
                f"{float(stats['e_tot']):.8e} "
                f"{float(stats['e_kin']):.8e} {float(stats['e_int']):.8e} "
                f"{e_pot:.8e} {float(stats.get('e_mag', 0.0)):.6e} "
                f"{mom[0]:.6e} {mom[1]:.6e} {mom[2]:.6e} "
                f"{ang[0]:.6e} {ang[1]:.6e} {ang[2]:.6e} "
                f"{float(stats.get('h_mag', 0.0)):.6e} "
                f"{float(stats.get('h_cross', 0.0)):.6e} "
                f"{float(stats.get('divB_err', 0.0)):.6e}\n")
