"""Global conserved-quantity statistics (reference src/statistics.c).

The reference reduces E_kin, E_int, E_pot, momentum, angular momentum, mass
per species into ``statistics.txt`` via a custom MPI reduce op
(statistics.c:635,954).  Here the reductions are single jitted ``jnp.sum``
calls (a psum under sharding) over the tiled state.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def gas_statistics(s: Dict) -> Dict[str, jnp.ndarray]:
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


class StatisticsWriter:
    """Append-only statistics file matching the reference's column idea."""

    def __init__(self, path: str):
        self.path = path
        with open(path, "w") as f:
            f.write("# step time e_tot e_kin e_int px py pz mass\n")

    def write(self, step: int, time: float, stats: Dict):
        mom = np.asarray(stats["momentum"])
        with open(self.path, "a") as f:
            f.write(
                f"{step} {time:.8e} {float(stats['e_tot']):.8e} "
                f"{float(stats['e_kin']):.8e} {float(stats['e_int']):.8e} "
                f"{mom[0]:.6e} {mom[1]:.6e} {mom[2]:.6e} "
                f"{float(stats['total_mass']):.8e}\n")
