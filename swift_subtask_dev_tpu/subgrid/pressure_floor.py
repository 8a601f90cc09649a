"""GEAR pressure floor (Jeans-length resolution floor).

Reference: src/pressure_floor/GEAR/pressure_floor.h —
pressure_floor_get_comoving_pressure (:71-86):

    P_floor_com = gamma_k^2 h^2 rho_com * (4 G N_j^(2/3) / pi) * a^-1
                  * a^(3 gamma - 3) * rho_com / gamma

i.e. the pressure needed to keep the local Jeans length resolved by
``N_jeans`` resolution elements (Hopkins et al. 2011 style).  The floor
is applied to the comoving pressure after the ghost finalises it
(engine._gas_loops), before the gradient/force loops consume it — the
same read path the reference wraps in hydro_get_comoving_pressure.  The
soundspeed is recomputed from the floored pressure where the floor binds
(the reference's hydro soundspeed reads the floored pressure too).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax.numpy as jnp

F32 = jnp.float32


@dataclass(frozen=True)
class GEARPressureFloor:
    """Jeans pressure floor parameters (internal units)."""

    n_jeans: float = 10.0
    constants: float = 0.0       # 4 G N_j^(2/3) / pi (init :107-112)
    kernel_gamma2: float = 0.0   # kernel_gamma^2 (floor uses gamma_k h)
    hydro_gamma: float = 5.0 / 3.0

    @staticmethod
    def from_params(params, phys_const, kernel_gamma: float,
                    hydro_gamma: float = 5.0 / 3.0) -> "GEARPressureFloor":
        """GEARPressureFloor YAML section (pressure_floor_init :100-125)."""
        n_jeans = params.get_float("GEARPressureFloor", "jeans_factor")
        constants = 4.0 / math.pi * phys_const.const_newton_G \
            * n_jeans ** (2.0 / 3.0)
        return GEARPressureFloor(n_jeans=n_jeans, constants=constants,
                                 kernel_gamma2=kernel_gamma * kernel_gamma,
                                 hydro_gamma=hydro_gamma)

    def comoving_floor(self, rho_com, h, cosmo):
        """P_floor in comoving units (:76-84)."""
        a_coef = cosmo.a ** (3.0 * self.hydro_gamma - 3.0)
        a_inv = cosmo.a_inv2 * cosmo.a
        return (jnp.float32(self.kernel_gamma2) * h * h * rho_com
                * jnp.float32(self.constants) * a_inv
                * a_coef * rho_com / jnp.float32(self.hydro_gamma))

    def apply(self, s, cosmo, active):
        """Clamp pressure (and re-derive soundspeed where the floor binds)
        on active particles; returns the updated fields dict."""
        if "pressure" not in s:
            return {}
        P_fl = self.comoving_floor(jnp.maximum(s["rho"], 1e-30),
                                   s["h"], cosmo)
        binds = active & (s["pressure"] < P_fl)
        P_new = jnp.where(binds, P_fl, s["pressure"])
        out = {"pressure": P_new}
        if "soundspeed" in s:
            cs_fl = jnp.sqrt(jnp.float32(self.hydro_gamma) * P_fl
                             / jnp.maximum(s["rho"], 1e-30))
            out["soundspeed"] = jnp.where(binds, cs_fl, s["soundspeed"])
        return out
