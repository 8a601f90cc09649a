"""Cooling models: const-du/dt, const-Lambda, and the shared cool-part
driver with entropy-floor / negative-energy limiting.

Reference: src/cooling/const_du/cooling.h, src/cooling/const_lambda/
cooling.h (cooling_cool_part at const_lambda/cooling.h:77: limits the total
du/dt so neither the entropy floor nor u=0 can be crossed within 1.5/2.5
half-kicks, then rewrites the particle's u_dt which kick2 integrates).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax.numpy as jnp

from .entropy_floor import EagleEntropyFloor

F32 = jnp.float32


@dataclass(frozen=True)
class ConstDuCooling:
    """du/dt = -rate, constant everywhere (src/cooling/const_du)."""

    cooling_rate: float = 0.0  # internal units of u per time

    def du_dt_physical(self, rho_phys, u_phys):
        return jnp.full_like(u_phys, -self.cooling_rate)


@dataclass(frozen=True)
class ConstLambdaCooling:
    """Lambda/n_H^2 = const cooling (src/cooling/const_lambda/cooling.h:46).

    du/dt = -Lambda n_H^2 / rho with n_H = X_H rho / m_p is linear in rho:
    du/dt = -coeff * rho, coeff = Lambda (X_H/m_p)^2.  The coefficient is
    folded in f64 on the host — the intermediates (n_H, m_p in galactic
    internal units) overflow f32 on device.
    """

    coeff: float = 0.0  # Lambda * (X_H/m_p)^2, internal units

    @staticmethod
    def from_cgs(lambda_nH2_cgs: float, units, phys_const,
                 hydrogen_mass_fraction: float = 0.755
                 ) -> "ConstLambdaCooling":
        # Lambda/n_H^2 [erg cm^3 s^-1] -> internal units of
        # (specific-energy rate) * density / number_density^2
        lam = lambda_nH2_cgs * (
            units.from_cgs("energy") / units.from_cgs("mass")
            / units.from_cgs("time")
            * units.from_cgs("density")
            / units.from_cgs("number_density") ** 2)
        x = hydrogen_mass_fraction / phys_const.const_proton_mass
        return ConstLambdaCooling(coeff=lam * x * x)

    def du_dt_physical(self, rho_phys, u_phys):
        return -jnp.float32(self.coeff) * rho_phys


def make_cooling_fn(model, floor: Optional[EagleEntropyFloor] = None,
                    u_minimal: float = 0.0, rapid: bool = False,
                    hydro_gamma: float = 5.0 / 3.0):
    """Build the engine hook: (state, cosmo, dt_therm) -> updated fields.

    Mirrors cooling_cool_part (const_lambda/cooling.h:77): the *comoving*
    total du/dt (hydro + cooling) is limited so that

      * u stays above max(entropy-floor u, minimal u) after 1.5 dt kicks,
      * u stays above 0 after 2.5 dt (kick + drift of a 2x step),

    then the particle's u_dt is replaced (kick2 integrates it), or — in
    ``rapid`` mode — u_full is set directly and u_dt zeroed.
    """
    def cooling_fn(s, cosmo, dt_therm):
        a_u = cosmo.a_factor_internal_energy
        u_com = s["u_full"]
        rho_com = jnp.maximum(s["rho"], 1e-30)
        rho_phys = rho_com * cosmo.a_inv2 / cosmo.a  # a^-3 rho_com
        u_phys = u_com * a_u

        du_dt_phys = model.du_dt_physical(rho_phys, u_phys)
        # physical -> comoving du/dt (cooling.h:104)
        du_dt_cool = du_dt_phys * cosmo.a * cosmo.a / a_u
        total = s["u_dt"] + du_dt_cool

        if floor is not None:
            u_floor_com = floor.u_floor(rho_phys, rho_com, hydro_gamma) / a_u
        else:
            u_floor_com = jnp.zeros_like(u_com)
        u_limit = jnp.maximum(u_floor_com, jnp.float32(u_minimal) / a_u)

        dt = jnp.maximum(dt_therm, 1e-30)
        # entropy-floor limit at 1.5 dt (cooling.h:131)
        crosses = u_com + total * 1.5 * dt < u_limit
        total = jnp.where(crosses, (u_limit - u_com) / (1.5 * dt), total)
        # zero-energy limit at 2.5 dt (cooling.h:139)
        negative = u_com + total * 2.5 * dt < 0.0
        total = jnp.where(negative, -u_com / (2.5001 * dt), total)

        zero_dt = dt_therm <= 0.0
        if rapid:
            u_new = jnp.where(zero_dt, u_com, u_com + total * dt_therm)
            return {"u_full": u_new,
                    "u_dt": jnp.where(zero_dt, s["u_dt"], 0.0)}
        return {"u_dt": jnp.where(zero_dt, s["u_dt"], total)}

    return cooling_fn
