"""GEAR and QLA star-formation models.

The reference selects one of four star-formation models at configure time
(EAGLE / GEAR / QLA / none); this module provides the two non-EAGLE
working models behind the same ``conversion_mask`` protocol the
MultiEngine consumes (engine_multi.multi_step), so the YAML section name
selects the model at runtime instead of ./configure.

References:
 - src/star_formation/GEAR/star_formation.h — eligibility
   (star_formation_is_star_forming :59-107: collapsing flow, temperature
   ceiling, density threshold, and the local Jeans density criterion)
   and the free-fall conversion probability
   (star_formation_should_convert_to_star :146-183:
   prob = 1 - exp(-eff * dt / t_ff), 1/t_ff = sqrt(rho 32 G / (3 pi))).
 - src/star_formation/QLA/star_formation.h — the quick-Lyman-alpha model:
   any gas above ``over_density`` times the mean baryon density is
   converted immediately (:62-104: compute_SFR sets convert_to_star=1).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax.numpy as jnp

from .star_formation import unit_interval_traced

F32 = jnp.float32


@dataclass(frozen=True)
class GEARStarFormation:
    """Revaz & Jablonka (2012) free-fall-efficiency star formation.

    All quantities in internal units.  ``u_max`` is the temperature
    ceiling converted to specific internal energy with the neutral mean
    molecular weight (the reference calls cooling_get_temperature; for
    the ideal-gas working set T ~ u (gamma-1) mu m_p / kB is exact).
    """

    efficiency: float = 0.01        # star_formation_efficiency
    u_max: float = 1e30             # maximal_temperature -> u ceiling
    density_threshold: float = 0.0  # physical density threshold
    # Jeans criterion constant: rho > (pi/4) gamma kB T /
    #   (G N_j^(2/3) (gamma_k h a)^2 mu m_p)  == jeans_coef * u / h_phys^2
    jeans_coef: float = 0.0
    kernel_gamma: float = 1.825742
    G: float = 1.0

    @staticmethod
    def from_params(params, units, phys_const, G_newton: float,
                    kernel_gamma: float,
                    hydro_gamma: float = 5.0 / 3.0,
                    mu_neutral: float = 1.2195,
                    hydrogen_mass_fraction: float = 0.755
                    ) -> "GEARStarFormation":
        """GEARStarFormation YAML section (star_formation_init :220-260)."""
        sec = "GEARStarFormation"
        eff = params.opt_float(sec, "star_formation_efficiency", 0.01)
        T_max = params.opt_float(sec, "maximal_temperature", 3e4)  # K
        n_jeans = params.opt_float(sec, "n_jeans", 10.0)
        nH_thresh = params.opt_float(sec, "density_threshold_H_p_cm3", 0.0)

        kB = phys_const.const_boltzmann_k
        m_p = phys_const.const_proton_mass
        T_int = T_max * units.from_cgs("temperature")
        u_max = kB * T_int / ((hydro_gamma - 1.0) * mu_neutral * m_p)

        n_to_rho = m_p / hydrogen_mass_fraction \
            * units.from_cgs("number_density")
        rho_thresh = nH_thresh * n_to_rho

        # density_criterion = (pi/4) gamma kB T / (G N^(2/3) h^2 mu m_p)
        #                   = (pi/4) gamma (gamma-1) u / (G N^(2/3) h^2)
        jeans_coef = (math.pi / 4.0) * hydro_gamma * (hydro_gamma - 1.0) \
            / (G_newton * n_jeans ** (2.0 / 3.0))
        return GEARStarFormation(
            efficiency=eff, u_max=u_max, density_threshold=rho_thresh,
            jeans_coef=jeans_coef, kernel_gamma=kernel_gamma, G=G_newton)

    def conversion_mask(self, s, cosmo, dt_star, ti_lo, ti_hi,
                        floor, active):
        """(should_convert, sfr) — same protocol as EagleStarFormation.

        Eligibility (star_formation_is_star_forming :59-107): collapsing
        (div_v <= 0), T below the ceiling, physical density above the
        threshold AND above the local Jeans density; conversion with
        prob = 1 - exp(-eff dt / t_ff) (:146-183).
        """
        a_u = cosmo.a_factor_internal_energy
        rho_com = jnp.maximum(s["rho"], 1e-30)
        rho_phys = rho_com * cosmo.a_inv2 / cosmo.a
        u_phys = s["u"] * a_u

        eligible = active & (s.get("div_v", jnp.zeros_like(rho_com)) <= 0)
        eligible &= u_phys <= jnp.float32(self.u_max)
        eligible &= rho_phys >= jnp.float32(self.density_threshold)
        # local Jeans criterion with the physical kernel support
        h_phys = s["h"] * jnp.float32(self.kernel_gamma) * cosmo.a
        rho_jeans = jnp.float32(self.jeans_coef) * u_phys \
            / jnp.maximum(h_phys * h_phys, 1e-30)
        eligible &= rho_phys > rho_jeans

        inv_tff = jnp.sqrt(rho_phys * jnp.float32(
            32.0 * self.G / (3.0 * math.pi)))
        prob = 1.0 - jnp.exp(-jnp.float32(self.efficiency)
                             * inv_tff * dt_star)
        # an SFR diagnostic consistent with the probability model:
        # <dm*/dt> = eff * m / t_ff for eligible gas
        sfr = jnp.where(eligible,
                        jnp.float32(self.efficiency) * inv_tff * s["m"],
                        0.0)
        draw = unit_interval_traced(
            s["pid"], ti_lo, ti_hi, 0x1ea97 & 0x7FFFFFFF)
        return eligible & (prob > draw) & (dt_star > 0), sfr


@dataclass(frozen=True)
class QLAStarFormation:
    """Quick-Lyman-alpha: immediate conversion above the over-density.

    star_formation/QLA/star_formation.h:62-104 — gas whose physical
    density exceeds ``over_density`` x the mean baryon density is turned
    into a (dark) star particle on its next active step, no SFR law.
    """

    over_density: float = 1000.0
    rho_crit_baryon_0: float = 0.0  # comoving mean baryon density

    @staticmethod
    def from_params(params, units, phys_const,
                    rho_crit_baryon_0: float = 0.0) -> "QLAStarFormation":
        over = params.get_float("QLAStarFormation", "over_density")
        return QLAStarFormation(over_density=over,
                                rho_crit_baryon_0=rho_crit_baryon_0)

    def conversion_mask(self, s, cosmo, dt_star, ti_lo, ti_hi,
                        floor, active):
        # physical mean baryon density = rho_b,0 / a^3; comparing comoving
        # densities drops the common a^-3
        rho_com = jnp.maximum(s["rho"], 1e-30)
        eligible = active & (rho_com > jnp.float32(
            self.rho_crit_baryon_0 * self.over_density))
        convert = eligible & (dt_star > 0)
        # instantaneous conversion: report m/dt as the SFR diagnostic
        sfr = jnp.where(convert, s["m"] / jnp.maximum(dt_star, 1e-30), 0.0)
        return convert, sfr
