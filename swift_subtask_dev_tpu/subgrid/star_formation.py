"""EAGLE star formation: Schaye & Dalla Vecchia (2008) pressure law.

Reference: src/star_formation/EAGLE/star_formation.h —
eligibility (density threshold + over-density + entropy within a margin of
the floor, star_formation_is_star_forming_Z_dep :201), SFR per unit mass
SFR/m = A (M_sun/pc^2)^-n (gamma/G f_g P)^((n-1)/2)
(star_formation_compute_SFR_pressure_law :398, init :704), and the
stochastic gas->star conversion prob = SFR dt / m against the counter RNG
(star_formation_should_convert :505).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from .entropy_floor import EagleEntropyFloor

F32 = jnp.float32


def unit_interval_traced(ids, ti_lo, ti_hi, purpose: int):
    """random.h:162 equivalent with a *traced* ti (no per-step retrace)."""
    base = jax.random.PRNGKey(int(purpose) & 0x7FFFFFFF)
    base = jax.random.fold_in(base, ti_lo)
    base = jax.random.fold_in(base, ti_hi)
    flat = ids.astype(jnp.uint32).reshape(-1)
    keys = jax.vmap(lambda i: jax.random.fold_in(base, i))(flat)
    u = jax.vmap(lambda k: jax.random.uniform(k, ()))(keys)
    return u.reshape(ids.shape)


@dataclass(frozen=True)
class EagleStarFormation:
    """Pressure-law star formation in internal units."""

    sf_norm: float = 0.0           # SF_normalization (init :704)
    sf_power: float = 0.2          # (n-1)/2 with n=1.4
    high_den_thresh: float = 1e30  # KS_high_den_thresh (density, internal)
    sf_high_norm: float = 0.0
    sf_high_power: float = 0.5     # (2-1)/2 with n=2
    density_threshold: float = 0.0  # physical density threshold (internal)
    over_density: float = 57.7
    entropy_margin: float = 10.0 ** 0.5  # 0.5 dex over the floor entropy
    rho_crit_baryon_0: float = 0.0
    hydro_gamma: float = 5.0 / 3.0
    # metallicity-dependent threshold (Schaye 2004; EAGLE
    # star_formation_is_star_forming_Z_dep :201):
    # n*(Z) = norm (Z/Z0)^slope, clipped at density_threshold_max
    threshold_Z0: float = 0.002
    threshold_slope: float = 0.0    # 0 disables the Z dependence
    density_threshold_max: float = 1e30

    @staticmethod
    def from_params(params, units, phys_const, G_newton: float,
                    hydrogen_mass_fraction: float = 0.755,
                    rho_crit_baryon_0: float = 0.0,
                    floor: Optional[EagleEntropyFloor] = None
                    ) -> "EagleStarFormation":
        """EAGLEStarFormation YAML section (star_formation_init :650-740)."""
        sec = "EAGLEStarFormation"
        KS_norm_cgs = params.get_float(
            sec, "KS_normalisation")          # M_sun / yr / kpc^2
        KS_n = params.opt_float(sec, "KS_exponent", 1.4)
        KS_high_n = params.opt_float(sec, "KS_high_density_exponent", 2.0)
        fgas = params.opt_float(sec, "gas_fraction", 1.0)
        nH_thresh = params.get_float(sec, "threshold_norm_H_p_cm3")
        over_density = params.opt_float(sec, "threshold_over_density", 57.7)
        margin_dex = params.opt_float(sec, "EOS_entropy_margin_dex", 0.5)
        thr_Z0 = params.opt_float(sec, "threshold_Z0", 0.002)
        thr_slope = params.opt_float(sec, "threshold_slope", 0.0)
        nH_max = params.opt_float(sec, "threshold_max_density_H_p_cm3",
                                  1e30)
        nH_high = params.opt_float(sec, "KS_high_density_threshold_H_p_cm3",
                                   1e30)
        gamma = 5.0 / 3.0

        M_sun = 1.98841e33 * units.from_cgs("mass")
        pc = 3.08567758149e18 * units.from_cgs("length")
        kpc = 1e3 * pc
        yr = 3.15569252e7 * units.from_cgs("time")
        Msun_per_pc2 = M_sun / pc ** 2
        KS_norm = KS_norm_cgs * M_sun / yr / kpc ** 2

        sf_power = (KS_n - 1.0) / 2.0
        sf_norm = (KS_norm * Msun_per_pc2 ** (-KS_n)
                   * (gamma * fgas / G_newton) ** sf_power)
        sf_high_power = (KS_high_n - 1.0) / 2.0

        m_p = phys_const.const_proton_mass
        n_to_rho = m_p / hydrogen_mass_fraction \
            * units.from_cgs("number_density")
        rho_thresh = nH_thresh * n_to_rho
        rho_high = nH_high * n_to_rho

        # continuity of SFR at the high-density break: the high-density
        # normalisation matches the low-density law at the EoS (entropy-
        # floor) pressure of the break density
        # (star_formation_init :730-745)
        sf_high_norm = 0.0
        if nH_high < 1e29:
            if floor is None:
                raise NotImplementedError(
                    "KS_high_density_threshold_H_p_cm3 requires an entropy "
                    "floor (EoS) to anchor the break pressure "
                    "(star_formation_init :730)")
            import numpy as _np
            P_break = float(_np.asarray(
                floor.pressure_floor(jnp.float32(rho_high),
                                     jnp.float32(1e30))))
            if P_break <= 0.0:
                raise ValueError(
                    "entropy floor gives zero pressure at the high-density "
                    "SF break; cannot anchor the n=%g law" % KS_high_n)
            sf_high_norm = sf_norm * P_break ** (sf_power - sf_high_power)
        return EagleStarFormation(
            sf_norm=sf_norm, sf_power=sf_power,
            high_den_thresh=rho_high, sf_high_norm=sf_high_norm,
            sf_high_power=sf_high_power,
            density_threshold=rho_thresh, over_density=over_density,
            entropy_margin=10.0 ** margin_dex,
            rho_crit_baryon_0=rho_crit_baryon_0, hydro_gamma=gamma,
            threshold_Z0=thr_Z0, threshold_slope=thr_slope,
            density_threshold_max=(nH_max * n_to_rho if nH_max < 1e29
                                   else 1e30))

    # --- device-side pieces ---------------------------------------------------
    def is_star_forming(self, rho_phys, rho_com, P_phys,
                        floor: Optional[EagleEntropyFloor], Z=None):
        """Eligibility (star_formation_is_star_forming_Z_dep :201):
        above the (metallicity-dependent) density + over-density
        thresholds and with entropy within `entropy_margin` of the floor
        entropy."""
        thresh = jnp.float32(self.density_threshold)
        if self.threshold_slope != 0.0 and Z is not None:
            # Schaye 2004 metallicity scaling, clipped at the max
            zr = jnp.maximum(Z, 1e-8) / jnp.float32(self.threshold_Z0)
            thresh = jnp.minimum(
                thresh * zr ** jnp.float32(self.threshold_slope),
                jnp.float32(self.density_threshold_max))
        ok = rho_phys >= thresh
        ok &= rho_com >= jnp.float32(self.rho_crit_baryon_0
                                     * self.over_density)
        if floor is not None:
            gamma = jnp.float32(self.hydro_gamma)
            A = P_phys / jnp.maximum(rho_phys, 1e-30) ** gamma
            P_fl = floor.pressure_floor(rho_phys, rho_com)
            A_fl = P_fl / jnp.maximum(rho_phys, 1e-30) ** gamma
            ok &= A < A_fl * jnp.float32(self.entropy_margin)
        return ok

    def sfr_per_mass(self, rho_phys, P_phys):
        """Specific SFR from the pressure law (:416-427)."""
        P = jnp.maximum(P_phys, 1e-30)
        low = jnp.float32(self.sf_norm) * P ** jnp.float32(self.sf_power)
        high = jnp.float32(self.sf_high_norm) \
            * P ** jnp.float32(self.sf_high_power)
        return jnp.where(rho_phys < jnp.float32(self.high_den_thresh),
                         low, high)

    def conversion_mask(self, s, cosmo, dt_star, ti_lo, ti_hi,
                        floor: Optional[EagleEntropyFloor], active):
        """(should_convert, sfr) for the gas state — prob = SFR dt/m vs the
        (id, ti, purpose) counter draw (:505-512)."""
        a_u = cosmo.a_factor_internal_energy
        rho_com = jnp.maximum(s["rho"], 1e-30)
        # physical density = a^-3 rho_com; physical pressure = a^-3gamma P_com
        # (hydro_get_physical_density / _pressure use cosmo->a3_inv and
        # a_factor_pressure = a_u * a3_inv)
        rho_phys = rho_com * cosmo.a_inv2 / cosmo.a
        P_phys = s["pressure"] * a_u * cosmo.a_inv2 / cosmo.a
        eligible = active & self.is_star_forming(rho_phys, rho_com,
                                                 P_phys, floor,
                                                 Z=s.get("Z"))
        sfr_m = self.sfr_per_mass(rho_phys, P_phys)
        sfr = jnp.where(eligible, sfr_m * s["m"], 0.0)
        prob = sfr_m * dt_star
        draw = unit_interval_traced(
            s["pid"], ti_lo, ti_hi, 0x7c4865254aec6996 & 0x7FFFFFFF)
        return eligible & (prob > draw), sfr
