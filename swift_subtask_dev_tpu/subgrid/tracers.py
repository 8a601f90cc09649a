"""EAGLE tracers: per-particle thermal-history records.

Reference: src/tracers/EAGLE/tracers.h — every gas (and star, at birth)
particle tracks the maximal temperature it ever reached and the
time/scale-factor when it did (tracers_after_cooling /
tracers_after_init :60-120), plus the time of the last AGN heating event
(tracers_after_black_holes_feedback :150-170).  Snapshots export them as
MaximalTemperatures / MaximalTemperatureScaleFactors /
LastAGNFeedbackScaleFactors (tracers_io.h).

TPU design: three (C, K) f32 carriers on the gas species, updated with
masked maxima inside the jitted multi-species step — no extra loop
passes, the temperature comes from the already-final u.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

F32 = jnp.float32

FIELDS = ("T_max", "a_Tmax", "last_AGN_a")

# snapshot dataset names (tracers_io.h tracers_write_particles)
SNAPSHOT_NAMES = (("T_max", "MaximalTemperatures"),
                  ("a_Tmax", "MaximalTemperatureScaleFactors"),
                  ("last_AGN_a", "LastAGNFeedbackScaleFactors"))


@dataclass(frozen=True)
class EagleTracers:
    """Temperature conversion for the tracer records (internal units).

    T = u_phys (gamma-1) mu m_p / kB with the same neutral/ionised mu
    blend the cooling module uses (cooling_get_temperature).
    """

    T_from_u: float = 1.0   # internal u -> K at mu = 1 (= m_p/kB in
    # internal-unit terms x (gamma-1) applied below)

    @staticmethod
    def from_units(units, phys_const) -> "EagleTracers":
        kB = phys_const.const_boltzmann_k
        m_p = phys_const.const_proton_mass
        T_unit = units.from_cgs("temperature")
        return EagleTracers(T_from_u=float(m_p / kB / T_unit))

    def temperature(self, u_phys):
        """Kelvin from physical specific internal energy."""
        T_mu1 = u_phys * (2.0 / 3.0) * jnp.float32(self.T_from_u)
        mu = 0.59 + (1.22 - 0.59) * jax.nn.sigmoid(
            (4.0 - jnp.log10(jnp.maximum(T_mu1 * 0.59, 1.0))) / 0.1)
        return T_mu1 * mu

    def init_fields(self, shape):
        z = jnp.zeros(shape, F32)
        return {"T_max": z, "a_Tmax": z, "last_AGN_a": z}

    def update(self, gas, cosmo, agn_heated=None):
        """Masked-maximum update after cooling/feedback changed u
        (tracers_after_cooling); AGN-heated particles stamp the current
        scale factor (tracers_after_black_holes_feedback)."""
        a_u = cosmo.a_factor_internal_energy
        T = self.temperature(jnp.maximum(gas["u_full"], 0.0) * a_u)
        T = jnp.where(gas["mask"] > 0, T, 0.0)
        hotter = T > gas["T_max"]
        out = {"T_max": jnp.where(hotter, T, gas["T_max"]),
               "a_Tmax": jnp.where(hotter, cosmo.a, gas["a_Tmax"])}
        if agn_heated is not None:
            out["last_AGN_a"] = jnp.where(agn_heated, cosmo.a,
                                          gas["last_AGN_a"])
        else:
            out["last_AGN_a"] = gas["last_AGN_a"]
        return out
