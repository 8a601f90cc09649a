"""EAGLE thermal (SNII) stellar feedback.

Reference: src/feedback/EAGLE_thermal/feedback_iact.h
(runner_iact_nonsym_feedback_apply) + src/feedback/EAGLE/feedback.h
(feedback_will_do_feedback, SNII energy reservoir): a star past the SNII
delay time injects E = f_E * E_SNII_per_Msun * m_star by heating each gas
neighbour by a fixed temperature jump Delta_T with probability
E / (Delta_u * sum m_ngb) (Dalla Vecchia & Schaye 2012 eq. 7).

Heated inactive particles are synchronized onto the current step
(runner_do_sync, runner_time_integration.c:1478) via the same wake-kick
tables as the timestep limiter.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

F32 = jnp.float32


@dataclass(frozen=True)
class EagleThermalFeedback:
    """SNII thermal feedback parameters (internal units)."""

    delta_u: float = 0.0        # heating jump per unit mass: kB dT/((g-1) mu m_p)
    e_per_mass: float = 0.0     # f_E * E_SNII per unit stellar mass
    snii_delay: float = 0.0     # age at which the star fires (time units;
    # for cosmological runs this is a delta in scale factor — proper-time
    # stellar ages land with the enrichment module)

    @staticmethod
    def from_physical(units, phys_const, delta_T_K: float = 10 ** 7.5,
                      f_E: float = 1.0,
                      num_SNII_per_Msun: float = 1.73621e-2,
                      E_SNII_cgs: float = 1.0e51,
                      snii_delay: float = 0.0,
                      mu_ionised: float = 0.5954,
                      hydro_gamma: float = 5.0 / 3.0
                      ) -> "EagleThermalFeedback":
        """Defaults follow the reference's EAGLE YAML (feedback_props.c:
        SNII_delta_T_K=10^7.5, num_SNII 1.736e-2/Msun, E 10^51 erg)."""
        kB = phys_const.const_boltzmann_k
        m_p = phys_const.const_proton_mass
        du = kB * delta_T_K / ((hydro_gamma - 1.0) * mu_ionised * m_p)
        M_sun = 1.98841e33 * units.from_cgs("mass")
        E_int = E_SNII_cgs * units.from_cgs("energy")
        return EagleThermalFeedback(
            delta_u=du,
            e_per_mass=f_E * num_SNII_per_Msun * E_int / M_sun,
            snii_delay=snii_delay)

    def firing_energy(self, stars, t_now, active):
        """Per-star energy to inject this step: stars whose age crossed the
        SNII delay and have not fired yet (fb_done flag)."""
        age = t_now - stars["birth_time"]
        fire = (active & (stars["fb_done"] <= 0)
                & (age >= jnp.float32(self.snii_delay))
                & (stars["mask"] > 0) & (stars["birth_time"] > 0))
        energy = jnp.where(fire, jnp.float32(self.e_per_mass) * stars["m"],
                           0.0)
        return energy, fire


# `kind` lets multi_step dispatch the three feedback application paths
# (thermal stochastic heating / kinetic paired kicks / GEAR continuous
# deposition) without isinstance checks on plugin classes.
EagleThermalFeedback.kind = "thermal"


@dataclass(frozen=True)
class GEARFeedback:
    """GEAR continuous (non-stochastic) SNII energy deposition.

    Reference: src/feedback/GEAR/feedback.c + feedback_iact.h — the
    energy of the supernovae exploding during the step is distributed
    kernel-weighted over the star's gas neighbours (no heating
    probability, no fixed Delta-T).  The stellar-evolution SN rate is
    collapsed to the same one-shot delay-crossing trigger as the EAGLE
    module (the IMF integral is in subgrid/enrichment.py); the energy
    per unit stellar mass is the IMF-weighted SNII count times E_SN.
    """

    e_per_mass: float = 0.0   # f_E * N_SNII/M * E_SN (internal units)
    snii_delay: float = 0.0

    kind = "gear"

    @staticmethod
    def from_physical(units, phys_const, f_E: float = 1.0,
                      num_SNII_per_Msun: float = 1.73621e-2,
                      E_SNII_cgs: float = 1.0e51,
                      snii_delay: float = 0.0) -> "GEARFeedback":
        M_sun = 1.98841e33 * units.from_cgs("mass")
        E_int = E_SNII_cgs * units.from_cgs("energy")
        return GEARFeedback(
            e_per_mass=f_E * num_SNII_per_Msun * E_int / M_sun,
            snii_delay=snii_delay)

    def firing_energy(self, stars, t_now, active):
        age = t_now - stars["birth_time"]
        fire = (active & (stars["fb_done"] <= 0)
                & (age >= jnp.float32(self.snii_delay))
                & (stars["mask"] > 0) & (stars["birth_time"] > 0))
        energy = jnp.where(fire, jnp.float32(self.e_per_mass) * stars["m"],
                           0.0)
        return energy, fire


@dataclass(frozen=True)
class EagleKineticFeedback:
    """EAGLE SNII kinetic feedback: isotropic ray-paired kicks.

    Reference: src/feedback/EAGLE_kinetic/feedback_iact.h:102-190 — each
    SNII event draws a random direction, selects the gas neighbour best
    aligned with the ray and with its mirror, and kicks the two in
    exactly opposite directions so the pair conserves momentum while
    carrying the event's kinetic energy.  Simplification vs the
    reference: the per-star energy reservoir fires as ONE pair event at
    the SNII delay crossing (the reference splits it into
    N_kinetic_events rays); the pair momentum follows from
    E = q^2/2 (1/m+ + 1/m-)  =>  q = sqrt(2 E m+ m- / (m+ + m-)).
    """

    e_per_mass: float = 0.0
    snii_delay: float = 0.0

    kind = "kinetic"

    @staticmethod
    def from_physical(units, phys_const, f_E: float = 1.0,
                      num_SNII_per_Msun: float = 1.73621e-2,
                      E_SNII_cgs: float = 1.0e51,
                      snii_delay: float = 0.0) -> "EagleKineticFeedback":
        M_sun = 1.98841e33 * units.from_cgs("mass")
        E_int = E_SNII_cgs * units.from_cgs("energy")
        return EagleKineticFeedback(
            e_per_mass=f_E * num_SNII_per_Msun * E_int / M_sun,
            snii_delay=snii_delay)

    def firing_energy(self, stars, t_now, active):
        age = t_now - stars["birth_time"]
        fire = (active & (stars["fb_done"] <= 0)
                & (age >= jnp.float32(self.snii_delay))
                & (stars["mask"] > 0) & (stars["birth_time"] > 0))
        energy = jnp.where(fire, jnp.float32(self.e_per_mass) * stars["m"],
                           0.0)
        return energy, fire

    @staticmethod
    def ray_directions(pids, ti_lo, ti_hi):
        """Isotropic unit vectors from the counter RNG (random.h
        random_unit_interval with two feedback ray purposes)."""
        from .star_formation import unit_interval_traced
        u1 = unit_interval_traced(pids, ti_lo, ti_hi, 0x2ad1)
        u2 = unit_interval_traced(pids, ti_lo, ti_hi, 0x2ad2)
        z = 2.0 * u1 - 1.0
        s = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
        phi = jnp.float32(2.0 * 3.14159265358979) * u2
        return jnp.stack([s * jnp.cos(phi), s * jnp.sin(phi), z], axis=-1)

    @staticmethod
    def pair_momentum(energy, m_plus, m_minus):
        """q = sqrt(2 E m+ m- / (m+ + m-)); 0 when either side missing."""
        ok = (m_plus > 0) & (m_minus > 0) & (energy > 0)
        q = jnp.sqrt(jnp.maximum(
            2.0 * energy * m_plus * m_minus
            / jnp.maximum(m_plus + m_minus, 1e-30), 0.0))
        return jnp.where(ok, q, 0.0)
