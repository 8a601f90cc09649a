"""GEAR sink particles: formation, gas accretion, mergers.

Reference src/sink/GEAR/ (sink.h, sink_iact.h, sink_properties.h) +
src/runner_sinks.c:

* **Formation** (sink.h:149 sink_is_forming): a gas particle forms a
  sink when its physical density exceeds ``density_threashold`` (the
  reference's YAML spelling) AND its temperature is below
  ``maximal_temperature`` AND it is the local potential minimum among
  gas within ``cut_off_radius`` (sink_iact.h:53 clears can_form_sink
  for the higher-potential member of every such pair).  Conversion is
  deterministic once eligible (sink.h:190 sink_should_convert_to_sink
  returns 1 — no stochastic draw).
* **Gas accretion** (sink_iact.h:135 + sink.h:241 sink_swallow_part):
  every gas particle within a sink's r_cut is swallowed (largest sink
  pid wins contested gas); the sink gains the mass and momentum and
  records the swallowed angular momentum.
* **Mergers** (sink_iact.h:85 + sink.h:312 sink_swallow_sink): the
  lighter sink within either cut-off radius merges onto the heavier.
* Star spawning from sinks is disabled in the reference at this
  version (sink.h:364 sink_spawn_star returns 0 unconditionally) and
  is therefore not modelled.

Temperature gate: the reference calls cooling_get_temperature; here the
ceiling is converted ONCE to an internal-energy ceiling
u_max = kB T_max / ((gamma-1) mu m_p) with the neutral mean molecular
weight mu = 4/(1+3X) (the gas eligible for sink formation is cold and
neutral, where this is the reference's own asymptote).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

F32 = jnp.float32


@dataclass(frozen=True)
class GEARSinks:
    """GEARSink YAML section (sink_properties.h:46 sink_props_init)."""

    cut_off_radius: float = 0.0
    density_threshold: float = 0.0   # physical, internal units
    u_max: float = 1e30              # from maximal_temperature

    @staticmethod
    def from_params(params, units, phys_const,
                    hydrogen_mass_fraction: float = 0.755
                    ) -> "GEARSinks":
        sec = "GEARSink"
        r_cut = params.get_float(sec, "cut_off_radius")
        T_max = params.get_float(sec, "maximal_temperature")
        # accept the reference's YAML spelling and the corrected one
        rho_t = params.opt_float(sec, "density_threashold", -1.0)
        if rho_t < 0:
            rho_t = params.get_float(sec, "density_threshold")
        kB = phys_const.const_boltzmann_k
        m_p = phys_const.const_proton_mass
        mu_neutral = 4.0 / (1.0 + 3.0 * hydrogen_mass_fraction)
        gamma = 5.0 / 3.0
        T_internal = T_max * units.from_cgs("temperature")
        u_max = kB * T_internal / ((gamma - 1.0) * mu_neutral * m_p)
        return GEARSinks(cut_off_radius=r_cut, density_threshold=rho_t,
                         u_max=u_max)

    def formation_mask(self, s, cosmo, active, can_form):
        """Deterministic eligibility (sink.h:149-199): physical density
        above threshold, internal energy below the ceiling, potential-
        minimum gate passed, and active this step."""
        rho_phys = jnp.maximum(s["rho"], 0.0) * cosmo.a_inv2 / cosmo.a
        u_phys = s["u_full"] * cosmo.a_factor_internal_energy
        return (active & (can_form > 0)
                & (rho_phys > jnp.float32(self.density_threshold))
                & (u_phys < jnp.float32(self.u_max)))
