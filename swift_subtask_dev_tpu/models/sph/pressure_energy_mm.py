"""Pressure-Energy SPH with Morris & Monaghan (1997) variable viscosity.

Reference: src/hydro/PressureEnergyMorrisMonaghanAV/ — PressureEnergy's
smoothed-pressure formulation (the density loop, P-U equation of motion
and lifecycle are byte-identical to the fixed-alpha flavour) with a
per-particle evolved viscosity alpha:
  dalpha/dt = -min(div_v, 0) + (alpha_min - alpha)/tau,
  1/tau = ell * c_s,phys / h_phys                (hydro.h:745-765)
and the force loop using alpha_ij = (alpha_i + alpha_j)/2 with the BARE
Balsara switch (hydro_iact.h:301-303).
"""

from __future__ import annotations

import sys
from dataclasses import dataclass, field

import jax.numpy as jnp

from . import pressure_energy as pe
from . import sphenix
from .eos import IdealGas
from .kernels import CUBIC_SPLINE, SPHKernel
from .sphenix import CosmoFactors

F32 = jnp.float32

HAS_GRADIENT_LOOP = False
DENSITY_NEEDS_U = True
DENSITY_EXTRA_KEYS = pe.DENSITY_EXTRA_KEYS
EXTRA_STATE_KEYS = pe.EXTRA_STATE_KEYS
PREPARE_FORCE_KEYS = ("alpha_visc",)

# all the P-U machinery is shared with the fixed-alpha scheme
density_terms = pe.density_terms
end_density = pe.end_density
no_neighbours_fallback = pe.no_neighbours_fallback
reset_gradient = pe.reset_gradient
gradient_terms = pe.gradient_terms
end_gradient = pe.end_gradient
predict_extra = pe.predict_extra
reset_predicted_values = pe.reset_predicted_values
kick_extra = pe.kick_extra
ghost_h_update = sphenix.ghost_h_update
reset_acceleration = sphenix.reset_acceleration
end_force = pe.end_force
compute_timestep = sphenix.compute_timestep
timestep_h_change_limit = sphenix.timestep_h_change_limit
init_part = sphenix.init_part


@dataclass(frozen=True)
class PressureEnergyMMParams:
    """SPH: YAML section (hydro_parameters.h:63-74 defaults)."""

    kernel: SPHKernel = CUBIC_SPLINE
    eos: IdealGas = field(default_factory=IdealGas)
    eta_neighbours: float = 1.2348
    h_tolerance: float = 1e-4
    CFL: float = 0.1
    h_max: float = 1e30
    h_min: float = 0.0
    max_smoothing_iterations: int = 30
    minimal_internal_energy: float = 0.0
    log_max_h_change: float = 0.0953101798  # ln(1.1)
    viscosity_alpha: float = 0.8            # initial (evolved)
    viscosity_alpha_min: float = 0.1
    viscosity_alpha_max: float = 2.0
    viscosity_length: float = 0.1           # ell in 1/tau
    diffusion_alpha: float = 0.0

    @property
    def eta_dim(self) -> float:
        return self.eta_neighbours ** 3

    @property
    def mod(self):
        return _THIS_MODULE


def prepare_gradient(p: PressureEnergyMMParams, s, cosmo: CosmoFactors):
    """P-U prepare with the Balsara left BARE — the force loop applies the
    evolved alpha_ij instead (hydro.h:712 vs PressureEnergy's fold)."""
    return pe.prepare_gradient(p, s, cosmo, fold_alpha=False)


def prepare_force(p: PressureEnergyMMParams, s, cosmo: CosmoFactors,
                  dt_alpha):
    """Morris & Monaghan alpha evolution (hydro.h:745-765): source
    -min(div_v, 0) + decay toward alpha_min over ell sound-crossings."""
    h_inv_phys = 1.0 / (jnp.maximum(s["h"], 1e-30) * cosmo.a)
    cs_phys = s["soundspeed"] * cosmo.a_factor_sound_speed
    inverse_tau = jnp.float32(p.viscosity_length) * cs_phys * h_inv_phys
    source = -jnp.minimum(s["div_v"], 0.0)
    dalpha_dt = source + (jnp.float32(p.viscosity_alpha_min)
                          - s["alpha_visc"]) * inverse_tau
    alpha = jnp.clip(s["alpha_visc"] + dalpha_dt * dt_alpha,
                     p.viscosity_alpha_min, p.viscosity_alpha_max)
    return {**s, "alpha_visc": alpha}


def force_terms(p: PressureEnergyMMParams, dx, r2, hinv_i, hinv_j,
                m_i, m_j, minv_i, minv_j, dv,
                rho_i, rho_j, rhoinv_i, rhoinv_j, pr2_i, pr2_j,
                P_i, P_j, cs_i, cs_j, f_i, f_j,
                balsara_i, balsara_j, alpha_i, alpha_j,
                alpha_diff_i, alpha_diff_j, u_i, u_j,
                cosmo: CosmoFactors):
    """P-U equation of motion with alpha_ij = (alpha_i+alpha_j)/2 on the
    bare-Balsara viscosity (hydro_iact.h:296-310).  Implemented by
    scaling the Balsara inputs fed to the shared P-U term function —
    visc is linear in (balsara_i + balsara_j)."""
    alpha_ij = 0.5 * (alpha_i + alpha_j)
    return pe.force_terms(
        p, dx, r2, hinv_i, hinv_j, m_i, m_j, minv_i, minv_j, dv,
        rho_i, rho_j, rhoinv_i, rhoinv_j, pr2_i, pr2_j,
        P_i, P_j, cs_i, cs_j, f_i, f_j,
        balsara_i * alpha_ij, balsara_j * alpha_ij, alpha_i, alpha_j,
        alpha_diff_i, alpha_diff_j, u_i, u_j, cosmo)


_THIS_MODULE = sys.modules[__name__]
