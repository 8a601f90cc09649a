"""'None' hydro scheme — neighbour densities only, no hydrodynamics.

Reference: src/hydro/None/: gas particles still find neighbours and
measure rho/h (so subgrid models and outputs work) but feel no hydro
force and impose no CFL limit; used for gravity-only runs that still
carry gas properties.
"""

from __future__ import annotations

import sys
from dataclasses import dataclass, field

import jax.numpy as jnp

from . import sphenix
from .eos import IdealGas
from .kernels import CUBIC_SPLINE, SPHKernel
from .sphenix import CosmoFactors

F32 = jnp.float32

HAS_GRADIENT_LOOP = False

density_terms = sphenix.density_terms
end_density = sphenix.end_density
ghost_h_update = sphenix.ghost_h_update
no_neighbours_fallback = sphenix.no_neighbours_fallback
init_part = sphenix.init_part
prepare_gradient = sphenix.prepare_gradient
reset_predicted_values = sphenix.reset_predicted_values


@dataclass(frozen=True)
class NoneParams:
    kernel: SPHKernel = CUBIC_SPLINE
    eos: IdealGas = field(default_factory=IdealGas)
    eta_neighbours: float = 1.2348
    h_tolerance: float = 1e-4
    CFL: float = 0.1
    h_max: float = 1e30
    h_min: float = 0.0
    max_smoothing_iterations: int = 30
    minimal_internal_energy: float = 0.0
    log_max_h_change: float = 0.0953101798
    viscosity_alpha: float = 0.0
    diffusion_alpha: float = 0.0

    @property
    def eta_dim(self) -> float:
        return self.eta_neighbours ** 3

    @property
    def mod(self):
        return _THIS_MODULE


def reset_gradient(s):
    return {**s, "v_sig": jnp.zeros_like(s["v_sig"]),
            "alpha_visc_max_ngb": s["alpha_visc"]}


def gradient_terms(*args, **kw):  # pragma: no cover
    raise RuntimeError("None scheme has no gradient loop")


def end_gradient(s):
    return s


def prepare_force(p: NoneParams, s, cosmo: CosmoFactors, dt_alpha):
    return s


def reset_acceleration(s):
    return {**s, "a_hydro": jnp.zeros_like(s["a_hydro"]),
            "u_dt": jnp.zeros_like(s["u_dt"]),
            "h_dt": jnp.zeros_like(s["h_dt"])}


def force_terms(p: NoneParams, dx, r2, hinv_i, hinv_j, m_i, m_j,
                minv_i, minv_j, dv,
                rho_i, rho_j, rhoinv_i, rhoinv_j, pr2_i, pr2_j,
                P_i, P_j, cs_i, cs_j, f_i, f_j,
                balsara_i, balsara_j, alpha_i, alpha_j,
                alpha_diff_i, alpha_diff_j, u_i, u_j,
                cosmo: CosmoFactors):
    z = jnp.zeros_like(r2)
    return {"sum": {"a_hydro0": z, "a_hydro1": z, "a_hydro2": z,
                    "u_dt": z, "h_dt": z},
            "max": {"v_sig": z}}


def end_force(p, s):
    return s


def predict_extra(p: NoneParams, s, cosmo: CosmoFactors, dt_drift,
                  dt_therm):
    return s


def kick_extra(p: NoneParams, s, cosmo: CosmoFactors, dt_therm):
    return s


def compute_timestep(p: NoneParams, s, cosmo: CosmoFactors):
    """No CFL limit (hydro/None timestep = FLT_MAX)."""
    return jnp.full_like(s["h"], 1e30)


def timestep_h_change_limit(p: NoneParams, s):
    return jnp.full_like(s["h"], 1e30)


_THIS_MODULE = sys.modules[__name__]
