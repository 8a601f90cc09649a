"""GIZMO MFV — the meshless finite-volume scheme (Hopkins 2015).

Shares the whole geometry/gradient/limiter pipeline with MFM
(models/sph/gizmo.py; src/hydro/Gizmo/), but exchanges the **full**
Riemann flux across the face, so mass crosses interfaces
(MFV/hydro_flux.h:99-123): particles keep their positions' role but their
masses, momenta and energies evolve as finite volumes.

Rate mapping onto the engine slots (MFV/hydro_flux.h, thermal-energy
convention):

  dm/dt       = -A F0
  m dv/dt     = -A F_mom - v dm/dt          (conserved momentum rate)
  d(m u)/dt   = -A (F_E - v.F_mom + F0 |v|^2/2)
  du/dt       = (d(m u)/dt - u dm/dt) / m

The particle velocity equals the fluid velocity (hydro_velocities_set,
MFV/hydro_velocities.h:43 — the default, no GIZMO_STEER_MOTION centroid
correction), so `v` plays both roles, exactly like MFM.  Mass updates ride
the kick via KICK_EXTRA_KEYS; the per-kick mass loss is floored at 99% to
keep 1/m finite (the reference instead errors on negative masses,
hydro.h:760).
"""

from __future__ import annotations

import sys
from dataclasses import dataclass, field

import jax.numpy as jnp

from .. import riemann
from . import gizmo, sphenix
from .eos import IdealGas
from .kernels import CUBIC_SPLINE, SPHKernel
from .sphenix import CONST_VISCOSITY_BETA, CosmoFactors

F32 = jnp.float32

HAS_GRADIENT_LOOP = True
DENSITY_EXTRA_KEYS = gizmo.DENSITY_EXTRA_KEYS
GRADIENT_SUM_KEYS = gizmo.GRADIENT_SUM_KEYS
GRADIENT_MAX_KEYS = gizmo.GRADIENT_MAX_KEYS
GRADIENT_J_EXTRA = gizmo.GRADIENT_J_EXTRA
GRADIENT_END_KEYS = gizmo.GRADIENT_END_KEYS
FORCE_J_EXTRA = gizmo.FORCE_J_EXTRA
PREPARE_GRADIENT_KEYS = gizmo.PREPARE_GRADIENT_KEYS
PREPARE_FORCE_KEYS = ()
EXTRA_STATE_KEYS = gizmo.EXTRA_STATE_KEYS + ("m_dt",)
FORCE_EXTRA_SUM_KEYS = ("m_dt",)
KICK_EXTRA_KEYS = ("u_full", "u_dt", "m")


@dataclass(frozen=True)
class GizmoMFVParams:
    """SPH: section parameters for gizmo-mfv (hydro_parameters.h)."""

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
    viscosity_alpha: float = 0.0
    diffusion_alpha: float = 0.0
    riemann_solver: str = "exact"  # exact | hllc | trrs (full-flux family)
    riemann_iters: int = 12

    @property
    def eta_dim(self) -> float:
        return self.eta_neighbours ** 3

    @property
    def mod(self):
        return _THIS_MODULE


# shared Gizmo pipeline
density_terms = gizmo.density_terms
end_density = gizmo.end_density
no_neighbours_fallback = gizmo.no_neighbours_fallback
prepare_gradient = gizmo.prepare_gradient
reset_gradient = gizmo.reset_gradient
gradient_terms = gizmo.gradient_terms
end_gradient = gizmo.end_gradient
prepare_force = gizmo.prepare_force
predict_extra = gizmo.predict_extra
reset_predicted_values = sphenix.reset_predicted_values
compute_timestep = gizmo.compute_timestep
ghost_h_update = sphenix.ghost_h_update
timestep_h_change_limit = sphenix.timestep_h_change_limit
end_force = sphenix.end_force
init_part = sphenix.init_part


def reset_acceleration(s):
    return {**s, "a_hydro": jnp.zeros_like(s["a_hydro"]),
            "u_dt": jnp.zeros_like(s["u_dt"]),
            "h_dt": jnp.zeros_like(s["h_dt"]),
            "m_dt": jnp.zeros_like(s["m_dt"])}


def force_terms(p: GizmoMFVParams, dx, r2, hinv_i, hinv_j, m_i, m_j,
                minv_i, minv_j, dv,
                rho_i, rho_j, rhoinv_i, rhoinv_j, pr2_i, pr2_j,
                P_i, P_j, cs_i, cs_j, f_i, f_j,
                balsara_i, balsara_j, alpha_i, alpha_j,
                alpha_diff_i, alpha_diff_j, u_i, u_j,
                *extra, cosmo: CosmoFactors = None):
    """MFV flux exchange: full Riemann flux over the effective face
    (hydro_compute_flux, MFV/hydro_flux.h:76 + riemann_solve_for_flux),
    with the mass flux carried as its own rate slot."""
    WL, WR, n_unit, vij, Anorm, has_face, aux = \
        gizmo._gizmo_face_and_states(
            p, dx, r2, hinv_i, hinv_j, dv, rho_i, rho_j, P_i, P_j, extra)
    r_inv, wi_dr, dvdr, _, _ = aux
    fv0_i, fv1_i, fv2_i = extra[4], extra[6], extra[8]

    gamma = float(p.eos.gamma)
    solver = riemann.SOLVERS.get(p.riemann_solver, riemann.exact_flux)
    F = solver(WL, WR, n_unit, vij, gamma)
    w_face = jnp.where(has_face, Anorm, 0.0)

    m_dt = -F[0] * w_face
    # momentum rate -> velocity rate for a varying-mass particle
    a0 = (-F[1] * w_face - fv0_i * m_dt) * minv_i
    a1 = (-F[2] * w_face - fv1_i * m_dt) * minv_i
    a2 = (-F[3] * w_face - fv2_i * m_dt) * minv_i
    # thermal-energy rate (MFV/hydro_flux.h:112-121)
    ekin_i = 0.5 * (fv0_i * fv0_i + fv1_i * fv1_i + fv2_i * fv2_i)
    dE = -(F[4] - F[1] * fv0_i - F[2] * fv1_i - F[3] * fv2_i
           + F[0] * ekin_i) * w_face
    u_dt = (dE - u_i * m_dt) * minv_i

    dvdotdx = jnp.minimum(dvdr, 0.0)
    mu_ij = cosmo.fac_mu * r_inv * dvdotdx
    v_sig = cs_i + cs_j - CONST_VISCOSITY_BETA * mu_ij

    return {
        "sum": {
            "a_hydro0": a0,
            "a_hydro1": a1,
            "a_hydro2": a2,
            "u_dt": u_dt,
            "h_dt": -m_j * dvdr * r_inv * rhoinv_j * wi_dr,
            "m_dt": m_dt,
        },
        "max": {
            "v_sig": v_sig,
        },
    }


def kick_extra(p: GizmoMFVParams, s, cosmo: CosmoFactors, dt_therm):
    """Thermal kick + the mass flux update (hydro_kick_extra, hydro.h:707
    with hydro_gizmo_mfv_mass_update_term)."""
    base = sphenix.kick_extra(p, s, cosmo, dt_therm)
    m_new = s["m"] + s["m_dt"] * dt_therm
    # floor: never lose more than 99% of the mass in one kick (the
    # reference errors out instead, hydro.h:760)
    m_new = jnp.maximum(m_new, 0.01 * s["m"])
    return {**base, "m": m_new * (s["mask"] if "mask" in s else 1.0)}


_THIS_MODULE = sys.modules[__name__]
