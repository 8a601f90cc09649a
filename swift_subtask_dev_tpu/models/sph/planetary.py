"""Planetary SPH scheme — Minimal-style density-energy SPH with
multi-material equations of state.

Reference: src/hydro/Planetary/ (hydro_iact.h force loop == Minimal's
Price-2012 form; hydro.h lifecycle calls the planetary EOS with the
particle's mat_id everywhere — hydro.h:132,692-696,793-797).  The scheme
carries a per-particle integer ``mat_id`` (loaded from the ICs'
PartType0/MaterialIDs, planetary hydro_io.h) through the tiled state via
``EXTRA_STATE_KEYS`` and evaluates pressure/soundspeed through
models/sph/planetary_eos.PlanetaryEOS — each EOS family once over the
tile, branchlessly, instead of the reference's per-particle switch.

Scheme 13 of the reference's 14 (configure.ac --with-hydro=planetary).
"""

from __future__ import annotations

import sys
from dataclasses import dataclass, field

import jax.numpy as jnp

from . import minimal, sphenix
from .kernels import CUBIC_SPLINE, SPHKernel
from .planetary_eos import ID_IDG_DEF, PlanetaryEOS
from .sphenix import HYDRO_DIM_INV, CosmoFactors, _safe_h

F32 = jnp.float32

HAS_GRADIENT_LOOP = False

# the material id rides the tiled state through rebuilds / rebuckets
EXTRA_STATE_KEYS = ("mat_id",)
EXTRA_STATE_INT_KEYS = ("mat_id",)

# shared scheme-generic lifecycle (identical machinery in the reference)
density_terms = sphenix.density_terms
end_density = sphenix.end_density
ghost_h_update = sphenix.ghost_h_update
no_neighbours_fallback = sphenix.no_neighbours_fallback
reset_acceleration = sphenix.reset_acceleration
end_force = sphenix.end_force
kick_extra = sphenix.kick_extra
compute_timestep = sphenix.compute_timestep
timestep_h_change_limit = sphenix.timestep_h_change_limit
init_part = sphenix.init_part
reset_gradient = minimal.reset_gradient
gradient_terms = minimal.gradient_terms
end_gradient = minimal.end_gradient
force_terms = minimal.force_terms  # Price-2012 form (hydro_iact.h:307-342)


@dataclass(frozen=True)
class PlanetaryParams:
    """SPH: YAML section for the Planetary scheme (hydro_parameters.h)."""

    kernel: SPHKernel = CUBIC_SPLINE
    eos: PlanetaryEOS = field(
        default_factory=lambda: PlanetaryEOS(materials=(ID_IDG_DEF,)))
    eta_neighbours: float = 1.2348
    h_tolerance: float = 1e-4
    CFL: float = 0.1
    h_max: float = 1e30
    h_min: float = 0.0
    max_smoothing_iterations: int = 30
    minimal_internal_energy: float = 0.0
    log_max_h_change: float = 0.0953101798  # ln(1.1)
    viscosity_alpha: float = 1.5   # planetary hydro_parameters.h default
    diffusion_alpha: float = 0.0

    @property
    def eta_dim(self) -> float:
        return self.eta_neighbours ** 3

    @property
    def mod(self):
        return _THIS_MODULE


def _P_cs(p: PlanetaryParams, rho, u, mat_id):
    rho_s = jnp.maximum(rho, 1e-30)
    P = p.eos.pressure_from_internal_energy(rho_s, u, mat_id)
    cs = p.eos.soundspeed_from_internal_energy(rho_s, u, mat_id)
    return P, cs


def prepare_gradient(p: PlanetaryParams, s, cosmo: CosmoFactors):
    """Balsara + grad-h + EOS-by-material (planetary hydro.h:676-712);
    the constant viscosity alpha folds into the Balsara factor like
    Minimal's (hydro.h:754)."""
    P, cs = _P_cs(p, s["rho"], s["u"], s["mat_id"])
    curl_v = jnp.sqrt(jnp.sum(s["rot_v"] ** 2, axis=-1))
    abs_div_v = jnp.abs(s["div_v"])
    balsara = abs_div_v / (
        abs_div_v + curl_v + 1e-30
        + 0.0001 * cs * cosmo.a_factor_Balsara_eps
        / jnp.maximum(s["h"], 1e-30))

    common = s["h"] * HYDRO_DIM_INV / jnp.maximum(s["wcount"], 1e-30)
    grad_W_term = common * s["wcount_dh"]
    grad_h_term = jnp.where(
        grad_W_term < -0.9999, 0.0,
        common * s["rho_dh"] / (1.0 + grad_W_term))
    grad_h_term = jnp.where(s["h"] > 0.9999 * p.h_max, 0.0, grad_h_term)
    return {**s, "f_gradh": grad_h_term, "pressure": P, "soundspeed": cs,
            "balsara": balsara * jnp.float32(p.viscosity_alpha)}


def prepare_force(p: PlanetaryParams, s, cosmo: CosmoFactors, dt_alpha):
    """Constant viscosity alpha — nothing evolves (hydro.h:838)."""
    return s


def predict_extra(p: PlanetaryParams, s, cosmo: CosmoFactors, dt_drift,
                  dt_therm):
    """Drift extrapolation with the material EOS (hydro_predict_extra,
    planetary hydro.h:760-800)."""
    u = s["u"] + s["u_dt"] * dt_therm
    h_inv = 1.0 / _safe_h(s)
    w1 = s["h_dt"] * h_inv * dt_drift
    h = jnp.clip(s["h"] * jnp.exp(w1), 0.0, p.h_max)
    rho = s["rho"] * jnp.exp(-3.0 * w1)
    min_u = p.minimal_internal_energy / cosmo.a_factor_internal_energy
    u = jnp.maximum(u, min_u)
    P, cs = _P_cs(p, rho, u, s["mat_id"])
    v_sig = jnp.maximum(s["v_sig"], 2.0 * cs)
    return {**s, "u": u, "h": h, "rho": rho, "pressure": P,
            "soundspeed": cs, "v_sig": v_sig}


def reset_predicted_values(p: PlanetaryParams, s):
    """hydro_reset_predicted_values (planetary hydro.h:820-860)."""
    P, cs = _P_cs(p, s["rho"], s["u_full"], s["mat_id"])
    return {**s, "v": s["v_full"], "u": s["u_full"], "pressure": P,
            "soundspeed": cs,
            "v_sig": jnp.maximum(s["v_sig"], 2.0 * cs)}


_THIS_MODULE = sys.modules[__name__]
