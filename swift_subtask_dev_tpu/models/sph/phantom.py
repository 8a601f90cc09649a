"""Phantom-flavoured SPH — density-energy with Morris & Monaghan /
Cullen & Dehnen style variable viscosity and fixed Price (2017) thermal
diffusion.

Reference: src/hydro/Phantom/ (hydro.h, hydro_iact.h): a "reduced
SPHENIX" — the ANARCHY viscosity evolution (alpha_loc = alpha_max
S / (v_sig²/4 + S), exponential decay over the sound-crossing time,
hydro.h:752-801) with the alpha folded into the Balsara factor
(hydro.h:807), a gradient loop that only tracks the signal velocity
(hydro_iact.h:240), and a CONSTANT diffusion alpha with
v_diff = sqrt(2|Pi-Pj|/(rhoi+rhoj)) + dv.r/r (hydro_iact.h:384).
"""

from __future__ import annotations

import sys
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp

from . import sphenix
from .eos import IdealGas
from .kernels import CUBIC_SPLINE, SPHKernel
from .sphenix import CONST_VISCOSITY_BETA, CosmoFactors, _safe_h

F32 = jnp.float32

HAS_GRADIENT_LOOP = True
PREPARE_FORCE_KEYS = ("alpha_visc", "div_v_prev", "balsara")

# shared density-energy machinery
density_terms = sphenix.density_terms
end_density = sphenix.end_density
ghost_h_update = sphenix.ghost_h_update
no_neighbours_fallback = sphenix.no_neighbours_fallback
reset_acceleration = sphenix.reset_acceleration
end_force = sphenix.end_force
predict_extra = sphenix.predict_extra
reset_predicted_values = sphenix.reset_predicted_values
kick_extra = sphenix.kick_extra
compute_timestep = sphenix.compute_timestep
timestep_h_change_limit = sphenix.timestep_h_change_limit
init_part = sphenix.init_part
prepare_gradient = sphenix.prepare_gradient
reset_gradient = sphenix.reset_gradient
end_gradient = sphenix.end_gradient


@dataclass(frozen=True)
class PhantomParams:
    """SPH: YAML section for the Phantom scheme (hydro_parameters.h)."""

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
    viscosity_alpha: float = 0.1          # initial value
    viscosity_alpha_min: float = 0.0
    viscosity_alpha_max: float = 2.0
    viscosity_length: float = 0.05
    diffusion_alpha: float = 1.0          # CONSTANT (Price 2017)

    @property
    def eta_dim(self) -> float:
        return self.eta_neighbours ** 3

    @property
    def mod(self):
        return _THIS_MODULE


def gradient_terms(p: PhantomParams, dx, r2, hinv_i, m_j, dv,
                   u_i, u_j, rhoinv_j, cs_i, cs_j, alpha_visc_j,
                   cosmo: CosmoFactors):
    """Phantom gradient loop: only the v_sig max reduction
    (runner_iact_nonsym_gradient, hydro_iact.h:240)."""
    r_inv = jnp.where(r2 > 0, jax.lax.rsqrt(jnp.maximum(r2, 1e-38)), 0.0)
    dvdr = dv[0] * dx[0] + dv[1] * dx[1] + dv[2] * dx[2]
    dvdr_Hubble = dvdr + cosmo.a * cosmo.a * cosmo.H * r2
    omega_ij = jnp.minimum(dvdr_Hubble, 0.0)
    mu_ij = cosmo.fac_mu * r_inv * omega_ij
    new_v_sig = cs_i + cs_j - CONST_VISCOSITY_BETA * mu_ij
    return {
        "sum": {"laplace_u": jnp.zeros_like(r2)},
        "max": {"v_sig": new_v_sig,
                "alpha_visc_max_ngb": alpha_visc_j},
    }


def anarchy_alpha_evolution(p, s, cosmo: CosmoFactors, dt_alpha):
    """Shared ANARCHY viscosity-alpha update (Phantom hydro.h:752-801 ==
    AnarchyPU hydro.h prepare_force): source from -d(div v)/dt, trigger on
    v_sig²/4, exponential decay over the sound-crossing time."""
    kern_supp = _safe_h(s) * cosmo.a * p.kernel.gamma
    kern_supp_inv = 1.0 / kern_supp
    v_sig_phys = s["v_sig"] * cosmo.a_factor_sound_speed
    soundspeed_phys = s["soundspeed"] * cosmo.a_factor_sound_speed
    sound_crossing_inv = soundspeed_phys * kern_supp_inv

    div_v_dt = jnp.where(dt_alpha == 0.0, 0.0,
                         (s["div_v"] - s["div_v_prev"])
                         / jnp.maximum(dt_alpha, 1e-30))
    S = kern_supp ** 2 * jnp.maximum(0.0, -div_v_dt)
    v_sig2 = 0.25 * v_sig_phys * v_sig_phys
    alpha_loc = p.viscosity_alpha_max * S / (v_sig2 + S + 1e-30)

    alpha_decayed = alpha_loc + (s["alpha_visc"] - alpha_loc) * jnp.exp(
        -dt_alpha * sound_crossing_inv * p.viscosity_length)
    alpha = jnp.where(alpha_loc > s["alpha_visc"], alpha_loc,
                      alpha_decayed)
    return jnp.maximum(alpha, p.viscosity_alpha_min)


def prepare_force(p: PhantomParams, s, cosmo: CosmoFactors, dt_alpha):
    """Alpha evolution + alpha folded into Balsara (hydro.h:752-810)."""
    alpha = anarchy_alpha_evolution(p, s, cosmo, dt_alpha)
    return {**s, "alpha_visc": alpha, "div_v_prev": s["div_v"],
            "balsara": s["balsara"] * alpha}


def force_terms(p: PhantomParams, dx, r2, hinv_i, hinv_j, m_i, m_j,
                minv_i, minv_j, dv,
                rho_i, rho_j, rhoinv_i, rhoinv_j, pr2_i, pr2_j,
                P_i, P_j, cs_i, cs_j, f_i, f_j,
                balsara_i, balsara_j, alpha_i, alpha_j,
                alpha_diff_i, alpha_diff_j, u_i, u_j,
                cosmo: CosmoFactors):
    """Phantom force loop (runner_iact_force, hydro_iact.h:330-400):
    per-particle-density viscosity convolution, fixed-alpha Price
    diffusion.  balsara_i/j already carry the evolved alphas; the
    diffusion alphas are the constant p.diffusion_alpha."""
    r_inv = jnp.where(r2 > 0, jax.lax.rsqrt(jnp.maximum(r2, 1e-38)), 0.0)
    r = r2 * r_inv

    hid_inv = (hinv_i * hinv_i) * (hinv_i * hinv_i)
    xi = r * hinv_i
    wi, wi_dx = p.kernel.deval(xi)
    wi_dr = hid_inv * wi_dx

    hjd_inv = (hinv_j * hinv_j) * (hinv_j * hinv_j)
    xj = r * hinv_j
    wj, wj_dx = p.kernel.deval(xj)
    wj_dr = hjd_inv * wj_dx

    dvdr = dv[0] * dx[0] + dv[1] * dx[1] + dv[2] * dx[2]
    dvdr_Hubble = dvdr + cosmo.a * cosmo.a * cosmo.H * r2
    omega_ij = jnp.minimum(dvdr_Hubble, 0.0)
    mu_ij = cosmo.fac_mu * r_inv * omega_ij

    v_sig = cs_i + cs_j - CONST_VISCOSITY_BETA * mu_ij

    f_ij = 1.0 - f_i * minv_j
    f_ji = 1.0 - f_j * minv_i

    # viscosity convolved per-particle (hydro_iact.h:352): note the
    # 1/8 factor and the f rho^-1 weights inside the kernel mean
    visc = -0.125 * v_sig * mu_ij * (balsara_i + balsara_j)
    kernel_mean = (wi_dr * f_ij * rhoinv_i + wj_dr * f_ji * rhoinv_j)
    visc_acc_term = 0.5 * visc * kernel_mean * r_inv

    P_over_rho2_i = pr2_i * f_ij
    P_over_rho2_j = pr2_j * f_ji
    sph_acc_term = (P_over_rho2_i * wi_dr + P_over_rho2_j * wj_dr) * r_inv
    acc = sph_acc_term + visc_acc_term

    sph_du_term_i = P_over_rho2_i * dvdr * r_inv * wi_dr
    visc_du_term = 0.5 * visc_acc_term * dvdr_Hubble

    # Price (2017) diffusion with constant alphas (hydro_iact.h:384)
    v_diff = jnp.sqrt(2.0 * jnp.abs(P_i - P_j) / (rho_i + rho_j)) \
        + dvdr_Hubble * r_inv
    alpha_diff = 0.5 * (alpha_diff_i + alpha_diff_j)
    diff_du_term = alpha_diff * v_diff * (u_i - u_j) * 0.5 * kernel_mean

    du_dt_i = sph_du_term_i + visc_du_term + diff_du_term

    return {
        "sum": {
            "a_hydro0": -m_j * acc * dx[0],
            "a_hydro1": -m_j * acc * dx[1],
            "a_hydro2": -m_j * acc * dx[2],
            "u_dt": du_dt_i * m_j,
            "h_dt": -m_j * dvdr * r_inv * rhoinv_j * wi_dr,
        },
        "max": {
            "v_sig": v_sig,
        },
    }


_THIS_MODULE = sys.modules[__name__]
