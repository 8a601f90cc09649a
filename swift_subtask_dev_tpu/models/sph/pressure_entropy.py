"""Pressure-Entropy (P-A) SPH — smoothed-pressure formulation evolving
the entropic function.

Reference: src/hydro/PressureEntropy/ (Hopkins 2013 pressure-entropy
SPH): the evolved thermodynamic variable is the entropic function
A = P/rho^gamma riding in the engine's ``u`` slots (like Gadget2), and
the density loop additionally accumulates the WEIGHTED density
rho_bar_i = (1/A_i^{1/g}) Sum_j m_j A_j^{1/g} W_ij (hydro_iact.h:79,
hydro.h:522-526) so that the smoothed pressure is
P_bar = A rho_bar^gamma (hydro.h:644 gas_pressure_from_entropy).  The
equation of motion is the Hopkins cross-entropy form
(S_j/S_i - f_i/S_i) P_bar_i/rho_bar_i^2 grad_i W
(hydro_iact.h:398-441) with f the two-factor grad-h term
(hydro.h:684-705).  Constant-alpha Monaghan viscosity with the Balsara
switch; no gradient loop; the raw viscous entropy generation is
converted to dA/dt in end_force (hydro.h:825-833).

The density-loop extras ride the generic backend protocol
(DENSITY_NEEDS_U feeds A_j, DENSITY_EXTRA_KEYS carries the two
weighted-density accumulators through every loop engine + ghost).
"""

from __future__ import annotations

import sys
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp

from . import gadget2, sphenix
from .eos import IdealGas
from .kernels import CUBIC_SPLINE, SPHKernel
from .sphenix import (CONST_VISCOSITY_BETA, HYDRO_DIM, HYDRO_DIM_INV,
                      CosmoFactors, _safe_h)

F32 = jnp.float32

HAS_GRADIENT_LOOP = False
DENSITY_NEEDS_U = True                      # u_j = A_j for the rho_bar sum
DENSITY_EXTRA_KEYS = ("rho_bar", "rho_bar_dh")
EXTRA_STATE_KEYS = ("rho_bar", "rho_bar_dh")

# scheme-generic lifecycle shared with the other schemes
ghost_h_update = sphenix.ghost_h_update
reset_acceleration = sphenix.reset_acceleration
compute_timestep = sphenix.compute_timestep
timestep_h_change_limit = sphenix.timestep_h_change_limit
init_part = sphenix.init_part
# entropy kick identical to Gadget2's (0.5x floor + min-energy bound,
# hydro.h:848-880 matches Gadget2's kick shape)
kick_extra = gadget2.kick_extra


@dataclass(frozen=True)
class PressureEntropyParams:
    """SPH: YAML section for the P-A scheme (hydro_parameters.h)."""

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
    viscosity_alpha: float = 0.8            # constant (no evolution)
    diffusion_alpha: float = 0.0

    @property
    def eta_dim(self) -> float:
        return self.eta_neighbours ** 3

    @property
    def mod(self):
        return _THIS_MODULE


# IC conversion helpers (hydro_convert_quantities, hydro.h:887-915);
# at IC time rho_bar ~ rho for near-uniform entropy
entropy_from_internal_energy = gadget2.entropy_from_internal_energy
internal_energy_from_entropy = gadget2.internal_energy_from_entropy


def _s_gamma(p, A):
    """A^{1/gamma} (pow_one_over_gamma, hydro.h) with padded-slot guard."""
    g_inv = jnp.float32(1.0 / p.eos.gamma)
    return jnp.maximum(A, 1e-30) ** g_inv


def density_terms(p: PressureEntropyParams, dx, r2, hinv_i, m_j, dv, u_j):
    """Density + weighted-density contributions (hydro_iact.h:55-100):
    rho_bar accumulates m_j A_j^{1/g} W, rho_bar_dh its -dh kick."""
    base = sphenix.density_terms(p, dx, r2, hinv_i, m_j, dv)
    r_inv = jnp.where(r2 > 0, jax.lax.rsqrt(jnp.maximum(r2, 1e-38)), 0.0)
    r = r2 * r_inv
    ui = r * hinv_i
    wi, wi_dx = p.kernel.deval(ui)
    kick = HYDRO_DIM * wi + ui * wi_dx
    mSj = m_j * _s_gamma(p, u_j)
    return {**base, "rho_bar": mSj * wi, "rho_bar_dh": -mSj * kick}


def end_density(p: PressureEntropyParams, s, cosmo: CosmoFactors):
    """Self terms + h factors + the final 1/S_gamma_i normalisation of
    rho_bar (hydro_end_density, hydro.h:493-533)."""
    out = sphenix.end_density(p, s, cosmo)
    h_inv = 1.0 / _safe_h(s)
    h_inv_dim = h_inv ** 3
    S_i = _s_gamma(p, s["u"])
    mS = s["m"] * S_i
    kroot = jnp.float32(p.kernel.root)
    rho_bar = (s["rho_bar"] + mS * kroot) * h_inv_dim / S_i
    rho_bar_dh = (s["rho_bar_dh"] - HYDRO_DIM * mS * kroot) \
        * h_inv_dim * h_inv
    return {**out, "rho_bar": rho_bar, "rho_bar_dh": rho_bar_dh}


def no_neighbours_fallback(p: PressureEntropyParams, s):
    """hydro_part_has_no_neighbours (hydro.h:581-609)."""
    out = sphenix.no_neighbours_fallback(p, s)
    h_inv_dim = (1.0 / _safe_h(s)) ** 3
    kroot = jnp.float32(p.kernel.root)
    none = s["wcount"] * s["h"] ** 3 < 1e-5 * p.eta_dim
    rho_bar = jnp.where(none, s["m"] * kroot * h_inv_dim, s["rho_bar"])
    rho_bar_dh = jnp.where(none, 0.0, s["rho_bar_dh"])
    return {**out, "rho_bar": rho_bar, "rho_bar_dh": rho_bar_dh}


def prepare_gradient(p: PressureEntropyParams, s, cosmo: CosmoFactors):
    """P_bar = A rho_bar^gamma, soundspeed from it, Balsara with the
    constant alpha folded, and the two-factor grad-h term
    f = [1/(1 + h rho_dh/(3 rho))] * [rho_bar_dh h / (3 rho)]
    (hydro_prepare_force, hydro.h:626-705)."""
    rho = jnp.maximum(s["rho"], 1e-30)
    rho_bar = jnp.maximum(s["rho_bar"], 1e-30)
    A = jnp.maximum(s["u"], 0.0)
    g = jnp.float32(p.eos.gamma)
    pressure = A * rho_bar ** g
    soundspeed = jnp.sqrt(g * jnp.maximum(pressure, 0.0) / rho_bar)

    curl_v = jnp.sqrt(jnp.sum(s["rot_v"] ** 2, axis=-1))
    abs_div_v = jnp.abs(s["div_v"])
    balsara = jnp.float32(p.viscosity_alpha) * abs_div_v / (
        abs_div_v + curl_v + 1e-30
        + 0.0001 * soundspeed * cosmo.a_factor_Balsara_eps
        / jnp.maximum(s["h"], 1e-30))

    rho_dh = jnp.where(s["h"] > 0.9999 * p.h_max, 0.0, s["rho_dh"])
    common = HYDRO_DIM_INV * s["h"] / rho
    grad_rho_term = common * rho_dh
    rho_dh_term = jnp.where(grad_rho_term < -0.9999, 1.0,
                            1.0 / (1.0 + grad_rho_term))
    pressure_dh_term = s["rho_bar_dh"] * common
    return {**s, "f_gradh": rho_dh_term * pressure_dh_term,
            "pressure": pressure, "soundspeed": soundspeed,
            "balsara": balsara}


def reset_gradient(s):
    return {**s, "v_sig": 2.0 * s["soundspeed"],
            "alpha_visc_max_ngb": s["alpha_visc"]}


def gradient_terms(*args, **kw):  # pragma: no cover - scheme has no loop
    raise RuntimeError("PressureEntropy scheme has no gradient loop")


def end_gradient(s):
    return s


def prepare_force(p: PressureEntropyParams, s, cosmo: CosmoFactors,
                  dt_alpha):
    """Constant alpha — nothing evolves."""
    return s


def force_terms(p: PressureEntropyParams, dx, r2, hinv_i, hinv_j, m_i, m_j,
                minv_i, minv_j, dv,
                rho_i, rho_j, rhoinv_i, rhoinv_j, pr2_i, pr2_j,
                P_i, P_j, cs_i, cs_j, f_i, f_j,
                balsara_i, balsara_j, alpha_i, alpha_j,
                alpha_diff_i, alpha_diff_j, u_i, u_j,
                cosmo: CosmoFactors):
    """P-A equation of motion (runner_iact_nonsym_force,
    hydro_iact.h:356-444).  P_i/P_j carry the smoothed pressure P_bar
    (set in prepare_gradient); rho_bar is recovered per pair as
    (P_bar/A)^{1/gamma} so P_over_rho2 = P_bar/rho_bar^2 needs no extra
    force-loop state slot; u_i/u_j carry the entropic function A."""
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

    S_i = _s_gamma(p, u_i)
    S_j = _s_gamma(p, u_j)
    # rho_bar = (P_bar/A)^{1/g}; P_over_rho2 = P_bar / rho_bar^2
    g_inv = jnp.float32(1.0 / p.eos.gamma)
    rho_bar_i = (jnp.maximum(P_i, 1e-30)
                 / jnp.maximum(u_i, 1e-30)) ** g_inv
    rho_bar_j = (jnp.maximum(P_j, 1e-30)
                 / jnp.maximum(u_j, 1e-30)) ** g_inv
    P2_i = P_i / (rho_bar_i * rho_bar_i)
    P2_j = P_j / (rho_bar_j * rho_bar_j)

    rho_ij_inv = 2.0 / (rho_i + rho_j)
    visc = -0.25 * v_sig * mu_ij * (balsara_i + balsara_j) * rho_ij_inv
    visc_term = 0.5 * visc * (wi_dr + wj_dr)
    sph_term = ((S_j / S_i - f_i / S_i) * P2_i * wi_dr
                + (S_i / S_j - f_j / S_j) * P2_j * wj_dr)
    acc = (visc_term + sph_term) * r_inv

    return {
        "sum": {
            "a_hydro0": -m_j * acc * dx[0],
            "a_hydro1": -m_j * acc * dx[1],
            "a_hydro2": -m_j * acc * dx[2],
            # raw viscous entropy generation (converted in end_force)
            "u_dt": m_j * visc_term * r_inv * dvdr_Hubble,
            "h_dt": -m_j * dvdr * r_inv * rhoinv_j * wi_dr,
        },
        "max": {
            "v_sig": v_sig,
        },
    }


def end_force(p: PressureEntropyParams, s):
    """hydro_end_force (hydro.h:825-833): h_dt dimension factor + raw
    entropy generation -> dA/dt = 0.5 (g-1) rho_bar^(1-g) * raw sum."""
    g = jnp.float32(p.eos.gamma)
    rb = jnp.maximum(s["rho_bar"], 1e-30)
    return {**s,
            "h_dt": s["h_dt"] * s["h"] * HYDRO_DIM_INV,
            "u_dt": 0.5 * (g - 1.0) * s["u_dt"] * rb ** (1.0 - g)}


def predict_extra(p: PressureEntropyParams, s, cosmo: CosmoFactors,
                  dt_drift, dt_therm):
    """Drift A, h, rho AND rho_bar (hydro_predict_extra, hydro.h:761-815);
    P_bar/cs refreshed from the drifted (rho_bar, A)."""
    A = jnp.maximum(s["u"] + s["u_dt"] * dt_therm, 0.0)
    h_inv = 1.0 / _safe_h(s)
    w1 = s["h_dt"] * h_inv * dt_drift
    h = jnp.clip(s["h"] * jnp.exp(w1), 0.0, p.h_max)
    volume_fac = jnp.exp(-HYDRO_DIM * w1)
    rho = s["rho"] * volume_fac
    rho_bar = s["rho_bar"] * volume_fac
    min_u = p.minimal_internal_energy / cosmo.a_factor_internal_energy
    A = jnp.maximum(A, gadget2._entropy_from_u(p, rho, min_u))
    g = jnp.float32(p.eos.gamma)
    rb = jnp.maximum(rho_bar, 1e-30)
    pressure = A * rb ** g
    soundspeed = jnp.sqrt(g * jnp.maximum(pressure, 0.0) / rb)
    v_sig = jnp.maximum(s["v_sig"], 2.0 * soundspeed)
    return {**s, "u": A, "h": h, "rho": rho, "rho_bar": rho_bar,
            "pressure": pressure, "soundspeed": soundspeed, "v_sig": v_sig}


def reset_predicted_values(p: PressureEntropyParams, s):
    """hydro_reset_predicted_values (hydro.h:720-747); pressure re-derived
    from rho_bar + A_full (the reference uses rho here — deliberate
    deviation: rho_bar is the P-A pressure density)."""
    g = jnp.float32(p.eos.gamma)
    rb = jnp.maximum(s["rho_bar"], 1e-30)
    A = jnp.maximum(s["u_full"], 0.0)
    pressure = A * rb ** g
    soundspeed = jnp.sqrt(g * jnp.maximum(pressure, 0.0) / rb)
    return {**s, "v": s["v_full"], "u": s["u_full"],
            "pressure": pressure, "soundspeed": soundspeed,
            "v_sig": jnp.maximum(s["v_sig"], 2.0 * soundspeed)}


_THIS_MODULE = sys.modules[__name__]
