"""Primordial (H/He) non-equilibrium cooling network — the Grackle-mode
analog (reference: src/cooling/grackle/cooling.c:772 cooling_cool_part
driving grackle's solve_chemistry / primordial_chemistry=1).

Six species (HI, HII, HeI, HeII, HeIII, e-) with the standard
Katz, Weinberg & Hernquist (1996, ApJS 105, 19) rate set:
collisional ionization, radiative + dielectronic recombination,
collisional excitation/ionization cooling, recombination cooling,
free-free (bremsstrahlung), and inverse-Compton off the CMB.  No UV
background (grackle's primordial-only default); species are advanced
with grackle's own semi-implicit creation/destruction update
  y_new = (y + C dt) / (1 + D dt)
substepped over the hydro step, and u is integrated alongside.

Only three fractions are carried in the particle state (relative to the
hydrogen NUMBER density): xHII, xHeII, xHeIII — xHI, xHeI and x_e follow
from conservation:  xHI = 1 - xHII,  xHeI = yHe - xHeII - xHeIII,
x_e = xHII + xHeII + 2 xHeIII, with yHe = (1 - X_H) / (4 X_H).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

F32 = jnp.float32

# CGS constants (physical_constants.c values)
K_B = 1.380649e-16          # erg/K
M_H = 1.6735575e-24         # g (hydrogen atom)
GAMMA = 5.0 / 3.0
T_CMB0 = 2.7255             # K


def _rates(T):
    """KWH96 Table 1 reaction rates (cm^3/s), f32-safe."""
    T = jnp.maximum(T, 1.0)
    sqT = jnp.sqrt(T)
    T5 = jnp.sqrt(T / 1e5)
    fac = 1.0 / (1.0 + T5)
    k_ci_HI = 5.85e-11 * sqT * fac * jnp.exp(-157809.1 / T)
    k_ci_HeI = 2.38e-11 * sqT * fac * jnp.exp(-285335.4 / T)
    k_ci_HeII = 5.68e-12 * sqT * fac * jnp.exp(-631515.0 / T)
    T3 = T / 1e3
    T6 = T / 1e6
    a_HII = 8.4e-11 / sqT * T3 ** (-0.2) / (1.0 + T6 ** 0.7)
    a_HeII = 1.5e-10 * T ** (-0.6353)
    a_d = 1.9e-3 * T ** (-1.5) * jnp.exp(-470000.0 / T) \
        * (1.0 + 0.3 * jnp.exp(-94000.0 / T))
    a_HeIII = 3.36e-10 / sqT * T3 ** (-0.2) / (1.0 + T6 ** 0.7)
    return dict(k_ci_HI=k_ci_HI, k_ci_HeI=k_ci_HeI, k_ci_HeII=k_ci_HeII,
                a_HII=a_HII, a_HeII=a_HeII + a_d, a_HeIII=a_HeIII)


def _cooling_terms(T, nH, xHII, xHeII, xHeIII, yHe):
    """KWH96 Table 1 cooling rates -> Lambda (erg cm^-3 s^-1), no
    Compton (added separately: it needs z)."""
    T = jnp.maximum(T, 1.0)
    sqT = jnp.sqrt(T)
    T5 = jnp.sqrt(T / 1e5)
    fac = 1.0 / (1.0 + T5)
    T3 = T / 1e3
    T6 = T / 1e6
    xHI = jnp.clip(1.0 - xHII, 0.0, 1.0)
    xHeI = jnp.clip(yHe - xHeII - xHeIII, 0.0, yHe)
    ne = (xHII + xHeII + 2.0 * xHeIII) * nH
    nHI, nHII = xHI * nH, xHII * nH
    nHeI, nHeII, nHeIII = xHeI * nH, xHeII * nH, xHeIII * nH

    # collisional ionization
    L = 1.27e-21 * sqT * fac * jnp.exp(-157809.1 / T) * ne * nHI
    L += 9.38e-22 * sqT * fac * jnp.exp(-285335.4 / T) * ne * nHeI
    L += 4.95e-22 * sqT * fac * jnp.exp(-631515.0 / T) * ne * nHeII
    # recombination
    L += 8.70e-27 * sqT * T3 ** (-0.2) / (1.0 + T6 ** 0.7) * ne * nHII
    L += 1.55e-26 * T ** 0.3647 * ne * nHeII
    L += 3.48e-27 * sqT * T3 ** (-0.2) / (1.0 + T6 ** 0.7) * ne * nHeIII
    # dielectronic recombination
    L += 1.24e-13 * T ** (-1.5) * jnp.exp(-470000.0 / T) \
        * (1.0 + 0.3 * jnp.exp(-94000.0 / T)) * ne * nHeII
    # collisional excitation (line cooling)
    L += 7.50e-19 * fac * jnp.exp(-118348.0 / T) * ne * nHI
    L += 5.54e-17 * T ** (-0.397) * fac * jnp.exp(-473638.0 / T) \
        * ne * nHeII
    # free-free with Gaunt factor
    log10T = jnp.log10(T)
    gff = 1.1 + 0.34 * jnp.exp(-((5.5 - log10T) ** 2) / 3.0)
    L += 1.42e-27 * gff * sqT * (nHII + nHeII + 4.0 * nHeIII) * ne
    return L


def compton_rate(T, ne, z):
    """Inverse-Compton off the CMB (erg cm^-3 s^-1, negative = cooling;
    heats gas below T_CMB(z)) — KWH96 eq. (11)."""
    Tcmb = T_CMB0 * (1.0 + z)
    return -5.65e-36 * (1.0 + z) ** 4 * (T - Tcmb) * ne


def mean_molecular_weight(xHII, xHeII, xHeIII, yHe):
    """mu in units of m_H: mass per particle / m_H."""
    xe = xHII + xHeII + 2.0 * xHeIII
    return (1.0 + 4.0 * yHe) / (1.0 + yHe + xe)


def temperature_of(u_cgs, xHII, xHeII, xHeIII, yHe):
    """T [K] from specific internal energy [erg/g] and the species."""
    mu = mean_molecular_weight(xHII, xHeII, xHeIII, yHe)
    return jnp.maximum((GAMMA - 1.0) * u_cgs * mu * M_H / K_B, 1.0)


@dataclass(frozen=True)
class PrimordialCooling:
    """GrackleCooling: YAML section (primordial_chemistry=1 class)."""

    X_H: float = 0.76           # HydrogenFractionByMass
    n_substeps: int = 16        # chemistry substeps per hydro step
    with_compton: bool = True
    # unit conversions (internal -> cgs), folded on host
    rho_to_cgs: float = 1.0
    u_to_cgs: float = 1.0
    time_to_cgs: float = 1.0

    @property
    def yHe(self) -> float:
        return (1.0 - self.X_H) / (4.0 * self.X_H)

    @staticmethod
    def from_params(params, units) -> "PrimordialCooling":
        sec = "GrackleCooling"
        return PrimordialCooling(
            X_H=params.opt_float(sec, "HydrogenFractionByMass", 0.76),
            n_substeps=int(params.opt_float(sec, "n_substeps", 16)),
            with_compton=params.opt_int(sec, "with_Compton", 1) != 0,
            rho_to_cgs=1.0 / units.from_cgs("density"),
            u_to_cgs=units.from_cgs("mass") / units.from_cgs("energy"),
            time_to_cgs=1.0 / units.from_cgs("time"))


def substep(model: PrimordialCooling, u, xHII, xHeII, xHeIII, nH, dt, z):
    """One chemistry substep (cgs): grackle's C/(1+D dt) update + u."""
    yHe = model.yHe
    T = temperature_of(u, xHII, xHeII, xHeIII, yHe)
    R = _rates(T)
    ne = jnp.maximum((xHII + xHeII + 2.0 * xHeIII) * nH, 0.0)

    xHI = jnp.clip(1.0 - xHII, 0.0, 1.0)
    C = R["k_ci_HI"] * xHI * ne
    D = R["a_HII"] * ne
    xHII_n = jnp.clip((xHII + C * dt) / (1.0 + D * dt), 0.0, 1.0)

    xHeI = jnp.clip(yHe - xHeII - xHeIII, 0.0, yHe)
    C = (R["k_ci_HeI"] * xHeI + R["a_HeIII"] * xHeIII) * ne
    D = (R["k_ci_HeII"] + R["a_HeII"]) * ne
    xHeII_n = jnp.clip((xHeII + C * dt) / (1.0 + D * dt), 0.0, yHe)

    C = R["k_ci_HeII"] * xHeII_n * ne
    D = R["a_HeIII"] * ne
    xHeIII_n = jnp.clip((xHeIII + C * dt) / (1.0 + D * dt), 0.0, yHe)
    # joint He conservation after the two sequential updates
    tot = xHeII_n + xHeIII_n
    scale = jnp.where(tot > yHe, yHe / jnp.maximum(tot, 1e-30), 1.0)
    xHeII_n = xHeII_n * scale
    xHeIII_n = xHeIII_n * scale

    L = _cooling_terms(T, nH, xHII_n, xHeII_n, xHeIII_n, yHe)
    rho = nH * M_H / model.X_H
    du = -L / rho * dt
    if model.with_compton:
        ne_n = (xHII_n + xHeII_n + 2.0 * xHeIII_n) * nH
        du = du + compton_rate(T, ne_n, z) / rho * dt
    # never overshoot below ~0 within a substep
    u_n = jnp.maximum(u + du, 0.05 * u)
    return u_n, xHII_n, xHeII_n, xHeIII_n


def solve(model: PrimordialCooling, u, xHII, xHeII, xHeIII, nH, dt, z,
          n_substeps=None):
    """Advance (u, species) over dt [cgs] with fixed substeps."""
    nsub = n_substeps or model.n_substeps
    h = dt / nsub

    def body(_, c):
        return substep(model, *c, nH, h, z)

    return jax.lax.fori_loop(0, nsub, body, (u, xHII, xHeII, xHeIII))


def equilibrium(model: PrimordialCooling, T, nH):
    """Collisional-ionization-equilibrium fractions at fixed T.

    In CIE every reaction is proportional to n_e, so the balance ratios
    are n_e-independent and the fixed point is closed-form
    (KWH96 eqs. 33-38)."""
    yHe = model.yHe
    R = _rates(T)
    xHII = R["k_ci_HI"] / (R["k_ci_HI"] + R["a_HII"])
    r1 = R["k_ci_HeI"] / R["a_HeII"]        # HeII/HeI
    r2 = R["k_ci_HeII"] / R["a_HeIII"]      # HeIII/HeII
    xHeI = yHe / (1.0 + r1 + r1 * r2)
    xHeII = xHeI * r1
    xHeIII = xHeII * r2
    return xHII, xHeII, xHeIII


def cie_cooling_rate(model: PrimordialCooling, T, nH, z=0.0,
                     with_compton=False):
    """Lambda(T)/nH^2 at CIE (erg cm^3/s) — the published-curve check."""
    xHII, xHeII, xHeIII = equilibrium(model, T, nH)
    L = _cooling_terms(T, nH, xHII, xHeII, xHeIII, model.yHe)
    if with_compton:
        ne = (xHII + xHeII + 2.0 * xHeIII) * nH
        L = L - compton_rate(T, ne, z)
    return L / nH ** 2


def make_primordial_cooling_fn(model: PrimordialCooling, floor=None,
                               u_minimal: float = 0.0,
                               hydro_gamma: float = GAMMA):
    """Engine cooling hook: advances the network over dt_therm and
    rewrites u_dt = (u_new - u_old) / dt like the grackle wrapper
    (cooling/grackle/cooling.c cooling_cool_part), plus the species
    fractions carried in the particle state."""
    X_H = model.X_H

    def cooling_fn(s, cosmo, dt_therm):
        a_u = cosmo.a_factor_internal_energy
        u_com = s["u_full"]
        rho_com = jnp.maximum(s["rho"], 1e-30)
        rho_phys = rho_com * cosmo.a_inv2 / cosmo.a
        u_cgs = u_com * a_u * jnp.float32(model.u_to_cgs)
        rho_cgs = rho_phys * jnp.float32(model.rho_to_cgs)
        nH = jnp.maximum(rho_cgs, 1e-38) * (X_H / M_H)
        z = 1.0 / jnp.maximum(cosmo.a, 1e-6) - 1.0
        dt_cgs = dt_therm * jnp.float32(model.time_to_cgs)

        u_new, xHII, xHeII, xHeIII = solve(
            model, jnp.maximum(u_cgs, 1e-20),
            s["xHII"], s["xHeII"], s["xHeIII"], nH,
            jnp.maximum(dt_cgs, 1e-30), z)

        u_new_com = u_new / jnp.float32(model.u_to_cgs) / a_u
        dt = jnp.maximum(dt_therm, 1e-30)
        total = s["u_dt"] + (u_new_com - u_com) / dt
        if floor is not None:
            u_floor_com = floor.u_floor(rho_phys, rho_com,
                                        hydro_gamma) / a_u
        else:
            u_floor_com = jnp.zeros_like(u_com)
        u_limit = jnp.maximum(u_floor_com, jnp.float32(u_minimal) / a_u)
        crosses = u_com + total * 1.5 * dt < u_limit
        total = jnp.where(crosses, (u_limit - u_com) / (1.5 * dt), total)
        negative = u_com + total * 2.5 * dt < 0.0
        total = jnp.where(negative, -u_com / (2.5001 * dt), total)

        zero_dt = dt_therm <= 0.0
        return {"u_dt": jnp.where(zero_dt, s["u_dt"], total),
                "xHII": jnp.where(zero_dt, s["xHII"], xHII),
                "xHeII": jnp.where(zero_dt, s["xHeII"], xHeII),
                "xHeIII": jnp.where(zero_dt, s["xHeIII"], xHeIII)}

    return cooling_fn


def initial_fractions(model: PrimordialCooling, shape):
    """Neutral start (grackle's default when no restart fractions)."""
    z = jnp.zeros(shape, F32)
    return {"xHII": z + 1.2e-5,      # trace ionization seeds ne > 0
            "xHeII": z, "xHeIII": z}
