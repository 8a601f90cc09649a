"""SPHM1RT helium thermochemistry: the H + He ionization network.

Reference src/rt/SPHM1RT/rt_cooling_rates.h / rt_species_and_elements.h:
SPHM1RT carries its own 5-species network (HI, HII, HeI, HeII, HeIII)
with per-group photoionization cross sections at the 13.6 / 24.6 /
54.4 eV thresholds, collisional ionization, and case-B recombination —
unlike rt/GEAR, which hands thermochemistry to grackle.  The TPU design
keeps the exponential-integrator structure of gear.rt_thermochemistry
(coefficients frozen per substep -> each two-state exchange has a
closed-form unconditionally-stable solution) and extends it:

* hydrogen:   x_HI ⇌ x_HII        (Γ_HI + β_HI n_e vs α_HII n_e)
* helium:     y_HeI ⇌ y_HeII      (Γ_HeI + β_HeI n_e vs α_HeII n_e)
              y_HeII ⇌ y_HeIII    (Γ_HeII + β_HeII n_e vs α_HeIII n_e)
  solved as sequential pairwise exponential relaxations per substep
  (operator split over the two He transitions; exact in each pair).
* photons:    every group is attenuated by the TOTAL opacity
  χ_g = Σ_s σ_s,g n_s over the three absorbing species, and the
  photo-heating splits the absorbed energy by each species' opacity
  share with its own ionization threshold.

Electron density n_e = n_H x_HII + n_He (y_HeII + 2 y_HeIII) couples the
two networks; it is refreshed at every substep.

All arrays are (C, K) particle tiles; masked slots stay at zero.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import jax.numpy as jnp

F32 = jnp.float32


@dataclass(frozen=True)
class HeliumNetwork:
    """Rate coefficients + per-group cross sections (internal units).

    ``sigma_*`` have one entry per photon group; groups below a
    species' threshold simply carry sigma 0 for it (the reference's
    grouped cross-section tables, rt_parameters.h).
    """

    Y_He: float = 0.248           # helium mass fraction
    m_p: float = 1.0
    X_H: float = 0.752
    # per-group cross sections (HI: >13.6 eV, HeI: >24.6, HeII: >54.4)
    sigma_HI: Tuple[float, ...] = (1.0,)
    sigma_HeI: Tuple[float, ...] = (0.0,)
    sigma_HeII: Tuple[float, ...] = (0.0,)
    e_photon: Tuple[float, ...] = (1.0,)
    # ionization thresholds (13.6 / 24.6 / 54.4 eV in internal units)
    e_ion_HI: float = 0.0
    e_ion_HeI: float = 0.0
    e_ion_HeII: float = 0.0
    # recombination (case B) and collisional ionization coefficients
    alpha_HII: float = 0.0
    alpha_HeII: float = 0.0
    alpha_HeIII: float = 0.0
    beta_HI: float = 0.0
    beta_HeI: float = 0.0
    beta_HeII: float = 0.0
    heating: bool = False
    chem_substeps: int = 4
    c_red: float = 1.0            # reduced speed of light

    @property
    def ngroups(self):
        return len(self.e_photon)


def he_init_state(s: Dict, net: HeliumNetwork) -> Dict:
    """Fully neutral H + He fractions (rt_tchem first-init)."""
    live = s["mask"]
    return {**s,
            "x_HI": jnp.ones_like(live) * live,
            "y_HeI": jnp.ones_like(live) * live,
            "y_HeII": jnp.zeros_like(live)}


def _pair_relax(x_lo, ion_rate, rec_rate, dt):
    """Closed-form relaxation of a two-state exchange
    d x_lo/dt = -x_lo * ion + (tot - x_lo) * rec over [0, dt] with the
    pair total ``tot`` implicit in the caller (x_lo is the LOWER state's
    fraction OF THE PAIR total; returns the new lower-state fraction of
    that same total)."""
    D = ion_rate + rec_rate
    x_eq = rec_rate / jnp.maximum(D, 1e-30)
    return x_eq + (x_lo - x_eq) * jnp.exp(-D * dt)


def he_thermochemistry(s: Dict, net: HeliumNetwork, dt) -> Dict:
    """One H+He network update (rt_cooling_rates.h rt_do_thermochemistry
    semantics with the grackle-free exponential integrator)."""
    m_ok = s["mask"] > 0
    rho = jnp.maximum(s["rho"], 1e-30)
    n_H = jnp.where(m_ok, rho * net.X_H / net.m_p, 0.0)
    n_He = jnp.where(m_ok, rho * net.Y_He / (4.0 * net.m_p), 0.0)

    x = s["x_HI"]
    yI = s["y_HeI"]
    yII = s["y_HeII"]
    E = s["rt_E"]
    G = net.ngroups
    c_val = net.c_red
    du = jnp.zeros_like(x)
    atten = jnp.ones_like(E)
    sub_dt = dt / net.chem_substeps

    for _ in range(net.chem_substeps):
        yIII = jnp.clip(1.0 - yI - yII, 0.0, 1.0)
        n_e = n_H * (1.0 - x) + n_He * (yII + 2.0 * yIII)

        Gam_HI = sum(c_val * net.sigma_HI[g] * E[..., g]
                     / net.e_photon[g] for g in range(G))
        Gam_HeI = sum(c_val * net.sigma_HeI[g] * E[..., g]
                      / net.e_photon[g] for g in range(G))
        Gam_HeII = sum(c_val * net.sigma_HeII[g] * E[..., g]
                       / net.e_photon[g] for g in range(G))

        # attenuation opacities at substep START (the gear network's
        # ordering: photons see the neutral density the rates saw)
        n_HI = x * n_H
        n_HeI = yI * n_He
        n_HeII = yII * n_He

        # --- hydrogen pair ------------------------------------------------
        x_trial = jnp.clip(_pair_relax(x, Gam_HI + net.beta_HI * n_e,
                                       net.alpha_HII * n_e, sub_dt),
                           0.0, 1.0)

        # --- helium: HeI ⇌ HeII with HeIII frozen --------------------------
        pair_tot = jnp.maximum(yI + yII, 1e-30)
        fI = _pair_relax(yI / pair_tot,
                         Gam_HeI + net.beta_HeI * n_e,
                         net.alpha_HeII * n_e, sub_dt)
        yI_trial = jnp.clip(fI, 0.0, 1.0) * pair_tot

        # --- photon attenuation by the total opacity + per-species
        # absorbed-photon tallies (for the conservation caps) --------------
        N_abs_HI = jnp.zeros_like(x)
        N_abs_HeI = jnp.zeros_like(x)
        for g in range(G):
            chi = (net.sigma_HI[g] * n_HI + net.sigma_HeI[g] * n_HeI
                   + net.sigma_HeII[g] * n_HeII)
            chi_safe = jnp.maximum(chi, 1e-30)
            sh_HI = net.sigma_HI[g] * n_HI / chi_safe
            sh_HeI = net.sigma_HeI[g] * n_HeI / chi_safe
            sh_HeII = net.sigma_HeII[g] * n_HeII / chi_safe
            fac = jnp.exp(-c_val * chi * sub_dt)
            dE = E[..., g] * (1.0 - fac)
            eg = net.e_photon[g]
            N_abs_HI = N_abs_HI + dE * sh_HI / eg
            N_abs_HeI = N_abs_HeI + dE * sh_HeI / eg
            if net.heating:
                du = du + dE / rho * (
                    sh_HI * (1.0 - net.e_ion_HI / eg)
                    + sh_HeI * (1.0 - net.e_ion_HeI / eg)
                    + sh_HeII * (1.0 - net.e_ion_HeII / eg))
            E = E.at[..., g].multiply(fac)
            atten = atten.at[..., g].multiply(fac)

        # photon conservation (C2-Ray property, gear.rt_thermochemistry):
        # net ionizations of a species this substep can't exceed the
        # photons ITS opacity share absorbed
        x_floor = x - N_abs_HI / jnp.maximum(n_H, 1e-30)
        x = jnp.clip(jnp.where(x_trial < x,
                               jnp.maximum(x_trial, x_floor), x_trial),
                     0.0, 1.0)
        yI_floor = yI - N_abs_HeI / jnp.maximum(n_He, 1e-30)
        yI_n = jnp.clip(jnp.where(yI_trial < yI,
                                  jnp.maximum(yI_trial, yI_floor),
                                  yI_trial), 0.0, 1.0)
        yII_n = jnp.maximum(pair_tot - yI_n, 0.0)

        # --- helium: HeII ⇌ HeIII ------------------------------------------
        pair2 = jnp.maximum(yII_n + yIII, 1e-30)
        fII = _pair_relax(yII_n / pair2,
                          Gam_HeII + net.beta_HeII * n_e,
                          net.alpha_HeIII * n_e, sub_dt)
        yII = jnp.clip(fII, 0.0, 1.0) * pair2
        yI = jnp.clip(yI_n, 0.0, 1.0 - yII)

    out = {**s,
           "x_HI": jnp.where(m_ok, x, 0.0),
           "y_HeI": jnp.where(m_ok, yI, 0.0),
           "y_HeII": jnp.where(m_ok, yII, 0.0),
           "rt_E": E, "rt_F": s["rt_F"] * atten[..., None]}
    if net.heating:
        out["u_full"] = s["u_full"] + du * m_ok
        out["u"] = s["u"] + du * m_ok
    return out
