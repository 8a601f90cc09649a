"""EAGLE black holes: Bondi accretion, gas swallowing, AGN feedback.

Reference: src/black_holes/EAGLE/ (black_holes.h, black_holes_iact.h):

* Bondi-Hoyle accretion mdot = 4 pi G² M² rho / (cs² + v²)^{3/2} with a
  boost factor and the Eddington ceiling (black_holes_properties.h);
* subgrid mass grows by (1 - eps_r) mdot dt; the DYNAMICAL mass only
  grows by swallowing real gas particles — when the subgrid mass runs
  ahead, neighbours are stochastically swallowed with probability
  (M_subgrid - M_dyn) W / rho (black_holes.h
  black_holes_get_swallow_probability analog);
* AGN: the reservoir accumulates eps_f eps_r mdot c² dt and fires
  stochastic ΔT heating events exactly like the SNII machinery once it
  can heat n_heat neighbour masses (black_holes.h:energy_reservoir).

Seeding from FOF halos (engine_fof.c: put a seed BH at the densest gas
particle of every group above the seed halo mass) is provided as a host
helper consuming the existing FOF group catalogue.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

F32 = jnp.float32


@dataclass(frozen=True)
class EagleBlackHoles:
    """EAGLEAGN YAML section (internal units)."""

    G: float = 1.0
    c_light: float = 1.0                 # speed of light (internal)
    eps_r: float = 0.1                   # radiative efficiency
    eps_f: float = 0.15                  # coupling efficiency
    boost_alpha: float = 1.0             # Bondi boost
    f_edd_max: float = 1.0               # Eddington ceiling fraction
    edd_pref: float = 0.0                # 4 pi G m_p / (sigma_T c eps_r)
    delta_u: float = 0.0                 # AGN heating jump (ΔT-based)
    n_heat: float = 1.0                  # reservoir threshold (particles)
    seed_mass: float = 0.0
    seed_halo_mass: float = 0.0
    # repositioning to the potential minimum (black_holes_iact.h:290;
    # ratios are in units of the baryon softening; 0 = off)
    reposition_ratio: float = 0.0
    repos_vel_ratio: float = 0.0         # x cs_gas; 0 = no velocity cut
    repos_vel_min: float = 0.0
    # BH-BH mergers (black_holes_iact.h bh_bh_swallow; 0 = off)
    merging_ratio: float = 0.0
    merger_threshold: str = "escape_velocity"

    @staticmethod
    def from_params(params, units, phys_const, G_newton: float
                    ) -> "EagleBlackHoles":
        sec = "EAGLEAGN"
        kB = phys_const.const_boltzmann_k
        m_p = phys_const.const_proton_mass
        c = 2.99792458e10 * units.from_cgs("velocity")
        sigma_T = 6.6524587e-25 * units.from_cgs("length") ** 2
        dT = params.opt_float(sec, "AGN_delta_T_K", 10.0 ** 8.5)
        mu_ion = 0.5954
        gamma = 5.0 / 3.0
        eps_r = params.opt_float(sec, "radiative_efficiency", 0.1)
        return EagleBlackHoles(
            G=G_newton, c_light=c, eps_r=eps_r,
            eps_f=params.opt_float(sec, "coupling_efficiency", 0.15),
            boost_alpha=params.opt_float(sec, "boost_alpha", 1.0),
            f_edd_max=params.opt_float(sec, "max_eddington_fraction", 1.0),
            edd_pref=4.0 * np.pi * G_newton * m_p / (sigma_T * c * eps_r),
            delta_u=kB * dT / ((gamma - 1.0) * mu_ion * m_p),
            n_heat=params.opt_float(sec, "AGN_num_ngb_to_heat", 1.0),
            seed_mass=params.opt_float(sec, "subgrid_seed_mass_Msun", 1e5)
            * 1.98841e33 * units.from_cgs("mass"),
            seed_halo_mass=params.opt_float(sec, "seed_halo_mass_Msun",
                                            1e10)
            * 1.98841e33 * units.from_cgs("mass"),
            reposition_ratio=params.opt_float(
                sec, "max_reposition_distance_ratio", 3.0),
            repos_vel_ratio=(params.opt_float(
                sec, "max_reposition_velocity_ratio", 0.5)
                if params.opt_int(
                    sec, "with_reposition_velocity_threshold", 1)
                else 0.0),
            repos_vel_min=max(0.0, params.opt_float(
                sec, "min_reposition_velocity_threshold_km_p_s", -1.0))
            * 1.0e5 * units.from_cgs("velocity"),
            merging_ratio=params.opt_float(
                sec, "max_merging_distance_ratio", 3.0),
            merger_threshold=params.opt_string(
                sec, "merger_threshold_type", "escape_velocity").lower())

    # --- per-step device pieces -------------------------------------------
    def bondi_rate(self, m_subgrid, rho_phys, cs_phys, v_rel2_phys):
        """mdot = min(alpha 4 pi G² M² rho / (cs²+v²)^1.5, f_edd mdot_edd)
        (black_holes.h compute_accretion_rate)."""
        denom = jnp.maximum(cs_phys ** 2 + v_rel2_phys, 1e-30) ** 1.5
        mdot = (jnp.float32(self.boost_alpha) * 4.0 * np.pi
                * jnp.float32(self.G) ** 2 * m_subgrid ** 2
                * rho_phys / denom)
        mdot_edd = jnp.float32(self.edd_pref) * m_subgrid
        return jnp.minimum(mdot, jnp.float32(self.f_edd_max) * mdot_edd)

    def accrete(self, bh, dens, cosmo, dt):
        """Grow the subgrid mass + reservoir; emit the per-neighbour
        swallow probability for the mass deficit.  ``dens`` comes from
        ops.black_holes.bh_gas_density_loop.  Returns updated bh dict.
        """
        h = jnp.maximum(bh["h"], 1e-30)
        h_inv_dim = (1.0 / h) ** 3
        rho_com = dens["rho"] * h_inv_dim
        rho_phys = rho_com * cosmo.a_inv2 / cosmo.a
        rho_safe = jnp.maximum(dens["rho"], 1e-30)
        v_gas = jnp.stack([dens["mom0"], dens["mom1"], dens["mom2"]],
                          -1) / rho_safe[..., None]
        cs = dens["cs_w"] / rho_safe * cosmo.a_factor_sound_speed
        dv = (v_gas - bh["v_full"]) / cosmo.a  # peculiar, physical-ish
        v_rel2 = jnp.sum(dv * dv, -1)

        mdot = self.bondi_rate(bh["m_subgrid"], rho_phys, cs, v_rel2)
        live = bh["mask"] > 0
        mdot = jnp.where(live & (dens["ngb_mass"] > 0), mdot, 0.0)
        m_sub = bh["m_subgrid"] + (1.0 - self.eps_r) * mdot * dt
        resv = bh["energy_reservoir"] \
            + jnp.float32(self.eps_f * self.eps_r) \
            * mdot * dt * jnp.float32(self.c_light) ** 2

        # swallow probability per neighbour: deficit * W / rho
        # (black_holes_iact.h swallow marking); the W/rho folds into a
        # per-BH constant here because the deficit is shared over the
        # kernel-weighted neighbours: prob = deficit / ngb_mass
        deficit = jnp.maximum(m_sub - bh["m"], 0.0)
        prob = jnp.where(live, deficit
                         / jnp.maximum(dens["ngb_mass"], 1e-30), 0.0)
        return {**bh, "m_subgrid": m_sub, "energy_reservoir": resv,
                "swallow_prob": jnp.minimum(prob, 1.0),
                "mdot": mdot,
                "rho_gas": rho_com, "ngb_mass": dens["ngb_mass"]}

    def agn_fire(self, bh):
        """(fb_energy, new_reservoir): release the reservoir once it can
        heat n_heat mean neighbour masses by delta_u
        (black_holes.h AGN feedback criterion)."""
        live = bh["mask"] > 0
        mean_ngb = bh["ngb_mass"] / jnp.float32(48.0)
        e_crit = jnp.float32(self.n_heat) * jnp.float32(self.delta_u) \
            * jnp.maximum(mean_ngb, 1e-30)
        fire = live & (bh["energy_reservoir"] >= e_crit) \
            & (bh["ngb_mass"] > 0)
        fb_energy = jnp.where(fire, bh["energy_reservoir"], 0.0)
        resv = jnp.where(fire, 0.0, bh["energy_reservoir"])
        return fb_energy, resv


def seed_from_fof(catalogue, gas_pos, gas_rho, bh_model,
                  gas_group_ids=None, existing_bh_pos=None,
                  min_dist: float = 0.0):
    """Host-side BH seeding (engine_fof.c): for every FOF group above
    seed_halo_mass without a BH nearby, place a seed at the group's
    densest gas particle.  ``gas_group_ids`` (per gas particle, aligned
    with gas_pos, -1 = ungrouped) gives exact membership — the contract
    of the FOF catalogue's per-particle group ids; without it the
    nearest-to-centre 5% stand in.  Returns (seed_positions, n_seeded)."""
    seeds = []
    masses = np.asarray(catalogue["group_mass"])
    coms = np.asarray(catalogue["group_com"])
    for gid in range(len(masses)):
        if masses[gid] < bh_model.seed_halo_mass:
            continue
        if existing_bh_pos is not None and len(existing_bh_pos):
            d = np.linalg.norm(existing_bh_pos - coms[gid], axis=1)
            if (d < max(min_dist, 1e-10)).any():
                continue
        if gas_group_ids is not None:
            members = np.asarray(gas_group_ids) == gid
            if not members.any():
                continue
        else:
            d = np.linalg.norm(gas_pos - coms[gid], axis=1)
            members = d <= np.quantile(d, 0.05) + 1e-12
        idx = np.argmax(np.where(members, gas_rho, -1.0))
        seeds.append(gas_pos[idx])
    return (np.asarray(seeds).reshape(-1, 3), len(seeds))


EagleBlackHoles.kind = "eagle"


@dataclass(frozen=True)
class DefaultBlackHoles:
    """Passive black holes (black_holes/Default/black_holes.h).

    The reference's Default model carries BH particles through gravity
    and computes their gas density/neighbour sums, but performs NO
    accretion, swallowing or feedback (black_holes_iact.h is empty of
    physics; black_holes.h only maintains h and the density fields).
    multi_step keys off ``kind`` to run only the density pass.
    """

    kind = "default"

    @staticmethod
    def from_params(params, units, phys_const, G_newton: float
                    ) -> "DefaultBlackHoles":
        return DefaultBlackHoles()
