"""SPIN_JET black holes: spin evolution, accretion-disc modes, AGN jets.

Reference: src/black_holes/SPIN_JET/ — the spin/jet extension of the
EAGLE AGN model (Husko et al. 2022):

* every BH carries a (signed) spin magnitude and an angular-momentum
  direction; accretion torques both (black_holes.h:845-976);
* the subgrid accretion disc sits in one of three modes decided by the
  Eddington fraction (black_holes_spin.h decide_mode:492): an
  advection-dominated thick disc (f_edd < 0.0046 for alpha=0.1), a
  radiatively efficient thin disc, and a super-Eddington slim disc;
* each mode has its own radiative efficiency (Novikov-Thorne / Madau /
  Mahadevan fits, rad_efficiency:671), jet efficiency (Tchekhovskoy
  BZ-type, jet_efficiency:612) and disc structure (aspect_ratio:534,
  warp radius/mass/momentum r_warp:161, m_warp:274, j_warp:366);
* prograde/retrograde accretion follows the King et al. (2005)
  criterion on the warp angular momentum (black_holes.h:868-875);
* spin evolves as da = (dM0/M) * s(a) with the Benson & Babul (2009)
  spinup/spindown function incl. jet spindown or the GRMHD fits
  (da_dln_mbh_0:807);
* jets: a separate energy reservoir fills at eps_f_jet * eta_jet *
  mdot c^2 and fires PAIRED kicks of v_jet along +/- the spin axis
  (black_holes.h:1185-1248, black_holes_iact.h AGN_jet_spin_axis
  model); thermal AGN feedback uses the EAGLE reservoir machinery
  scaled by the mode-dependent radiative efficiency.

TPU design: all of the above are branchless closed-form array maps —
modes are one-hot masks, the per-BH scalars ride the same padded (C, K)
tiles as the EAGLE model, and the jet pair selection reuses the
kinetic-feedback ray loops (ops/stencil.kinetic_ray_select_loop) with
the spin axis as the ray.  BH-BH merger spin (Barausse & Rezolla 2009,
black_holes_spin.h final_spin:991) is provided for catalogue-level use;
the engine does not merge BHs (the EAGLE path here doesn't either).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

F32 = jnp.float32

# accretion-mode codes (black_holes_struct.h enum BH_accretion_modes)
MODE_THICK = 0
MODE_THIN = 1
MODE_SLIM = 2


def r_isco(a):
    """ISCO radius in gravitational units for signed spin a
    (black_holes_spin.h:51, Bardeen et al. 1972)."""
    aa = jnp.abs(a)
    one_m_a2 = jnp.maximum(1.0 - a * a, 0.0)
    Z1 = 1.0 + (jnp.cbrt((1.0 + aa) * one_m_a2)
                + jnp.cbrt(jnp.maximum(1.0 - aa, 0.0) * one_m_a2))
    Z2 = jnp.sqrt(3.0 * a * a + Z1 * Z1)
    sgn = jnp.sign(a)
    inner = jnp.maximum((3.0 - Z1) * (3.0 + Z1 + 2.0 * Z2), 0.0)
    return 3.0 + Z2 - sgn * jnp.sqrt(inner)


def eps_nt(a):
    """Novikov-Thorne thin-disc radiative efficiency
    (black_holes_spin.h:435)."""
    return 1.0 - jnp.sqrt(jnp.maximum(1.0 - 2.0 / 3.0 / r_isco(a), 0.0))


def eps_sd(a, f_edd):
    """Slim-disc efficiency, Madau et al. (2014) eqn. 3
    (black_holes_spin.h:459).  Guarded for f_edd -> 0."""
    m = jnp.maximum(f_edd, 1e-10)
    B = jnp.maximum(4.627 - 4.445 * a, 1e-10) ** -0.5524
    C = jnp.maximum(827.3 - 718.1 * a, 1e-10) ** -0.706
    A = jnp.maximum(0.9663 - 0.9292 * a, 1e-10) ** -0.5693
    return 0.1 / m * (0.985 / (B + 1.6 / m) + 0.015 / (C + 1.6 / m)) * A


def l_isco(a):
    """Specific angular momentum at the ISCO (black_holes_spin.h:754
    fit): 0.385 (1 + 2 sqrt(3 r_isco - 2))."""
    return 0.385 * (1.0 + 2.0 * jnp.sqrt(
        jnp.maximum(3.0 * r_isco(a) - 2.0, 0.0)))


def horizon_ang_vel(a):
    """BH horizon angular velocity a / 2(1+sqrt(1-a^2))
    (black_holes_spin.h:620)."""
    return a / (2.0 * (1.0 + jnp.sqrt(jnp.maximum(1.0 - a * a, 0.0))))


def final_spin_merger(a1, a2, q, cos_alpha, cos_beta, cos_gamma):
    """Remnant spin magnitude of a BH-BH merger, Barausse & Rezzolla
    (2009) eqns. 6+10 (black_holes_spin.h l_variable:948,
    final_spin:991).  a1: heavier BH spin, q = m2/m1 <= 1."""
    eta = q / ((1.0 + q) * (1.0 + q))
    s4, s5, t0, t2, t3 = -0.1229, 0.4537, -2.8904, -3.5171, 2.5763
    q2 = q * q
    l = (2.0 * math.sqrt(3.0) + t2 * eta + t3 * eta * eta
         + s4 * (a1 * a1 + a2 * a2 * q2 * q2
                 + 2.0 * a1 * a2 * q2 * cos_alpha)
         / ((1.0 + q2) * (1.0 + q2))
         + (s5 * eta + t0 + 2.0)
         * (a1 * cos_beta + a2 * q2 * cos_gamma) / (1.0 + q2))
    return jnp.sqrt(jnp.maximum(
        a1 * a1 + a2 * a2 * q2 * q2 + 2.0 * a1 * a2 * q2 * cos_alpha
        + 2.0 * (a1 * cos_beta + a2 * q2 * cos_gamma) * l * q
        + l * l * q2, 0.0)) / ((1.0 + q) * (1.0 + q))


@dataclass(frozen=True)
class SpinJetBlackHoles:
    """SPINJETAGN YAML section (internal units).

    Derived disc constants follow black_holes_properties.h:645-726:
    everything comes from alpha_acc and delta_ADAF.
    """

    G: float = 1.0
    c_light: float = 1.0
    eps_f: float = 0.1            # coupling_efficiency (thermal)
    eps_f_jet: float = 1.0        # jet coupling efficiency
    boost_alpha: float = 1.0
    f_edd_max: float = 1.0
    edd_pref: float = 0.0         # 4 pi G m_p / (sigma_T c eps_r0)
    delta_u: float = 0.0          # thermal AGN heating jump
    n_heat: float = 1.0
    seed_mass: float = 0.0
    seed_halo_mass: float = 0.0
    seed_spin: float = 0.01
    m_solar: float = 1.0          # solar mass (internal units)

    # disc-physics constants (black_holes_properties.h:645-726)
    alpha_acc: float = 0.2
    delta_ADAF: float = 0.2
    mdot_crit_ADAF: float = 0.008
    beta_acc: float = 1.0 / 1.4
    edd_crit_thick: float = 0.0
    v_0_ADAF: float = 0.5
    omega_0_ADAF: float = 0.3
    h_0_ADAF: float = 0.3
    gamma_SD: float = math.sqrt(5.0)
    xi_TD: float = 1.0
    td_region: str = "B"          # TD_region: B or C (Shakura-Sunyaev)
    td_sd_eps_r_threshold: float = 0.5
    include_slim_disk: bool = True
    include_jets: bool = True
    include_grmhd_spindown: bool = True
    jet_h_r_slope: float = 1.0

    # jet launching (black_holes.h:1185)
    n_jet: float = 2.0            # particles per jet event (pairs of 2)
    v_jet: float = 0.0            # constant jet velocity (internal)
    v_jet_mass_loading: float = 0.0
    v_jet_min: float = 0.0
    v_jet_model: str = "constant"  # constant | mass_loading

    # repositioning + BH-BH mergers (shared EAGLE machinery; 0 = off)
    reposition_ratio: float = 0.0
    repos_vel_ratio: float = 0.0
    repos_vel_min: float = 0.0
    merging_ratio: float = 0.0
    merger_threshold: str = "escape_velocity"

    kind = "spin_jet"

    @staticmethod
    def from_params(params, units, phys_const, G_newton: float
                    ) -> "SpinJetBlackHoles":
        sec = "SPINJETAGN"
        kB = phys_const.const_boltzmann_k
        m_p = phys_const.const_proton_mass
        c = 2.99792458e10 * units.from_cgs("velocity")
        sigma_T = 6.6524587e-25 * units.from_cgs("length") ** 2
        M_sun = 1.98841e33 * units.from_cgs("mass")
        dT = params.opt_float(sec, "AGN_delta_T_K", 10.0 ** 8.5)
        mu_ion, gamma = 0.5954, 5.0 / 3.0

        alpha = params.opt_float(sec, "alpha_acc", 0.2)
        delta_ADAF = params.opt_float(sec, "delta_ADAF", 0.2)
        alpha2 = alpha * alpha
        beta = 1.0 / (1.0 + 2.0 * alpha)
        gamma_acc = (8.0 - 3.0 * beta) / (6.0 - 3.0 * beta)
        eps_ADAF = (5.0 / 3.0 - gamma_acc) / (gamma_acc - 1.0)

        kmps = 1.0e5 * units.from_cgs("velocity")
        v_model = params.opt_string(sec, "AGN_jet_velocity_model",
                                    "Constant").lower()
        return SpinJetBlackHoles(
            G=G_newton, c_light=c,
            eps_f=params.opt_float(sec, "coupling_efficiency", 0.1),
            eps_f_jet=params.opt_float(sec, "eps_f_jet", 1.0),
            boost_alpha=params.opt_float(sec, "boost_alpha", 1.0),
            f_edd_max=params.opt_float(sec, "max_eddington_fraction", 1.0),
            # Eddington rate normalised with the fiducial eps_r = 0.1
            # (black_holes.h:810 props->radiative_efficiency)
            edd_pref=4.0 * np.pi * G_newton * m_p / (sigma_T * c * 0.1),
            delta_u=kB * dT / ((gamma - 1.0) * mu_ion * m_p),
            n_heat=params.opt_float(sec, "AGN_num_ngb_to_heat", 1.0),
            seed_mass=params.opt_float(sec, "subgrid_seed_mass_Msun", 1e5)
            * M_sun,
            seed_halo_mass=params.opt_float(sec, "seed_halo_mass_Msun",
                                            1e10) * M_sun,
            seed_spin=params.opt_float(sec, "seed_spin", 0.01),
            m_solar=M_sun,
            alpha_acc=alpha, delta_ADAF=delta_ADAF,
            mdot_crit_ADAF=0.2 * alpha2,
            beta_acc=beta,
            edd_crit_thick=2.0 * delta_ADAF * alpha2 * (1.0 - beta) / beta,
            v_0_ADAF=3.0 / (5.0 + 2.0 * eps_ADAF),
            omega_0_ADAF=math.sqrt(2.0 * eps_ADAF / (5.0 + 2.0 * eps_ADAF)),
            xi_TD=2.0 * (1.0 + 7.0 * alpha2) / (4.0 + alpha2) / alpha2,
            td_region=params.opt_string(sec, "TD_region", "B").upper(),
            td_sd_eps_r_threshold=params.opt_float(
                sec, "TD_SD_eps_r_threshold", 0.5),
            include_slim_disk=bool(params.opt_float(
                sec, "include_slim_disk", 1)),
            include_jets=bool(params.opt_float(sec, "include_jets", 1)),
            include_grmhd_spindown=bool(params.opt_float(
                sec, "include_GRMHD_spindown", 1)),
            jet_h_r_slope=params.opt_float(sec, "jet_h_r_slope", 1.0),
            n_jet=params.opt_float(sec, "N_jet", 2.0),
            v_jet=params.opt_float(sec, "v_jet_km_p_s", 1e4) * kmps,
            v_jet_mass_loading=params.opt_float(sec, "v_jet_mass_loading",
                                                10.0),
            v_jet_min=params.opt_float(sec, "v_jet_min_km_p_s", 0.0)
            * kmps,
            v_jet_model=v_model,
            reposition_ratio=params.opt_float(
                sec, "max_reposition_distance_ratio", 3.0),
            repos_vel_ratio=(params.opt_float(
                sec, "max_reposition_velocity_ratio", 0.5)
                if params.opt_int(
                    sec, "with_reposition_velocity_threshold", 1)
                else 0.0),
            repos_vel_min=max(0.0, params.opt_float(
                sec, "min_reposition_velocity_threshold_km_p_s", -1.0))
            * kmps,
            merging_ratio=params.opt_float(
                sec, "max_merging_distance_ratio", 3.0),
            merger_threshold=params.opt_string(
                sec, "merger_threshold_type", "escape_velocity").lower())

    # --- state ---------------------------------------------------------------
    def init_extra_fields(self, shape, mask=None):
        """Per-BH spin state riding the padded tiles
        (black_holes_part.h: spin, angular_momentum_direction,
        jet_reservoir, accretion_mode, efficiencies)."""
        z = jnp.zeros(shape, F32)
        live = 1.0 if mask is None else mask
        dirz = jnp.concatenate(
            [jnp.zeros(shape + (2,), F32), jnp.ones(shape + (1,), F32)],
            axis=-1)
        return {"spin": jnp.float32(self.seed_spin) * (z + live),
                "spin_dir": dirz,
                "jet_reservoir": z, "acc_mode": z,
                "jet_eff": z, "rad_eff": z, "f_edd": z,
                "v_jet_last": z}

    # --- mode-dependent disc structure ---------------------------------------
    def _modes(self, a, f_edd):
        """(thick, thin, slim) one-hot masks (decide_mode:492)."""
        thick = f_edd < jnp.float32(self.mdot_crit_ADAF)
        slim_ok = self.include_slim_disk
        slim = (~thick) & slim_ok & (
            eps_sd(a, f_edd)
            < jnp.float32(self.td_sd_eps_r_threshold) * eps_nt(a))
        thin = (~thick) & (~slim)
        return thick, thin, slim

    def _r_warp(self, a, m_sub, f_edd, thick, thin, slim, r_g):
        """Warp (Bardeen-Petterson alignment) radius, Lubow et al. 2002
        eqn. 22 / Griffin 2019 eqn. 11 / Fiacconi 2018 eqn. A8
        (black_holes_spin.h:161)."""
        aa = jnp.maximum(jnp.abs(a), 1e-4)
        alpha = self.alpha_acc
        rw_thick = r_g * jnp.maximum(
            15.36 * aa / (self.h_0_ADAF ** 2), 0.0) ** 0.4
        rw_slim = r_g * jnp.maximum(15.36 * aa * self.gamma_SD, 0.0) ** 0.4
        fe = jnp.maximum(f_edd, 1e-10)
        if self.td_region == "B":
            m8 = jnp.maximum(m_sub / (1e8 * self.m_solar), 1e-30)
            base = (m8 ** 0.2 * aa
                    / (self.xi_TD * alpha ** 0.8 * fe ** 0.4))
            rw = 3410.0 * 2.0 * r_g * base ** 0.625
            rs = (4790.0 * 2.0 * r_g * m8 ** -0.961
                  * alpha ** 0.549 * fe ** -0.353)
        else:  # region C
            m6 = jnp.maximum(m_sub / (1e6 * self.m_solar), 1e-30)
            base = (m6 ** 0.2 * aa
                    / (self.xi_TD * alpha ** 0.2 * fe ** 0.3))
            rw = 1553.0 * 2.0 * r_g * base ** 0.5714
            rs = (1.2e5 * 2.0 * r_g * m6 ** -1.1556
                  * (alpha * 10.0) ** 0.6222 * fe ** -0.48889)
        rw_thin = jnp.minimum(rw, rs)
        return jnp.where(thick, rw_thick,
                         jnp.where(slim, rw_slim, rw_thin))

    def _m_warp(self, mdot, m_sub, f_edd, r_w, thick, thin, slim):
        """Disc mass within r_warp (black_holes_spin.h:274)."""
        v0 = jnp.where(thick, self.v_0_ADAF, 1.0 / self.gamma_SD)
        mw_adv = (2.0 * mdot / (3.0 * self.alpha_acc * v0
                                * jnp.sqrt(jnp.maximum(
                                    m_sub * self.G, 1e-30)))
                  * r_w ** 1.5)
        fe = jnp.maximum(f_edd, 1e-10)
        r_g = self._r_grav(m_sub)
        Rfac_base = jnp.maximum(r_w / (2.0 * r_g), 1e-30)
        if self.td_region == "B":
            m8 = jnp.maximum(m_sub / (1e8 * self.m_solar), 1e-30)
            mw_thin = (self.m_solar * 1.35 * m8 ** 2.2
                       * self.alpha_acc ** -0.8 * fe ** 0.6
                       * Rfac_base ** 1.4)
        else:
            m6 = jnp.maximum(m_sub / (1e6 * self.m_solar), 1e-30)
            mw_thin = (self.m_solar * 0.01 * m6 ** 2.2
                       * (self.alpha_acc * 10.0) ** -0.8 * fe ** 0.7
                       * Rfac_base ** 1.25)
        return jnp.where(thin, mw_thin, mw_adv)

    def _j_warp(self, mdot, m_sub, f_edd, r_w, m_w, thick, thin, slim):
        """Disc angular momentum within r_warp
        (black_holes_spin.h:366)."""
        v0 = jnp.where(thick, self.v_0_ADAF, 1.0 / self.gamma_SD)
        om0 = jnp.where(thick, self.omega_0_ADAF, 1.0 / self.gamma_SD)
        jw_adv = (2.0 * mdot * om0 / (2.0 * self.alpha_acc * v0)
                  * r_w * r_w)
        coef = 0.737 if self.td_region == "B" else 0.714
        jw_thin = coef * m_w * jnp.sqrt(
            jnp.maximum(m_sub * self.G * r_w, 0.0))
        return jnp.where(thin, jw_thin, jw_adv)

    def _r_grav(self, m_sub):
        return m_sub * self.G / (self.c_light ** 2)

    def _aspect_ratio(self, a, m_sub, f_edd, r_w, thick, thin, slim):
        """H/R of the subgrid disc (black_holes_spin.h:534)."""
        fe = jnp.maximum(f_edd, 1e-10)
        r_g = self._r_grav(m_sub)
        m8 = jnp.maximum(m_sub / (1e8 * self.m_solar), 1e-30)
        Rfac_base = jnp.maximum(r_w / (2.0 * r_g), 1e-30)
        if self.td_region == "B":
            h_thin = (1.25e-3 * m8 ** -0.1 * self.alpha_acc ** 0.1
                      * fe ** 0.2 * Rfac_base ** 0.05)
        else:
            h_thin = (1.15e-3 * m8 ** -0.1 * self.alpha_acc ** 0.1
                      * fe ** 0.15 * Rfac_base ** 0.125)
        h_adv = jnp.where(thick, self.h_0_ADAF, 0.5 / self.gamma_SD)
        return jnp.where(thin, h_thin, h_adv)

    def jet_efficiency(self, a, aspect, thin):
        """Blandford-Znajek jet efficiency, Tchekhovskoy et al. (2010)
        eqn. 9 with the Narayan et al. (2021) flux fit
        (black_holes_spin.h:612)."""
        if not self.include_jets:
            return jnp.zeros_like(a)
        kappa = 0.05
        w = horizon_ang_vel(a)
        phi = (-20.2 * a ** 3 - 14.9 * a * a + 34.0 * a + 52.6)
        eff = (kappa * 0.25 / np.pi * phi * phi
               * jnp.maximum(aspect * 3.333, 1e-30) ** self.jet_h_r_slope
               * w * w * (1.0 + 1.38 * w * w - 9.2 * w ** 4))
        return jnp.maximum(eff, 0.0)

    def rad_efficiency(self, a, f_edd, thick, thin, slim):
        """Mode-dependent radiative efficiency
        (black_holes_spin.h:671)."""
        eps_td = eps_nt(a)
        fe = jnp.maximum(f_edd, 1e-10)
        r_i = r_isco(a)
        eff_thick = jnp.where(
            fe < self.edd_crit_thick,
            4.8 * eps_td / r_i * (1.0 - self.beta_acc) * self.delta_ADAF,
            2.4 * eps_td / r_i * self.beta_acc * fe
            / (self.alpha_acc ** 2))
        eff = jnp.where(thin, eps_td,
                        jnp.where(slim, eps_sd(a, f_edd), eff_thick))
        return jnp.maximum(eff, 0.0)

    def spinup_rate(self, a, f_edd, jet_eff, rad_eff, thick, thin, slim):
        """da/dln(M_0): Benson & Babul (2009) eqn. 2 with jet spindown,
        or the GRMHD thick/slim fit (da_dln_mbh_0:807)."""
        aa = jnp.clip(a, -0.998, 0.998)
        l_in = jnp.where(thin, l_isco(aa), 0.45 * l_isco(aa))
        if self.include_grmhd_spindown:
            fit = (0.45 - 12.53 * aa - 7.8 * aa ** 2 + 9.44 * aa ** 3
                   + 5.71 * aa ** 4 - 4.03 * aa ** 5)
            return jnp.where(thin, l_in - 2.0 * aa * (1.0 - rad_eff), fit)
        s = jnp.sqrt(jnp.maximum(1.0 - aa * aa, 0.0))
        asafe = jnp.where(jnp.abs(aa) < 1e-3, jnp.sign(aa) * 1e-3 + 1e-30,
                          aa)
        return (l_in - 2.0 * aa * (1.0 - rad_eff)
                - s / asafe * (aa * aa + (1.0 + s) ** 2) * jet_eff)

    # --- the per-step update ---------------------------------------------------
    def accrete(self, bh, dens, cosmo, dt):
        """Bondi accretion + mode decision + spin/direction evolution +
        reservoir fills + swallow probability (black_holes.h:700-1000).

        ``dens`` must carry the angular-momentum sums L0/L1/L2 from
        bh_gas_density_loop(with_ang_mom=True).
        """
        h = jnp.maximum(bh["h"], 1e-30)
        h_inv_dim = (1.0 / h) ** 3
        rho_com = dens["rho"] * h_inv_dim
        rho_phys = rho_com * cosmo.a_inv2 / cosmo.a
        rho_safe = jnp.maximum(dens["rho"], 1e-30)
        v_gas = jnp.stack([dens["mom0"], dens["mom1"], dens["mom2"]],
                          -1) / rho_safe[..., None]
        cs = dens["cs_w"] / rho_safe * cosmo.a_factor_sound_speed
        dv = (v_gas - bh["v_full"]) / cosmo.a
        v_rel2 = jnp.sum(dv * dv, -1)

        m_sub = jnp.maximum(bh["m_subgrid"], 1e-30)
        denom = jnp.maximum(cs ** 2 + v_rel2, 1e-30) ** 1.5
        mdot = (jnp.float32(self.boost_alpha) * 4.0 * np.pi
                * jnp.float32(self.G) ** 2 * m_sub ** 2
                * rho_phys / denom)
        mdot_edd = jnp.float32(self.edd_pref) * m_sub
        mdot = jnp.minimum(mdot, jnp.float32(self.f_edd_max) * mdot_edd)
        live = (bh["mask"] > 0) & (dens["ngb_mass"] > 0)
        mdot = jnp.where(live, mdot, 0.0)
        f_edd = mdot / jnp.maximum(mdot_edd, 1e-30)

        # spin floor keeps every formula finite (black_holes.h:962)
        a0 = jnp.where(jnp.abs(bh["spin"]) < 0.01,
                       jnp.float32(self.seed_spin), bh["spin"])
        thick, thin, slim = self._modes(a0, f_edd)

        # --- prograde/retrograde: King et al. (2005) criterion --------------
        L = jnp.stack([dens["L0"], dens["L1"], dens["L2"]], -1)
        L_norm = jnp.sqrt(jnp.maximum(jnp.sum(L * L, -1), 0.0))
        L_dir = L / jnp.maximum(L_norm, 1e-30)[..., None]
        cos_th = jnp.where(L_norm > 0,
                           jnp.sum(L_dir * bh["spin_dir"], -1), 0.0)
        j_bh = (m_sub * m_sub * jnp.abs(a0)
                * jnp.float32(self.G / self.c_light))
        r_g = self._r_grav(m_sub)
        r_w = self._r_warp(a0, m_sub, f_edd, thick, thin, slim, r_g)
        m_w = self._m_warp(mdot, m_sub, f_edd, r_w, thick, thin, slim)
        j_w = self._j_warp(mdot, m_sub, f_edd, r_w, m_w,
                           thick, thin, slim)
        retro = (j_bh * cos_th < -0.5 * j_w) & (jnp.abs(a0) > 0.01)
        a_signed = jnp.where(retro, -jnp.abs(a0), jnp.abs(a0))

        # mode-dependent efficiencies at the signed spin
        thick, thin, slim = self._modes(a_signed, f_edd)
        aspect = self._aspect_ratio(a_signed, m_sub, f_edd, r_w,
                                    thick, thin, slim)
        jet_eff = self.jet_efficiency(a_signed, aspect, thin)
        rad_eff = self.rad_efficiency(a_signed, f_edd, thick, thin, slim)

        # --- direction: consume n_i warp increments (black_holes.h:879) ----
        dm0 = mdot * dt
        n_i = jnp.where(mdot > 0, dm0 / jnp.maximum(m_w, 1e-30), 0.0)
        new_dir_raw = (bh["spin_dir"] * j_bh[..., None]
                       + (n_i * j_w)[..., None] * L_dir)
        mod = jnp.sqrt(jnp.maximum(
            jnp.sum(new_dir_raw ** 2, -1), 0.0))
        new_dir = jnp.where(
            (L_norm > 0)[..., None],
            jnp.where((jnp.abs(bh["spin"]) <= 0.01)[..., None], L_dir,
                      jnp.where((mod > 0)[..., None],
                                new_dir_raw
                                / jnp.maximum(mod, 1e-30)[..., None],
                                bh["spin_dir"])),
            bh["spin_dir"])

        # --- spin magnitude: da = dM0/M * s(a) (black_holes.h:943) ---------
        sup = self.spinup_rate(a_signed, f_edd, jet_eff, rad_eff,
                               thick, thin, slim)
        a_new = a_signed + dm0 / m_sub * sup
        a_new = jnp.clip(a_new, -0.998, 0.998)
        a_new = jnp.where(jnp.abs(a_new) < 0.01, 0.01, a_new)
        a_new = jnp.where(live, a_new, bh["spin"])

        # --- masses + reservoirs (black_holes.h:931-938) --------------------
        dm_real = dm0 * (1.0 - rad_eff - jet_eff)
        c2 = jnp.float32(self.c_light) ** 2
        jet_resv = bh["jet_reservoir"] \
            + dm0 * c2 * jnp.float32(self.eps_f_jet) * jet_eff
        resv = bh["energy_reservoir"] \
            + dm0 * c2 * jnp.float32(self.eps_f) * rad_eff
        m_sub_new = jnp.maximum(bh["m_subgrid"] + dm_real,
                                jnp.float32(self.seed_mass) * bh["mask"])

        deficit = jnp.maximum(m_sub_new - bh["m"], 0.0)
        prob = jnp.where(bh["mask"] > 0, deficit
                         / jnp.maximum(dens["ngb_mass"], 1e-30), 0.0)

        mode_code = jnp.where(thin, 1.0, jnp.where(slim, 2.0, 0.0))
        return {**bh, "m_subgrid": m_sub_new,
                "energy_reservoir": resv, "jet_reservoir": jet_resv,
                "swallow_prob": jnp.minimum(prob, 1.0),
                "mdot": mdot, "f_edd": f_edd,
                "spin": a_new, "spin_dir": new_dir,
                "acc_mode": jnp.where(live, mode_code, bh["acc_mode"]),
                "jet_eff": jnp.where(live, jet_eff, bh["jet_eff"]),
                "rad_eff": jnp.where(live, rad_eff, bh["rad_eff"]),
                "rho_gas": rho_com, "ngb_mass": dens["ngb_mass"]}

    def agn_fire(self, bh):
        """Thermal AGN reservoir release — EAGLE semantics
        (black_holes.h:1060-1130)."""
        live = bh["mask"] > 0
        mean_ngb = bh["ngb_mass"] / jnp.float32(48.0)
        e_crit = jnp.float32(self.n_heat) * jnp.float32(self.delta_u) \
            * jnp.maximum(mean_ngb, 1e-30)
        fire = live & (bh["energy_reservoir"] >= e_crit) \
            & (bh["ngb_mass"] > 0)
        fb_energy = jnp.where(fire, bh["energy_reservoir"], 0.0)
        resv = jnp.where(fire, 0.0, bh["energy_reservoir"])
        return fb_energy, resv

    def jet_velocity(self, bh):
        """Target jet kick velocity (black_holes_spin.h
        black_hole_feedback_dv_jet:849; constant and mass-loading
        models)."""
        if self.v_jet_model == "mass_loading":
            v = jnp.sqrt(jnp.maximum(
                2.0 * bh["jet_eff"]
                / jnp.float32(self.v_jet_mass_loading), 0.0)) \
                * jnp.float32(self.c_light)
            return jnp.maximum(v, jnp.float32(self.v_jet_min))
        return jnp.full_like(bh["m"], jnp.float32(max(self.v_jet,
                                                      self.v_jet_min)))

    def merge_spin(self, bh, gains):
        """Remnant spin after swallowing victim BHs (merger_spin_evolve,
        black_holes.h:549; Barausse & Rezzolla 2009).  Called with the
        PRE-merge winner state and the collect-loop ``gains`` (dms =
        victim subgrid mass, dJ{0,1,2} = victim mass-weighted spin
        vector).  Simplification vs the reference: multiple same-step
        victims aggregate into one effective secondary, and the angles
        are measured against the spin-only total angular momentum (the
        orbital term is dropped).  Returns (spin, spin_dir) updates.
        """
        merged = gains["n"] > 0
        m1 = jnp.maximum(bh["m_subgrid"], 1e-30)
        m2 = gains["dms"]
        J2 = jnp.stack([gains["dJ0"], gains["dJ1"], gains["dJ2"]], -1)
        J2n = jnp.sqrt(jnp.maximum(jnp.sum(J2 * J2, -1), 0.0))
        a2 = jnp.clip(J2n / jnp.maximum(m2, 1e-30), 0.01, 0.998)
        d2 = J2 / jnp.maximum(J2n, 1e-30)[..., None]
        a1 = jnp.clip(jnp.abs(bh["spin"]), 0.01, 0.998)
        d1 = bh["spin_dir"] * jnp.sign(bh["spin"])[..., None]
        q = jnp.clip(m2 / m1, 1e-6, 1.0)
        cos_a = jnp.clip(jnp.sum(d1 * d2, -1), -1.0, 1.0)
        Jt = (a1 * m1 * m1)[..., None] * d1 \
            + (a2 * m2 * m2)[..., None] * d2
        Jtn = jnp.sqrt(jnp.maximum(jnp.sum(Jt * Jt, -1), 0.0))
        jt = Jt / jnp.maximum(Jtn, 1e-30)[..., None]
        cos_b = jnp.clip(jnp.sum(d1 * jt, -1), -1.0, 1.0)
        cos_g = jnp.clip(jnp.sum(d2 * jt, -1), -1.0, 1.0)
        af = jnp.clip(final_spin_merger(a1, a2, q, cos_a, cos_b, cos_g),
                      0.01, 0.998)
        spin = jnp.where(merged, af, bh["spin"])
        spin_dir = jnp.where(merged[..., None], jt, bh["spin_dir"])
        return spin, spin_dir

    def jet_fire(self, bh):
        """(fire, v_jet): launch a jet pair once the reservoir covers a
        jet event of N_jet mean-mass particles at v_jet
        (black_holes.h:1185-1205)."""
        live = (bh["mask"] > 0) & (bh["ngb_mass"] > 0)
        if not self.include_jets:
            return jnp.zeros_like(live, dtype=bool), self.jet_velocity(bh)
        v_jet = self.jet_velocity(bh)
        mean_ngb = bh["ngb_mass"] / jnp.float32(48.0)
        e_event = 0.5 * v_jet * v_jet * jnp.maximum(mean_ngb, 1e-30) \
            * jnp.float32(self.n_jet)
        fire = live & (bh["jet_reservoir"] > e_event)
        return fire, v_jet
