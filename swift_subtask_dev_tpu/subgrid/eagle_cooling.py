"""EAGLE-style table-interpolation cooling.

Re-creation of src/cooling/EAGLE/ (cooling.c:1148 cooling_cool_part,
interpolate.h, cooling_tables.c): radiative cooling/heating from
pre-tabulated net rates Λ_net(z, n_H, T) at solar abundance ratios, a
metallicity-scaled metal contribution, Compton cooling off the CMB, and
an implicit (bisection) solve for the end-of-step internal energy whose
result is written back as the particle's u_dt.

The real EAGLE tables are proprietary HDF5 files (Wiersma+2009) not
shipped with the reference; here the SAME table machinery (log-spaced
axes, trilinear interpolation, implicit solve, element scaling) runs on
tables SYNTHESIZED from standard analytic rates (Katz, Weinberg &
Hernquist 1996 primordial H/He collisional-equilibrium rates;
bremsstrahlung; a metal-line bump; z-dependent Compton) — swap
``build_tables`` for a real-table reader to reproduce EAGLE numbers
exactly.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

F32 = jnp.float32

# table axes (cooling_tables.c uses log-spaced T and n_H exactly like this)
LOG_T_MIN, LOG_T_MAX, N_T = 2.0, 9.0, 128
LOG_NH_MIN, LOG_NH_MAX, N_NH = -9.0, 3.0, 25
Z_MIN, Z_MAX, N_Z = 0.0, 9.0, 10

K_B = 1.380649e-16          # erg/K
M_P = 1.67262192e-24        # g
SIGMA_T = 6.6524587e-25     # cm^2
C_LIGHT = 2.99792458e10     # cm/s
A_RAD = 7.5657e-15          # erg cm^-3 K^-4
T_CMB0 = 2.7255
Z_SUN = 0.0134


def _primordial_lambda(T):
    """Primordial (H+He) CIE cooling Λ/n_H² [erg cm³/s] — Katz, Weinberg
    & Hernquist (1996) table 1 fits, collisional equilibrium."""
    T = np.asarray(T, np.float64)
    T3 = T / 1e3
    T5 = T / 1e5
    T6 = T / 1e6
    # equilibrium ionization fractions (rough CIE shape: neutral below
    # 1e4 K, ionized above ~1.5e4 K)
    x_ion = 1.0 / (1.0 + np.exp(-(np.log10(T) - 4.1) / 0.08))
    # collisional excitation of H (dominant 1e4-1e5 K)
    ce_H = 7.5e-19 * np.exp(-118348.0 / T) / (1.0 + np.sqrt(T5))
    # collisional ionization of H
    ci_H = 1.27e-21 * np.sqrt(T) * np.exp(-157809.1 / T) \
        / (1.0 + np.sqrt(T5))
    # recombination to H
    re_H = 8.7e-27 * np.sqrt(T) * T3 ** (-0.2) / (1.0 + T6 ** 0.7)
    # He contributions (scaled: y = n_He/n_H ~ 0.0789 for X=0.752)
    y = 0.0789
    ce_He = 5.54e-17 * T ** (-0.397) * np.exp(-473638.0 / T) \
        / (1.0 + np.sqrt(T5)) * y
    # free-free (all ionized species)
    gff = 1.1 + 0.34 * np.exp(-((5.5 - np.log10(T)) ** 2) / 3.0)
    ff = 1.42e-27 * gff * np.sqrt(T) * (1.0 + y)
    return (ce_H + ci_H + re_H + ce_He) * x_ion ** 2 + ff * x_ion ** 2


def _metal_lambda(T):
    """Metal-line cooling Λ_Z/n_H² [erg cm³/s] at SOLAR metallicity —
    synthesized bump peaking near 1e5.5 K (the shape of the Wiersma+09
    solar-abundance metal contribution)."""
    logT = np.log10(np.asarray(T, np.float64))
    bump = 1.0e-21 * np.exp(-((logT - 5.4) ** 2) / (2 * 0.55 ** 2))
    hot = 2.0e-23 * np.exp(-((logT - 7.2) ** 2) / (2 * 0.8 ** 2))
    on = 1.0 / (1.0 + np.exp(-(logT - 4.0) / 0.05))
    return (bump + hot) * on


def _uvb_heating(z):
    """Photoheating rate per H atom [erg/s] — smooth HM-like history
    peaking near z~2 (stands in for the tabulated UV background; the
    normalisation keeps the photoheated-equilibrium of IGM-density gas
    near ~1e4-1e5 K against the CIE cooling curve)."""
    return 5.0e-26 * np.exp(-((z - 2.0) ** 2) / 8.0) + 5.0e-27


@dataclass(frozen=True)
class EagleCooling:
    """Synthesized-table EAGLE cooling model (internal-unit interface).

    table: (N_Z, N_NH, N_T) net Λ/n_H² in erg cm³/s at SOLAR metallicity
    plus ``metal_table`` (N_T,), both interpolated tri/linearly in
    (z, log n_H, log T) like interpolate.h's interpolation_4d.
    """

    table: tuple = ()             # primordial+UVB net rate (as nested tuple)
    metal_table: tuple = ()       # solar-metal Λ_Z: (N_T,) synthesized, or
    # (N_Z, N_NH, N_T) from real Wiersma tables (z- and nH-dependent)
    # real-table axes (from_wiersma): when set they replace the module's
    # synthesized-axis constants.  log10 T and log10 n_H are uniform in
    # the Wiersma files; redshift is NOT (z interp uses searchsorted).
    z_axis: tuple = ()
    log_T_axis: tuple = ()        # (min, max, n)
    log_nH_axis: tuple = ()       # (min, max, n)
    # unit conversions (host-precomputed, f64 folded to f32 on device)
    nH_from_rho: float = 1.0      # internal rho -> n_H [cm^-3]
    T_from_u: float = 1.0         # internal u -> K (at mu=1)
    dudt_from_cgs: float = 1.0    # erg/s/g -> internal du/dt
    compton_pref: float = 0.0     # Compton prefactor in cgs
    hydrogen_mass_fraction: float = 0.752
    # cooling/QLA: the quick-Lyman-alpha flavour runs the SAME table
    # machinery restricted to primordial abundances (QLA/cooling_rates.h
    # has no metal contribution); metal_free drops the Z scaling
    metal_free: bool = False

    @staticmethod
    def from_params(params, units, phys_const,
                    hydrogen_mass_fraction: float = 0.752,
                    section: str = "EAGLECooling",
                    metal_free: bool = False) -> "EagleCooling":
        """EAGLECooling/QLACooling YAML section (cooling_init,
        EAGLE/cooling.c; QLA/cooling.c)."""
        X_H = params.opt_float(section, "H_mass_fraction",
                               hydrogen_mass_fraction) \
            if params.has(section) else hydrogen_mass_fraction

        T = np.logspace(LOG_T_MIN, LOG_T_MAX, N_T)
        zs = np.linspace(Z_MIN, Z_MAX, N_Z)
        nH = np.logspace(LOG_NH_MIN, LOG_NH_MAX, N_NH)
        lam_p = _primordial_lambda(T)                     # (N_T,)
        table = np.empty((N_Z, N_NH, N_T))
        for iz, z in enumerate(zs):
            heat = _uvb_heating(z)                        # erg/s per H
            for inH, n in enumerate(nH):
                # net = heating/n_H - cooling (per n_H^2); the UVB only
                # heats low-density, cool gas (self-shielding above
                # n_H ~ 1e-2, ionized above ~1e5 K)
                shield = 1.0 / (1.0 + (n / 1e-2) ** 2)
                hot_off = np.exp(-(T / 3e5))
                table[iz, inH] = heat * shield * hot_off / n - lam_p

        rho_to_cgs = 1.0 / units.from_cgs("density")
        u_to_cgs = (1.0 / units.from_cgs("velocity")) ** 2
        t_int = 1.0 / units.from_cgs("time")  # internal time in seconds
        return EagleCooling(
            table=tuple(map(tuple, (map(tuple, r) for r in table))),
            metal_table=tuple(_metal_lambda(T)),
            nH_from_rho=float(X_H / M_P * rho_to_cgs),
            T_from_u=float(u_to_cgs * M_P / K_B),
            dudt_from_cgs=float(t_int / u_to_cgs),
            # 4 sigma_T a_rad c k_B/(m_e c^2) [erg/s/K^5 per electron]
            compton_pref=5.65e-36,
            hydrogen_mass_fraction=float(X_H),
            metal_free=metal_free,
        )

    @staticmethod
    def from_wiersma(dir_name: str, units,
                     hydrogen_mass_fraction: float = 0.752,
                     helium_mass_fraction: float = 0.248,
                     metal_free: bool = False) -> "EagleCooling":
        """Read a real Wiersma+(2009) EAGLE cooling-table directory
        (cooling_tables.c: get_cooling_redshifts reads
        ``<dir>/redshifts.dat``; get_redshift_invariant_table /
        get_cooling_table read ``z_X.XXX.hdf5`` files with
        /Metal_free/Net_Cooling (He,T,nH), /<Element>/Net_Cooling (T,nH),
        /Solar/Temperature_bins, /Solar/Hydrogen_density_bins,
        /Metal_free/Helium_mass_fraction_bins).

        The He axis is collapsed at ``helium_mass_fraction`` (linear
        interpolation over the He-fraction bins — the reference carries
        the axis to per-particle He abundances; a single primordial He
        fraction is the engine-wide equivalent used here).  Element
        tables are summed into one solar-abundance metal table kept on
        its full (z, nH, T) grid.
        """
        import os

        import h5py

        elements = ("Carbon", "Nitrogen", "Oxygen", "Neon", "Magnesium",
                    "Silicon", "Sulphur", "Calcium", "Iron")
        with open(os.path.join(dir_name, "redshifts.dat")) as f:
            nz = int(f.readline())
            zs = np.array([float(f.readline()) for _ in range(nz)])
        order = np.argsort(zs)
        zs = zs[order]

        prim = None
        metal = None
        for k, z in enumerate(zs):
            fname = os.path.join(dir_name, f"z_{z:1.3f}.hdf5")
            with h5py.File(fname, "r") as f:
                Tb = f["/Solar/Temperature_bins"][:]
                nHb = f["/Solar/Hydrogen_density_bins"][:]
                Heb = f["/Metal_free/Helium_mass_fraction_bins"][:]
                mf = f["/Metal_free/Net_Cooling"][:]      # (He, T, nH)
                msum = np.zeros_like(f[f"/{elements[0]}/Net_Cooling"][:])
                for el in elements:
                    msum = msum + f[f"/{el}/Net_Cooling"][:]  # (T, nH)
            if prim is None:
                prim = np.zeros((nz, len(nHb), len(Tb)))
                metal = np.zeros((nz, len(nHb), len(Tb)))
                logT = np.log10(Tb)
                lognH = np.log10(nHb)
            # collapse the He axis at the run's He mass fraction
            ih = np.clip(np.searchsorted(Heb, helium_mass_fraction) - 1,
                         0, max(len(Heb) - 2, 0))
            if len(Heb) > 1:
                fh = np.clip((helium_mass_fraction - Heb[ih])
                             / (Heb[ih + 1] - Heb[ih]), 0.0, 1.0)
                mf_h = (1 - fh) * mf[ih] + fh * mf[ih + 1]   # (T, nH)
            else:
                mf_h = mf[0]
            # net-rate sign convention: the synthesized table stores
            # heating-positive net rates; Wiersma Net_Cooling is
            # cooling-positive (eagle_cooling_rate, cooling_rates.h)
            prim[k] = -mf_h.T                                # (nH, T)
            metal[k] = msum.T
        rho_to_cgs = 1.0 / units.from_cgs("density")
        u_to_cgs = (1.0 / units.from_cgs("velocity")) ** 2
        t_int = 1.0 / units.from_cgs("time")
        return EagleCooling(
            table=tuple(map(tuple, (map(tuple, r) for r in prim))),
            metal_table=tuple(map(tuple, (map(tuple, r) for r in metal))),
            z_axis=tuple(zs),
            log_T_axis=(float(logT[0]), float(logT[-1]), len(logT)),
            log_nH_axis=(float(lognH[0]), float(lognH[-1]), len(lognH)),
            nH_from_rho=float(hydrogen_mass_fraction / M_P * rho_to_cgs),
            T_from_u=float(u_to_cgs * M_P / K_B),
            dudt_from_cgs=float(t_int / u_to_cgs),
            compton_pref=5.65e-36,
            hydrogen_mass_fraction=float(hydrogen_mass_fraction),
            metal_free=metal_free,
        )

    # --- device-side interpolation ---------------------------------------
    def _tables_dev(self):
        return (jnp.asarray(np.asarray(self.table), F32),
                jnp.asarray(np.asarray(self.metal_table), F32))

    def net_rate_cgs(self, logT, lognH, z, Z_metal, T, n_H):
        """Λ_net/n_H² [erg cm³/s] via trilinear table interpolation +
        metallicity scaling + Compton (interpolate.h analog)."""
        tab, mtab = self._tables_dev()
        lt0, lt1, n_t = self.log_T_axis or (LOG_T_MIN, LOG_T_MAX, N_T)
        ln0, ln1, n_n = self.log_nH_axis or (LOG_NH_MIN, LOG_NH_MAX, N_NH)
        ti = (logT - lt0) / (lt1 - lt0) * (n_t - 1)
        ni = (lognH - ln0) / (ln1 - ln0) * (n_n - 1)
        if self.z_axis:
            # real Wiersma tables: non-uniform redshift list
            # (get_cooling_redshifts, cooling_tables.c:81)
            zax = jnp.asarray(np.asarray(self.z_axis, np.float32))
            n_z = len(self.z_axis)
            z0 = jnp.clip(jnp.sum(zax <= z) - 1, 0, n_z - 2) \
                .astype(jnp.int32)
            dz_ax = zax[z0 + 1] - zax[z0]
            fz = jnp.clip((z - zax[z0]) / jnp.where(dz_ax != 0, dz_ax, 1.0),
                          0.0, 1.0)
        else:
            n_z = N_Z
            zi = jnp.clip((z - Z_MIN) / (Z_MAX - Z_MIN) * (N_Z - 1),
                          0.0, N_Z - 1.001)
            z0 = jnp.floor(zi).astype(jnp.int32)
            fz = zi - z0
        ti = jnp.clip(ti, 0.0, n_t - 1.001)
        ni = jnp.clip(ni, 0.0, n_n - 1.001)
        t0 = jnp.floor(ti).astype(jnp.int32)
        n0 = jnp.floor(ni).astype(jnp.int32)
        ft, fn = ti - t0, ni - n0

        def g(dz, dn, dt):
            return tab[z0 + dz, n0 + dn, t0 + dt]

        lam = 0.0
        for dz, wz in ((0, 1 - fz), (1, fz)):
            for dn, wn in ((0, 1 - fn), (1, fn)):
                for dt, wt in ((0, 1 - ft), (1, ft)):
                    lam = lam + wz * wn * wt * g(dz, dn, dt)
        if not self.metal_free:
            if mtab.ndim == 3:
                # real tables: metal contribution interpolated in
                # (z, n_H, T) exactly like the primordial part
                # (elements summed at load; scaled by Z/Z_sun below)
                lam_Z = 0.0
                for dz, wz in ((0, 1 - fz), (1, fz)):
                    for dn, wn in ((0, 1 - fn), (1, fn)):
                        for dt, wt in ((0, 1 - ft), (1, ft)):
                            lam_Z = lam_Z + wz * wn * wt * \
                                mtab[z0 + dz, n0 + dn, t0 + dt]
            else:
                lam_Z = (1 - ft) * mtab[t0] + ft * mtab[t0 + 1]
            lam = lam - lam_Z * (Z_metal / Z_SUN)
        # Compton off the CMB: Λ_C = pref n_e (T - T_CMB) T_CMB^4 / n_H^2;
        # n_e = 1.16 n_H x_e, so n_e/n_H^2 = 1.16 x_e/n_H — cancel one
        # n_H analytically (n_H^2 underflows f32 below 1e-19)
        T_cmb = T_CMB0 * (1.0 + z)
        ne_nH2 = 1.16 * jax.nn.sigmoid((logT - 4.1) / 0.08) \
            / jnp.maximum(n_H, 1e-30)
        lam = lam - jnp.float32(5.65e-36) * (T_cmb ** 4) \
            * (T - T_cmb) * ne_nH2
        return lam

    def du_dt_internal(self, rho_phys, u_phys, z, Z_metal):
        """Net du/dt in INTERNAL units (physical frame) at the given
        physical density/energy (the hook the implicit solver iterates).
        """
        n_H = rho_phys * jnp.float32(self.nH_from_rho)
        # mean molecular weight: neutral 1.22 below 1e4 K, ionised 0.59
        T_mu1 = u_phys * (2.0 / 3.0) * jnp.float32(self.T_from_u)
        mu = 0.59 + (1.22 - 0.59) * jax.nn.sigmoid(
            (4.0 - jnp.log10(jnp.maximum(T_mu1 * 0.59, 1.0))) / 0.1)
        T = T_mu1 * mu
        logT = jnp.log10(jnp.maximum(T, 10.0 ** LOG_T_MIN))
        lognH = jnp.log10(jnp.maximum(n_H, 10.0 ** LOG_NH_MIN))
        lam = self.net_rate_cgs(logT, lognH, z, Z_metal, T, n_H)
        # du/dt [erg/s/g] = Λ n_H² / rho; rho in cgs from n_H
        rho_cgs = n_H * jnp.float32(M_P / self.hydrogen_mass_fraction)
        dudt_cgs = lam * n_H * n_H / jnp.maximum(rho_cgs, 1e-40)
        return dudt_cgs * jnp.float32(self.dudt_from_cgs)


def make_eagle_cooling_fn(model: EagleCooling, floor=None,
                          u_minimal: float = 0.0,
                          hydro_gamma: float = 5.0 / 3.0,
                          n_iter: int = 40):
    """Engine cooling hook with the EAGLE implicit solve
    (cooling_cool_part, EAGLE/cooling.c:1148): bisection on
    f(u) = u - u_0 - (du/dt_hydro + du/dt_cool(u)) dt, then the
    particle's u_dt is replaced by (u_final - u_0)/dt."""

    def cooling_fn(s, cosmo, dt_therm):
        a_u = cosmo.a_factor_internal_energy
        z = 1.0 / cosmo.a - 1.0
        u_com0 = s["u_full"]
        rho_com = jnp.maximum(s["rho"], 1e-30)
        rho_phys = rho_com * cosmo.a_inv2 / cosmo.a
        Z_metal = s.get("Z", jnp.zeros_like(u_com0))
        dt = jnp.maximum(dt_therm, 1e-30)

        # hydro du/dt folded into u_0 (EAGLE/cooling.c:1202
        # u_start + hydro_du_dt * dt); solve in the comoving frame with
        # the physical->comoving rate conversion used across this
        # subgrid stack (cooling.py:85)
        u0_com = jnp.maximum(u_com0 + s["u_dt"] * dt, 1e-30)

        def rate_com(u_com):
            phys = model.du_dt_internal(rho_phys, u_com * a_u, z, Z_metal)
            return phys * cosmo.a * cosmo.a / a_u

        # explicit if the change is small (cooling.c:1260)
        lam0 = rate_com(u0_com)
        u_expl = u0_com + lam0 * dt

        # log-bisection (the reference's Newton/bisection fallback)
        lo = u0_com / jnp.float32(2.0 ** 20)
        hi = u0_com * jnp.float32(2.0 ** 20)

        def body(_, carry):
            lo, hi = carry
            mid = jnp.sqrt(lo * hi)
            f = mid - u0_com - rate_com(mid) * dt
            lo = jnp.where(f > 0, lo, mid)
            hi = jnp.where(f > 0, mid, hi)
            return lo, hi

        lo, hi = jax.lax.fori_loop(0, n_iter, body, (lo, hi))
        u_impl = jnp.sqrt(lo * hi)

        explicit_ok = jnp.abs(lam0 * dt) < 0.05 * u0_com
        u_final_com = jnp.where(explicit_ok, u_expl, u_impl)

        # floors: entropy floor + absolute minimum (physical -> comoving)
        if floor is not None:
            u_fl = floor.u_floor(rho_phys, rho_com, hydro_gamma)
        else:
            u_fl = jnp.zeros_like(u_final_com)
        u_final_com = jnp.maximum(
            u_final_com, jnp.maximum(u_fl, jnp.float32(u_minimal)) / a_u)

        total = (u_final_com - u_com0) / dt
        zero_dt = dt_therm <= 0.0
        return {"u_dt": jnp.where(zero_dt, s["u_dt"], total)}

    return cooling_fn
