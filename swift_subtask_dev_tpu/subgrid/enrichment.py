"""EAGLE stellar enrichment: AGB + SNII mass return, SNIa rates, metals.

Reference src/feedback/EAGLE/: enrichment.h (evolve_SNIa:267,
evolve_SNII:340, evolve_AGB:512 integrate tabulated yields against the
IMF over the stars dying this step), imf.h (Chabrier 2003 IMF, dying
masses from lifetime tables), yield_tables.h (Portinari/Marigo/
Thielemann table reads).  The binary EAGLE yield tables are not shipped
in this image, so — exactly like subgrid/eagle_cooling.py — the tables
are SYNTHESIZED from smooth standard forms with the right structure and
magnitudes, and the reference's integration machinery is kept:

* Chabrier (2003) IMF on [0.1, 100] Msun (imf.h:142 imf_evaluate:
  lognormal below 1 Msun, x = -2.3 power law above), normalised so
  the total mass integral is 1.
* Lifetimes t(m) = 10 Gyr * (m/Msun)^-2.5 (the Portinari table's
  leading behaviour), inverted for the dying-mass window
  [m(t2), m(t1)] each step (imf.h dying_mass_msun).
* Remnant masses: white dwarfs 0.44 + 0.08 m below 8 Msun, neutron
  stars 1.4 above (yield synthesis; Iben & Renzini / Portinari).
* SNII (8..100 Msun): ejecta = m - remnant, with a 10% oxygen-group
  metal yield (O/Ne/Mg/Si core-collapse signature).
* AGB (0.8..8 Msun): ejecta = m - remnant with a 1% C+N yield.
* SNIa: exponential delay-time distribution (enrichment.h:165
  eagle_feedback_SNIa_DTD_exponential) nu exp(-t/tau), each event
  ejecting 1.4 Msun of W7-like composition (Thielemann 2003:
  Fe-dominated, Si/O secondaries).

All the per-step work is closed-form + jnp.interp on cumulative IMF
integrals precomputed at init — the device never loops over mass bins.
Ejecta are distributed kernel-weighted over the star's gas neighbours
(feedback_iact.h nonsym: share = m_j W(r, h_star) / Sigma m W).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .chemistry import N_ELEMENTS

F32 = jnp.float32

# element order: H, He, C, N, O, Ne, Mg, Si, Fe (chemistry.py)
_SNII_METALS = np.array([0.0, 0.0, 0.01, 0.005, 0.5,
                         0.15, 0.1, 0.15, 0.085])   # fractions of Z yield
# AGB composition shifts with initial Z (Marigo 2001 tables: primary C at
# low Z, secondary N at high Z) — lerped in log Z between these ends
_AGB_METALS_LO_Z = np.array([0.0, 0.0, 0.85, 0.10, 0.05,
                             0.0, 0.0, 0.0, 0.0])
_AGB_METALS_HI_Z = np.array([0.0, 0.0, 0.40, 0.55, 0.05,
                             0.0, 0.0, 0.0, 0.0])
_AGB_METALS = _AGB_METALS_LO_Z  # backward-compat alias
_SNIA_EJECTA = np.array([0.0, 0.0, 0.002, 1e-5, 0.14,
                         0.005, 0.01, 0.15, 0.74]) * 1.4 / 1.047
# (normalised so one event ejects 1.4 Msun of metals)

# Metallicity bins of the synthesized yield tables — the reference's
# Portinari SNII / Marigo AGB table Z axes (yield_tables.h:
# eagle_feedback_N_metallicities; enrichment.h determine_bin_yield
# interpolates between bins in log Z).  Z-dependent forms:
#   SNII metal yield fraction falls mildly with Z (mass loss removes the
#   envelope before core collapse): y = 0.10 (1 - 6 Z).
#   AGB metal yield rises with Z (secondary N production):
#   y = 0.005 + 0.35 Z.
_Z_BINS = np.array([0.0004, 0.004, 0.008, 0.019, 0.05])
_N_ZBINS = len(_Z_BINS)


def _snii_yield_frac(Z):
    return 0.10 * (1.0 - 6.0 * Z)


def _agb_yield_frac(Z):
    return 0.005 + 0.35 * Z


def chabrier_imf(m):
    """Number IMF xi(m) (imf.h:142), unnormalised."""
    m = np.asarray(m, np.float64)
    lognormal = (0.852464 / m) * np.exp(
        -(np.log10(m) - np.log10(0.079)) ** 2 / (2 * 0.69 ** 2))
    power = 0.237912 * m ** -2.3
    return np.where(m > 1.0, power, lognormal)


def _remnant_mass(m):
    """White dwarf below 8 Msun, 1.4 Msun compact remnant above."""
    return np.where(m < 8.0, 0.44 + 0.08 * m, 1.4)


@dataclass(frozen=True)
class EagleEnrichment:
    """Pre-integrated IMF/yield tables + SNIa DTD parameters.

    Masses in Msun internally; ``Msun`` and ``Gyr`` convert to internal
    units at the call boundary.
    """

    Msun: float = 1.0           # internal units per solar mass
    Gyr: float = 1.0            # internal units per Gyr
    SNIa_nu: float = 2e-3       # events per Msun formed
    SNIa_tau_Gyr: float = 2.0
    SNIa_delay_Gyr: float = 0.04
    SNII_min: float = 8.0
    SNII_max: float = 100.0
    # cumulative tables on the log-mass grid (set in __post_init__)
    log_m_grid: tuple = field(default=None, repr=False)
    cum_num: tuple = field(default=None, repr=False)
    cum_ej: tuple = field(default=None, repr=False)
    cum_Z_snii: tuple = field(default=None, repr=False)
    cum_Z_agb: tuple = field(default=None, repr=False)
    # real-table fields (load_yield_tables); None -> synthesized forms
    z_bins_snii: tuple = field(default=None, repr=False)
    z_bins_agb: tuple = field(default=None, repr=False)
    cum_ej_snii: tuple = field(default=None, repr=False)
    cum_ej_agb: tuple = field(default=None, repr=False)
    comp_snii: tuple = field(default=None, repr=False)
    comp_agb: tuple = field(default=None, repr=False)
    snia_vec: tuple = field(default=None, repr=False)
    life_z_bins: tuple = field(default=None, repr=False)
    life_logt_grid: tuple = field(default=None, repr=False)
    life_m_of_t: tuple = field(default=None, repr=False)

    def __post_init__(self):
        lg = np.linspace(np.log10(0.1), np.log10(100.0), 512)
        m = 10.0 ** lg
        xi = chabrier_imf(m)
        # normalise: integral of m xi dm == 1 (one Msun formed)
        mass_int = np.trapezoid(m * xi * m * np.log(10.0), lg)
        xi = xi / mass_int
        dndlg = xi * m * np.log(10.0)           # per dlog10 m

        def cum(w):
            c = np.concatenate([[0.0], np.cumsum(
                0.5 * (w[1:] + w[:-1]) * np.diff(lg))])
            return c

        ej = np.maximum(m - _remnant_mass(m), 0.0)
        agb_w = (m > 0.8) & (m < self.SNII_min)
        snii_w = (m >= self.SNII_min) & (m <= self.SNII_max)
        object.__setattr__(self, "log_m_grid", tuple(lg))
        object.__setattr__(self, "cum_num", tuple(cum(dndlg)))
        object.__setattr__(self, "cum_ej", tuple(
            cum(ej * dndlg * (agb_w | snii_w))))
        # metal yields on the (Z bin, mass) grid — tuple of per-Z-bin
        # cumulative tables, interpolated in log Z at evaluation time
        # (yield_tables.h Portinari/Marigo Z axes)
        object.__setattr__(self, "cum_Z_snii", tuple(
            tuple(cum(_snii_yield_frac(Zb) * m * dndlg * snii_w))
            for Zb in _Z_BINS))
        object.__setattr__(self, "cum_Z_agb", tuple(
            tuple(cum(_agb_yield_frac(Zb) * m * dndlg * agb_w))
            for Zb in _Z_BINS))

    @staticmethod
    def from_params(params, units) -> "EagleEnrichment":
        sec = "EAGLEFeedback"
        Msun = 1.98841e33 * units.from_cgs("mass")
        Gyr = 3.15569252e16 * units.from_cgs("time")
        return EagleEnrichment(
            Msun=Msun, Gyr=Gyr,
            SNIa_nu=params.opt_float(sec, "SNIa_DTD_exp_norm_p_Msun",
                                     2e-3),
            SNIa_tau_Gyr=params.opt_float(
                sec, "SNIa_DTD_exp_timescale_Gyr", 2.0),
            SNIa_delay_Gyr=params.opt_float(sec, "SNIa_DTD_delay_Gyr",
                                            0.04),
            SNII_min=params.opt_float(sec, "SNII_min_mass_Msun", 8.0),
            SNII_max=params.opt_float(sec, "SNII_max_mass_Msun", 100.0))

    # --- device pieces ----------------------------------------------------
    def dying_mass(self, age_Gyr, Z=None):
        """m(t): inverse of the stellar lifetime at the star's Z.

        With real tables loaded (load_yield_tables), the Portinari
        lifetime table is inverted per Z bin and interpolated in
        (log10 t, log Z) — imf.h dying_mass_msun.  Otherwise the
        synthesized form t(m) = 10 m^-2.5 f_L(Z) Gyr with the
        ~20%-longer-at-high-Z factor normalised at the solar bin."""
        t = jnp.maximum(age_Gyr, 1e-6)
        if self.life_m_of_t is not None:
            lt = jnp.log10(t)
            grid = jnp.asarray(self.life_logt_grid, F32)
            rows = jnp.asarray(np.asarray(self.life_m_of_t, np.float32))
            zb = np.asarray(self.life_z_bins, np.float64)
            if Z is None:
                # solar row (closest bin to Z=0.019)
                zi0 = int(np.argmin(np.abs(zb - 0.019)))
                return jnp.interp(lt, grid, rows[zi0])
            lzb = jnp.log(jnp.asarray(np.maximum(zb, 1e-10), F32))
            lz = jnp.log(jnp.clip(Z, max(zb[0], 1e-10), zb[-1]))
            zi = jnp.clip(jnp.searchsorted(lzb, lz) - 1, 0, len(zb) - 2)
            zf = jnp.clip((lz - lzb[zi]) / (lzb[zi + 1] - lzb[zi]),
                          0.0, 1.0)
            # mixed scalar/array age and Z are legal: broadcast to a
            # common shape before the per-row vmap (advisor r4 finding)
            lt_b, zi_b, zf_b = jnp.broadcast_arrays(lt, zi, zf)
            shape = lt_b.shape
            row_interp = jax.vmap(lambda r, q: jnp.interp(q, grid, r))
            m_lo = row_interp(rows[zi_b.reshape(-1)],
                              lt_b.reshape(-1)).reshape(shape)
            m_hi = row_interp(rows[(zi_b + 1).reshape(-1)],
                              lt_b.reshape(-1)).reshape(shape)
            return (1.0 - zf_b) * m_lo + zf_b * m_hi
        if Z is not None:
            f_L = jnp.clip(1.0 + 0.04 * jnp.log(
                jnp.maximum(Z, 1e-8) / 0.019), 0.75, 1.10)
            t = t / f_L
        return jnp.clip((t / 10.0) ** (-1.0 / 2.5), 0.1, 100.0)

    def _interp(self, table, m):
        lg = jnp.asarray(self.log_m_grid)
        return jnp.interp(jnp.log10(m), lg, jnp.asarray(table))

    def window(self, table, m_lo, m_hi):
        return jnp.maximum(self._interp(table, m_hi)
                           - self._interp(table, m_lo), 0.0)

    def _z_weights(self, Z, bins=None):
        """Bracketing Z-bin index + log-Z fraction (determine_bin_yield,
        feedback/EAGLE/enrichment.h).  ``bins`` defaults to the
        synthesized axis; real tables carry their own per channel."""
        b = np.asarray(bins if bins is not None else _Z_BINS, np.float64)
        zgrid = jnp.log(jnp.asarray(np.maximum(b, 1e-10), jnp.float32))
        lz = jnp.log(jnp.clip(Z, max(b[0], 1e-10), b[-1]))
        zi = jnp.clip(jnp.searchsorted(zgrid, lz) - 1, 0, len(b) - 2)
        zf = (lz - zgrid[zi]) / (zgrid[zi + 1] - zgrid[zi])
        return zi, jnp.clip(zf, 0.0, 1.0)

    def window_z(self, tables, m_lo, m_hi, Z, bins=None):
        """Yield window interpolated at the star's metallicity: evaluate
        the mass window in every Z bin, then lerp between the two
        bracketing bins in log Z."""
        v = jnp.stack([self.window(t, m_lo, m_hi) for t in tables])
        zi, zf = self._z_weights(Z, bins)
        lo = jnp.take_along_axis(v, zi[None], axis=0)[0]
        hi = jnp.take_along_axis(v, (zi + 1)[None], axis=0)[0]
        return lo * (1.0 - zf) + hi * zf

    def _comp_z(self, comps, Z, bins):
        """(…, 9) composition vector lerped at the star's Z."""
        v = jnp.asarray(np.asarray(comps, np.float32))     # (nZ, 9)
        zi, zf = self._z_weights(Z, bins)
        return (1.0 - zf[..., None]) * v[zi] + zf[..., None] * v[zi + 1]

    def num_SNIa(self, t1_Gyr, t2_Gyr):
        """SNIa per Msun formed in the age interval (enrichment.h:165)."""
        tau_inv = 1.0 / self.SNIa_tau_Gyr
        t1 = jnp.maximum(t1_Gyr - self.SNIa_delay_Gyr, 0.0)
        t2 = jnp.maximum(t2_Gyr - self.SNIa_delay_Gyr, 0.0)
        return self.SNIa_nu * (jnp.exp(-t1 * tau_inv)
                               - jnp.exp(-t2 * tau_inv))

    def ejecta(self, m_init, Z_star, elem_frac_star, t1, t2):
        """Per-star ejecta over ages [t1, t2] (internal time units).

        Returns (dm, dmZ, delem (…,9)) in internal mass units —
        the per-step output of compute_stellar_evolution
        (feedback.c:847).  ``elem_frac_star`` is (…, 9).
        """
        t1_G = t1 / self.Gyr
        t2_G = t2 / self.Gyr
        m_hi = self.dying_mass(t1_G, Z_star)
        m_lo = self.dying_mass(t2_G, Z_star)
        M_msun = m_init / self.Msun     # stellar mass in Msun

        if self.cum_ej_snii is not None:
            # real tables: per-Z-bin ejecta + metals on each channel's
            # own metallicity axis, compositions from the tables
            ej = self.window_z(self.cum_ej_snii, m_lo, m_hi, Z_star,
                               self.z_bins_snii) \
                + self.window_z(self.cum_ej_agb, m_lo, m_hi, Z_star,
                                self.z_bins_agb)
            Z_snii = self.window_z(self.cum_Z_snii, m_lo, m_hi, Z_star,
                                   self.z_bins_snii)
            Z_agb = self.window_z(self.cum_Z_agb, m_lo, m_hi, Z_star,
                                  self.z_bins_agb)
            snia_e = np.asarray(self.snia_vec, np.float64)
        else:
            ej = self.window(self.cum_ej, m_lo, m_hi)   # per Msun formed
            Z_snii = self.window_z(self.cum_Z_snii, m_lo, m_hi, Z_star)
            Z_agb = self.window_z(self.cum_Z_agb, m_lo, m_hi, Z_star)
            snia_e = _SNIA_EJECTA
        n_1a = self.num_SNIa(t1_G, t2_G)

        dm_msun = ej * M_msun + n_1a * M_msun * jnp.float32(
            max(snia_e.sum(), 1e-30))
        # metal mass per channel (Msun)
        mz_snii = Z_snii * M_msun
        mz_agb = Z_agb * M_msun
        mz_1a = n_1a * M_msun * jnp.float32(snia_e.sum())

        if self.comp_snii is not None:
            snii_v = self._comp_z(self.comp_snii, Z_star,
                                  self.z_bins_snii)
            agb_v = self._comp_z(self.comp_agb, Z_star, self.z_bins_agb)
        else:
            snii_v = jnp.asarray(_SNII_METALS, F32)
            # AGB composition lerps C -> N with log Z (Marigo secondary N)
            lz0, lz1 = np.log(_Z_BINS[0]), np.log(_Z_BINS[-1])
            zfrac = jnp.clip(
                (jnp.log(jnp.clip(Z_star, _Z_BINS[0], _Z_BINS[-1])) - lz0)
                / (lz1 - lz0), 0.0, 1.0)[..., None]
            agb_v = ((1.0 - zfrac) * jnp.asarray(_AGB_METALS_LO_Z, F32)
                     + zfrac * jnp.asarray(_AGB_METALS_HI_Z, F32))
        onea_v = jnp.asarray(snia_e / max(snia_e.sum(), 1e-30), F32)
        new_metals = (mz_snii[..., None] * snii_v
                      + mz_agb[..., None] * agb_v
                      + mz_1a[..., None] * onea_v)
        # the non-newly-synthesised ejecta carry the star's own
        # composition (yield tables add the initial abundances back)
        dm_old = jnp.maximum(dm_msun - mz_snii - mz_agb - mz_1a, 0.0)
        delem = new_metals + dm_old[..., None] * elem_frac_star
        dmZ = mz_snii + mz_agb + mz_1a + dm_old * Z_star
        return (dm_msun * self.Msun, dmZ * self.Msun,
                delem * self.Msun)


# ---------------------------------------------------------------------------
# Real yield-table reader (yield_tables.h:87 read_yield_tables)
# ---------------------------------------------------------------------------

def _imf_grid():
    """Shared log-mass grid + normalised IMF weight (per dlog10 m per
    Msun formed) — the same grid __post_init__ uses."""
    lg = np.linspace(np.log10(0.1), np.log10(100.0), 512)
    m = 10.0 ** lg
    xi = chabrier_imf(m)
    mass_int = np.trapezoid(m * xi * m * np.log(10.0), lg)
    xi = xi / mass_int
    return lg, m, xi * m * np.log(10.0)


def _cum(lg, w):
    return np.concatenate([[0.0], np.cumsum(
        0.5 * (w[1:] + w[:-1]) * np.diff(lg))])


def _read_channel(f):
    """One SNII/AGB file: (names, masses, Z bins, per-Z dict of
    (yield (el, m), ejected (m,), total_metals (m,)))."""
    names = [n.decode() if isinstance(n, bytes) else str(n)
             for n in f["Species_names"][:]]
    masses = np.asarray(f["Masses"][:], np.float64)
    zbins = np.asarray(f["Metallicities"][:], np.float64)
    ynames = [n.decode() if isinstance(n, bytes) else str(n)
              for n in f["Yield_names"][:]]
    per_z = []
    for yn in ynames:
        per_z.append((np.asarray(f[f"Yields/{yn}/Yield"][:], np.float64),
                      np.asarray(f[f"Yields/{yn}/Ejected_mass"][:],
                                 np.float64),
                      np.asarray(f[f"Yields/{yn}/Total_Metals"][:],
                                 np.float64)))
    return names, masses, zbins, per_z


def load_yield_tables(path: str, enr: "EagleEnrichment",
                      lifetime_unit_Gyr: float = 1.0
                      ) -> "EagleEnrichment":
    """Replace the synthesized yield forms with the reference's real
    table files (SNII.hdf5 / AGB.hdf5 / SNIa.hdf5 / Lifetimes.hdf5,
    feedback/EAGLE/yield_tables.h:87): per-Z-bin cumulative IMF
    integrals of ejected mass and total metals, per-Z-bin element
    compositions (tables' species matched onto the 9 chemistry
    carriers by name), the SNIa per-event composition, and the
    metallicity-binned lifetime table inverted into dying-mass curves.

    ``lifetime_unit_Gyr``: factor turning the Lifetimes values into Gyr
    (the shipped EAGLE tables store years -> pass 1e-9).
    Returns a NEW EagleEnrichment carrying the table fields.
    """
    import os

    import h5py

    from .chemistry import ELEMENT_NAMES

    lg, m_grid, dndlg = _imf_grid()

    def channel(fname, m_min, m_max):
        with h5py.File(os.path.join(path, fname)) as f:
            names, masses, zbins, per_z = _read_channel(f)
        win = (m_grid >= max(m_min, masses.min())) \
            & (m_grid <= min(m_max, masses.max()))
        cum_ej, cum_mz, comps = [], [], []
        for (yld, ejm, totz) in per_z:
            ej_g = np.interp(m_grid, masses, ejm) * win
            mz_g = np.interp(m_grid, masses, totz) * win
            cum_ej.append(tuple(_cum(lg, ej_g * dndlg)))
            cum_mz.append(tuple(_cum(lg, np.maximum(mz_g, 0.0) * dndlg)))
            # IMF-integrated per-element yields -> composition vector
            el = np.zeros(len(ELEMENT_NAMES))
            for si, sn in enumerate(names):
                if sn not in ELEMENT_NAMES:
                    continue
                y_g = np.interp(m_grid, masses, yld[si]) * win
                el[ELEMENT_NAMES.index(sn)] = _cum(lg, y_g * dndlg)[-1]
            tot = _cum(lg, np.maximum(mz_g, 0.0) * dndlg)[-1]
            # metals only (H/He return rides the ejecta term)
            el[:2] = 0.0
            el = np.maximum(el, 0.0)
            s = el.sum()
            comps.append(tuple(el / s if s > 0 else el))
        return tuple(zbins), tuple(cum_ej), tuple(cum_mz), tuple(comps)

    z_snii, ej_snii, mz_snii, comp_snii = channel(
        "SNII.hdf5", enr.SNII_min, enr.SNII_max)
    z_agb, ej_agb, mz_agb, comp_agb = channel("AGB.hdf5", 0.8,
                                              enr.SNII_min)

    with h5py.File(os.path.join(path, "SNIa.hdf5")) as f:
        names = [n.decode() if isinstance(n, bytes) else str(n)
                 for n in f["Species_names"][:]]
        yld = np.asarray(f["Yield"][:], np.float64)
        snia = np.zeros(len(ELEMENT_NAMES))
        for si, sn in enumerate(names):
            if sn in ELEMENT_NAMES:
                snia[ELEMENT_NAMES.index(sn)] += yld[si]

    with h5py.File(os.path.join(path, "Lifetimes.hdf5")) as f:
        lt_m = np.asarray(f["Masses"][:], np.float64)
        lt_z = np.asarray(f["Metallicities"][:], np.float64)
        lt = np.asarray(f["Lifetimes"][:], np.float64) \
            * lifetime_unit_Gyr                      # (nZ, nM), Gyr
    # invert each Z row: lifetimes decrease with mass -> m(log10 t)
    logt_grid = np.linspace(-3.5, 2.0, 256)          # 0.3 Myr .. 100 Gyr
    m_of_t = []
    for i in range(len(lt_z)):
        lt_i = np.log10(np.maximum(lt[i], 1e-12))
        order = np.argsort(lt_i)
        m_of_t.append(tuple(np.interp(
            logt_grid, lt_i[order], lt_m[order],
            left=lt_m[order][0], right=lt_m[order][-1])))

    import dataclasses
    new = dataclasses.replace(enr)
    for k, v in (("z_bins_snii", z_snii), ("z_bins_agb", z_agb),
                 ("cum_ej_snii", ej_snii), ("cum_ej_agb", ej_agb),
                 ("cum_Z_snii", mz_snii), ("cum_Z_agb", mz_agb),
                 ("comp_snii", comp_snii), ("comp_agb", comp_agb),
                 ("snia_vec", tuple(snia)),
                 ("life_z_bins", tuple(lt_z)),
                 ("life_logt_grid", tuple(logt_grid)),
                 ("life_m_of_t", tuple(m_of_t))):
        object.__setattr__(new, k, v)
    return new
