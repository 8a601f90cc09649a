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

import jax.numpy as jnp
import numpy as np

from .chemistry import N_ELEMENTS

F32 = jnp.float32

# element order: H, He, C, N, O, Ne, Mg, Si, Fe (chemistry.py)
_SNII_METALS = np.array([0.0, 0.0, 0.01, 0.005, 0.5,
                         0.15, 0.1, 0.15, 0.085])   # fractions of Z yield
_AGB_METALS = np.array([0.0, 0.0, 0.7, 0.25, 0.05,
                        0.0, 0.0, 0.0, 0.0])
_SNIA_EJECTA = np.array([0.0, 0.0, 0.002, 1e-5, 0.14,
                         0.005, 0.01, 0.15, 0.74]) * 1.4 / 1.047
# (normalised so one event ejects 1.4 Msun of metals)


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
        object.__setattr__(self, "cum_Z_snii", tuple(
            cum(0.10 * m * dndlg * snii_w)))
        object.__setattr__(self, "cum_Z_agb", tuple(
            cum(0.01 * m * dndlg * agb_w)))

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
    def dying_mass(self, age_Gyr):
        """m(t): inverse of t(m) = 10 m^-2.5 Gyr (imf.h dying_mass)."""
        t = jnp.maximum(age_Gyr, 1e-6)
        return jnp.clip((t / 10.0) ** (-1.0 / 2.5), 0.1, 100.0)

    def _interp(self, table, m):
        lg = jnp.asarray(self.log_m_grid)
        return jnp.interp(jnp.log10(m), lg, jnp.asarray(table))

    def window(self, table, m_lo, m_hi):
        return jnp.maximum(self._interp(table, m_hi)
                           - self._interp(table, m_lo), 0.0)

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
        m_hi = self.dying_mass(t1_G)
        m_lo = self.dying_mass(t2_G)
        M_msun = m_init / self.Msun     # stellar mass in Msun

        ej = self.window(self.cum_ej, m_lo, m_hi)       # per Msun formed
        Z_snii = self.window(self.cum_Z_snii, m_lo, m_hi)
        Z_agb = self.window(self.cum_Z_agb, m_lo, m_hi)
        n_1a = self.num_SNIa(t1_G, t2_G)

        dm_msun = ej * M_msun + n_1a * M_msun * 1.4
        # metal mass per channel (Msun)
        mz_snii = Z_snii * M_msun
        mz_agb = Z_agb * M_msun
        mz_1a = n_1a * M_msun * jnp.float32(_SNIA_EJECTA.sum())

        snii_v = jnp.asarray(_SNII_METALS, F32)
        agb_v = jnp.asarray(_AGB_METALS, F32)
        onea_v = jnp.asarray(_SNIA_EJECTA / max(_SNIA_EJECTA.sum(),
                                                1e-30), F32)
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
