"""EAGLE chemistry — 9-element mass-fraction carriers.

Reference: src/chemistry/EAGLE/chemistry.h (chemistry_part_data:
metal_mass_fraction[9] + metal_mass_fraction_total): per-particle element
mass fractions (H, He, C, N, O, Ne, Mg, Si, Fe) initialised from the
EAGLEChemistry YAML section (init_abundance_*) or read from the ICs,
carried through star formation (stars inherit their gas particle's
abundances) and consumed by the cooling tables (metallicity scaling) and
the Z-dependent star-formation threshold.

The reference additionally SMOOTHES the fractions over the kernel
(chemistry_iact.h); here the particle (unsmoothed) fractions are used —
the reference's `EAGLEChemistry:init_abundance_*` semantics are
preserved and the smoothed variant can ride the density-extras protocol
later.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional

import numpy as np

ELEMENT_NAMES = ("Hydrogen", "Helium", "Carbon", "Nitrogen", "Oxygen",
                 "Neon", "Magnesium", "Silicon", "Iron")
N_ELEMENTS = len(ELEMENT_NAMES)


@dataclass(frozen=True)
class EagleChemistry:
    """Initial abundances (chemistry_init_backend, EAGLE/chemistry.h)."""

    init_fractions: tuple = (0.752, 0.248, 0.0, 0.0, 0.0,
                             0.0, 0.0, 0.0, 0.0)
    init_metallicity: float = 0.0

    @staticmethod
    def from_params(params) -> "EagleChemistry":
        sec = "EAGLEChemistry"
        fr = [params.opt_float(sec, f"init_abundance_{n}", d)
              for n, d in zip(ELEMENT_NAMES,
                              (0.752, 0.248, 0.0, 0.0, 0.0,
                               0.0, 0.0, 0.0, 0.0))]
        Z = params.opt_float(sec, "init_abundance_metal",
                             max(0.0, 1.0 - fr[0] - fr[1]))
        return EagleChemistry(init_fractions=tuple(fr),
                              init_metallicity=Z)

    def particle_arrays(self, n: int, ic_fields: Optional[Dict] = None):
        """(Z (n,), elem_frac (n, 9)) — from the ICs when present
        (SWIFT snapshot datasets Metallicities / ElementMassFractions),
        else the YAML initial abundances."""
        if ic_fields is not None and "ElementMassFractions" in ic_fields:
            ef = np.asarray(ic_fields["ElementMassFractions"],
                            np.float32)[:, :N_ELEMENTS]
        else:
            ef = np.tile(np.asarray(self.init_fractions, np.float32),
                         (n, 1))
        if ic_fields is not None and "Metallicities" in ic_fields:
            Z = np.asarray(ic_fields["Metallicities"], np.float32)
        else:
            Z = np.full(n, self.init_metallicity, np.float32)
        return Z, ef


# solar number-weighted MASS-fraction ratios of the 7 tracked metals
# (C, N, O, Ne, Mg, Si, Fe), Asplund et al. (2009) — used to split a
# total metallicity into element carriers when only Z is configured
# (the role of GEARChemistry:scale_initial_metallicity's solar table,
# chemistry/GEAR/chemistry.h:240-270)
_SOLAR_METAL_SPLIT = np.asarray(
    [0.178, 0.052, 0.430, 0.094, 0.053, 0.050, 0.097], np.float32)
_SOLAR_METAL_SPLIT = _SOLAR_METAL_SPLIT / _SOLAR_METAL_SPLIT.sum()


@dataclass(frozen=True)
class GearChemistry:
    """GEAR chemistry (chemistry/GEAR/chemistry.h).

    The GEAR model carries per-element metal MASSES (metal_mass[i] =
    m * fraction, chemistry_first_init_part :407-411) whose smoothed
    fractions are kernel sums finished with 1/(h^3 rho)
    (chemistry_end_density :310-332) — mathematically identical to the
    mass-fraction carriers + chemistry_smooth_loop used here, so GEAR
    rides the same elem_frac arrays.  ``initial_metallicity`` < 0 means
    "read the ICs" (:249); otherwise every particle starts at that
    total metallicity, split among the tracked metals in solar ratios
    (the scale_initial_metallicity path :261).
    """

    initial_metallicity: float = 0.0

    @staticmethod
    def from_params(params) -> "GearChemistry":
        return GearChemistry(initial_metallicity=params.opt_float(
            "GEARChemistry", "initial_metallicity", 0.0))

    def particle_arrays(self, n: int, ic_fields: Optional[Dict] = None):
        """(Z (n,), elem_frac (n, 9)) like EagleChemistry."""
        if self.initial_metallicity < 0 and ic_fields is not None:
            # GEAR ICs: MetalMassFractions (n, k), last column = total
            if "MetalMassFractions" in ic_fields:
                mf = np.asarray(ic_fields["MetalMassFractions"],
                                np.float32)
                Z = mf[:, -1] if mf.ndim == 2 else mf
            elif "Metallicities" in ic_fields:
                Z = np.asarray(ic_fields["Metallicities"], np.float32)
            else:
                Z = np.zeros(n, np.float32)
        else:
            Z = np.full(n, max(self.initial_metallicity, 0.0), np.float32)
        metals = Z[:, None] * _SOLAR_METAL_SPLIT[None, :]
        X_H = 0.752 * (1.0 - Z)
        X_He = 0.248 * (1.0 - Z)
        ef = np.concatenate([X_H[:, None], X_He[:, None], metals],
                            axis=1).astype(np.float32)
        return Z, ef
