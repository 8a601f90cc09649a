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
