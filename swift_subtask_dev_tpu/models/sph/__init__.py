"""SPH schemes — the reference's compile-time hydro selection
(hydro.h:32-80, configure.ac:1954) resolved at run time via a registry of
parameter-dataclass constructors.  Each scheme module exports a *Params
dataclass whose ``mod`` property exposes the scheme's term functions
(density/gradient/force + lifecycle hooks) consumed by the loop backends.

The 14th scheme, Shadowswift (``--with-hydro=shadowfax``; the
reference's experimental moving-mesh), does not fit the SPH term-
function protocol — it lives in ``models/moving_mesh.py`` as the exact
1D Voronoi algorithm (voronoi1d_algorithm.h) with its own jitted
step/timestep drivers, validated on the reference's own 1D test regime.
"""

from . import kernels, eos, sphenix


def _sphenix(**kw):
    return sphenix.SPHENIXParams(**kw)


def _minimal(**kw):
    from .minimal import MinimalParams
    return MinimalParams(**kw)


def _gadget2(**kw):
    from .gadget2 import Gadget2Params
    return Gadget2Params(**kw)


def _pressure_energy(**kw):
    from .pressure_energy import PressureEnergyParams
    return PressureEnergyParams(**kw)


def _anarchy_pu(**kw):
    from .anarchy_pu import AnarchyPUParams
    return AnarchyPUParams(**kw)


def _pressure_entropy(**kw):
    from .pressure_entropy import PressureEntropyParams
    return PressureEntropyParams(**kw)


def _pressure_energy_mm(**kw):
    from .pressure_energy_mm import PressureEnergyMMParams
    return PressureEnergyMMParams(**kw)


def _phantom(**kw):
    from .phantom import PhantomParams
    return PhantomParams(**kw)


def _gasoline(**kw):
    from .gasoline import GasolineParams
    return GasolineParams(**kw)


def _none_scheme(**kw):
    from .none import NoneParams
    return NoneParams(**kw)


def _planetary(**kw):
    from .planetary import PlanetaryParams
    return PlanetaryParams(**kw)


def _gizmo_mfm(**kw):
    from .gizmo import GizmoMFMParams
    return GizmoMFMParams(**kw)


def _gizmo_mfv(**kw):
    from .gizmo_mfv import GizmoMFVParams
    return GizmoMFVParams(**kw)


# name -> constructor taking the common SPH: section kwargs
SCHEMES = {
    "sphenix": _sphenix,
    "minimal": _minimal,
    "gadget2": _gadget2,
    "pressure-energy": _pressure_energy,
    "pressure-energy-monaghan": _pressure_energy_mm,
    "pressure-entropy": _pressure_entropy,
    "anarchy-pu": _anarchy_pu,
    "phantom": _phantom,
    "gasoline": _gasoline,
    "none": _none_scheme,
    "gizmo-mfm": _gizmo_mfm,
    "gizmo-mfv": _gizmo_mfv,
    "planetary": _planetary,
}
