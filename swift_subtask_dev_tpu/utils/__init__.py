from .params import Params, ParamError
from .units import UnitSystem, COSMO_UNITS
from .constants import PhysicalConstants
from . import timeline
from . import prng

__all__ = [
    "Params", "ParamError", "UnitSystem", "COSMO_UNITS",
    "PhysicalConstants", "timeline", "prng",
]
