"""Radiative transfer (two-moment M1 closure) subsystem.

TPU-native re-design of the reference's rt/GEAR (rt.h, rt_iact.h,
rt_riemann_GLF.h — Rosdahl+2013 moments with the M1 closure) as a
finite-volume photon transport riding the same padded-tile stencil loops
as the hydro.  The grackle-backed thermochemistry of the reference
(rt_thermochemistry.h) is replaced by an explicit hydrogen-only network
(photoionization / case-B recombination / collisional ionization),
matching the regime of the reference's own Iliev-test examples.
"""

from .m1 import glf_flux, hyperbolic_flux, pressure_tensor  # noqa: F401
from .gear import (RTParams, rt_init_state, rt_subcycles,  # noqa: F401
                   rt_transport_loop, rt_inject, rt_thermochemistry,
                   stromgren_radius, rt_inject_from_stars,
                   rt_params_from_yaml, pick_n_subcycles,
                   make_rt_fn, make_rt_multi_fn)
from .helium import (HeliumNetwork, he_init_state,  # noqa: F401
                     he_thermochemistry)
