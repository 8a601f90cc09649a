"""MHD hook surface — the reference's ``mhd/None`` scheme.

Reference ``src/mhd/None/mhd.h`` (the ONLY MHD scheme shipped in the
v0.9 reference, 679 LoC of hooks): every lifecycle hook is a no-op and
every diagnostic returns zero.  The hooks exist so the hydro runners,
drift/kick (drift.h:205, kick.h:277), statistics (statistics.c:248-255)
and timestep code can call them unconditionally; a real MHD scheme
plugs into the same surface.

Here the surface is a module of pure functions on the (C, K) tile state
dict.  Under ``jit`` the identity hooks fold out of the compiled step at
trace time — the XLA analog of the C compiler inlining the reference's
empty ``static inline`` bodies, so the "none" scheme costs literally
nothing on the TPU.

A future in-kind scheme (e.g. direct-induction SPH-MHD) would carry
``B`` / ``divB`` fields in the state, add DENSITY/GRADIENT/FORCE extra
term keys through the loop backends (the same mechanism the
PressureEnergy family uses for ``u`` in the density loop), and replace
these hooks; the registry below is the dispatch point.
"""

from __future__ import annotations

import sys

import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Diagnostics (statistics.c:248-255 reads these per particle; here they
# are whole-tile reductions).


def magnetic_energy(s) -> jnp.ndarray:
    """Total magnetic energy (mhd.h:28 mhd_get_magnetic_energy) — zero."""
    return jnp.float32(0.0)


def magnetic_helicity(s) -> jnp.ndarray:
    """Total magnetic helicity (mhd.h:40) — zero."""
    return jnp.float32(0.0)


def cross_helicity(s) -> jnp.ndarray:
    """Total cross helicity (mhd.h:52) — zero."""
    return jnp.float32(0.0)


def divB_error(s) -> jnp.ndarray:
    """Summed dimensionless div(B) error (mhd.h:66) — zero."""
    return jnp.float32(0.0)


# ---------------------------------------------------------------------------
# Timestep / signal velocity (mhd.h:83,100).


def compute_timestep(p, s, cosmo) -> jnp.ndarray:
    """No MHD timestep constraint (mhd.h:83 returns FLT_MAX)."""
    return jnp.full_like(s["h"], 1e30)


def signal_velocity(dx, r2, v_sig_hydro):
    """Magnetosonic signal speed; without B it IS the hydro one
    (mhd.h:100 returns the plain hydro signal velocity)."""
    return v_sig_hydro


# ---------------------------------------------------------------------------
# Lifecycle hooks — identities on the state dict, called from the same
# points the reference calls them (runner_ghost.c:1029-1264, drift.h:205,
# kick.h:277).  Listed in lifecycle order.


def first_init_part(p, s):
    """mhd.h:314 mhd_first_init_part."""
    return s


def init_part(p, s):
    """mhd.h:117 mhd_init_part (start of density loop)."""
    return s


def end_density(p, s, cosmo):
    """mhd.h:133 mhd_end_density."""
    return s


def prepare_gradient(p, s, cosmo):
    """mhd.h:146 mhd_prepare_gradient."""
    return s


def reset_gradient(s):
    """mhd.h:159 mhd_reset_gradient."""
    return s


def end_gradient(s):
    """mhd.h:169 mhd_end_gradient."""
    return s


def no_neighbours_fallback(p, s):
    """mhd.h:183 mhd_part_has_no_neighbours."""
    return s


def prepare_force(p, s, cosmo, dt_alpha):
    """mhd.h:203 mhd_prepare_force."""
    return s


def reset_acceleration(s):
    """mhd.h:215 mhd_reset_acceleration."""
    return s


def reset_predicted_values(p, s):
    """mhd.h:226 mhd_reset_predicted_values."""
    return s


def predict_extra(p, s, cosmo, dt_drift, dt_therm):
    """mhd.h:243 mhd_predict_extra (called from drift.h:205)."""
    return s


def end_force(p, s):
    """mhd.h:261 mhd_end_force."""
    return s


def kick_extra(p, s, cosmo, dt_therm):
    """mhd.h:280 mhd_kick_extra (called from kick.h:277)."""
    return s


def convert_quantities(p, s, cosmo):
    """mhd.h:300 mhd_convert_quantities (after IC read)."""
    return s


_THIS_MODULE = sys.modules[__name__]

# name -> hook module (configure.ac --with-mhd analog; the reference
# ships only 'none')
MHD_SCHEMES = {"none": _THIS_MODULE}
