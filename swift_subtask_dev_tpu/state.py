"""Particle state pytrees — the TPU-native analog of SWIFT's part arrays.

Design
------
The reference stores particles as AoS structs sorted cell-contiguously
(src/space.c, cell.h:354).  Here the canonical layout is **padded SoA cell
tiles**: every field is an array of shape ``(C, K)`` (scalars) or
``(C, K, 3)`` (vectors) where ``C = ncx*ncy*ncz`` top-grid cells and ``K`` is
the fixed per-cell slot capacity.  Empty slots carry ``mask = 0``.

Positions are **cell-local f32 offsets** from the owning cell's corner.  All
pairwise distances are formed as ``off_i - off_j - shift*edge`` with the
integer stencil shift — exact periodic arithmetic with uniform absolute
precision, no f64 anywhere on device (the reference needs f64 absolute
positions, swift.c / part.h; we don't).

Global positions only materialize at I/O time (f64 on host).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

F32 = jnp.float32
I32 = jnp.int32


@struct.dataclass
class GasState:
    """SPH gas particles (SPHENIX fields; reference hydro_part.h:99-259)."""

    # identity / bucketing
    mask: jnp.ndarray        # (C, K) f32, 1.0 = real particle
    pid: jnp.ndarray         # (C, K) i32 particle IDs (-1 = empty)
    off: jnp.ndarray         # (C, K, 3) f32 offset from cell corner

    # dynamics
    v: jnp.ndarray           # (C, K, 3) predicted (drifted) velocity
    v_full: jnp.ndarray      # (C, K, 3) kicked velocity (xpart.v_full)
    m: jnp.ndarray           # (C, K) mass
    h: jnp.ndarray           # (C, K) smoothing length
    u: jnp.ndarray           # (C, K) predicted internal energy
    u_full: jnp.ndarray      # (C, K) kicked internal energy
    u_dt: jnp.ndarray        # (C, K) du/dt
    rho: jnp.ndarray         # (C, K) density

    # density-loop accumulators
    wcount: jnp.ndarray      # (C, K)
    wcount_dh: jnp.ndarray   # (C, K)
    rho_dh: jnp.ndarray      # (C, K)
    div_v: jnp.ndarray       # (C, K)
    rot_v: jnp.ndarray       # (C, K, 3)

    # viscosity / diffusion (SPHENIX)
    alpha_visc: jnp.ndarray  # (C, K)
    v_sig: jnp.ndarray       # (C, K)
    div_v_prev: jnp.ndarray  # (C, K) div_v_previous_step
    alpha_diff: jnp.ndarray  # (C, K)
    laplace_u: jnp.ndarray   # (C, K)

    # force-loop prepared quantities
    f_gradh: jnp.ndarray     # (C, K) force.f
    pressure: jnp.ndarray    # (C, K)
    soundspeed: jnp.ndarray  # (C, K)
    balsara: jnp.ndarray     # (C, K)
    alpha_visc_max_ngb: jnp.ndarray  # (C, K)

    # force-loop outputs
    a_hydro: jnp.ndarray     # (C, K, 3)
    h_dt: jnp.ndarray        # (C, K)

    # gravity coupling
    a_grav: jnp.ndarray      # (C, K, 3)
    a_grav_mesh: jnp.ndarray  # (C, K, 3)

    # time integration
    time_bin: jnp.ndarray    # (C, K) i32
    min_ngb_time_bin: jnp.ndarray  # (C, K) i32 (timestep limiter)

    @property
    def C(self) -> int:
        return self.mask.shape[0]

    @property
    def K(self) -> int:
        return self.mask.shape[1]

    @classmethod
    def zeros(cls, C: int, K: int) -> "GasState":
        s = lambda: jnp.zeros((C, K), F32)
        v3 = lambda: jnp.zeros((C, K, 3), F32)
        i = lambda fill=0: jnp.full((C, K), fill, I32)
        return cls(
            mask=s(), pid=i(-1), off=v3(), v=v3(), v_full=v3(), m=s(),
            h=s(), u=s(), u_full=s(), u_dt=s(), rho=s(), wcount=s(),
            wcount_dh=s(), rho_dh=s(), div_v=s(), rot_v=v3(),
            alpha_visc=s(), v_sig=s(), div_v_prev=s(), alpha_diff=s(),
            laplace_u=s(), f_gradh=s(), pressure=s(), soundspeed=s(),
            balsara=s(), alpha_visc_max_ngb=s(), a_hydro=v3(), h_dt=s(),
            a_grav=v3(), a_grav_mesh=v3(), time_bin=i(0),
            min_ngb_time_bin=i(999),
        )


@struct.dataclass
class DarkMatterState:
    """Collisionless particles (reference gravity_part.h:26)."""

    mask: jnp.ndarray        # (C, K) f32
    pid: jnp.ndarray         # (C, K) i32
    off: jnp.ndarray         # (C, K, 3)
    v_full: jnp.ndarray      # (C, K, 3)
    m: jnp.ndarray           # (C, K)
    a_grav: jnp.ndarray      # (C, K, 3)
    a_grav_mesh: jnp.ndarray  # (C, K, 3)
    old_a_grav_norm: jnp.ndarray  # (C, K) adaptive-MAC input
    time_bin: jnp.ndarray    # (C, K) i32

    @property
    def C(self) -> int:
        return self.mask.shape[0]

    @property
    def K(self) -> int:
        return self.mask.shape[1]

    @classmethod
    def zeros(cls, C: int, K: int) -> "DarkMatterState":
        s = lambda: jnp.zeros((C, K), F32)
        v3 = lambda: jnp.zeros((C, K, 3), F32)
        return cls(
            mask=s(), pid=jnp.full((C, K), -1, I32), off=v3(), v_full=v3(),
            m=s(), a_grav=v3(), a_grav_mesh=v3(), old_a_grav_norm=s(),
            time_bin=jnp.zeros((C, K), I32),
        )


def count_particles(mask: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(mask).astype(I32)
