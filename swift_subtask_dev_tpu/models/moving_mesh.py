"""Shadowswift moving-mesh hydrodynamics (1D Voronoi).

Reference src/hydro/Shadowswift/ — the reference's experimental moving-
mesh scheme (``--with-hydro=shadowfax``, configure.ac): a Voronoi
tessellation of the particle generators carries finite-volume conserved
quantities; faces exchange Riemann fluxes; the mesh moves with the fluid
so the scheme is exactly Galilean invariant and has no advection errors.
The reference builds its cells incrementally per dimension
(voronoi1d_algorithm.h / voronoi2d / voronoi3d) and its own tests
exercise the 1D/2D algorithms; this is the 1D algorithm
(voronoi1d_cell.h: a cell is the interval between the midpoints to the
nearest left/right generators), made TPU-shaped:

* the tessellation is ONE ``jnp.sort`` along x (static shapes, no
  incremental cell clipping) — in 1D the Voronoi diagram IS the sorted
  midpoint structure, so this is exact, not approximate;
* faces are evaluated vectorised with the shared exact Riemann solver
  (models/riemann.py exact_flux == riemann_exact.h), interface velocity
  = the mean of the two generator velocities (in 1D the face sits at
  the midpoint, so the Springel residual-rotation correction is zero);
* conserved update + generator drift run as pure array ops, jittable
  end-to-end (one fused XLA program per step).

Scope: the reference scheme is experimental and is validated on 1D/2D
shock problems (examples/HydroTests with --with-hydro-dimension=1); the
3D production path in the reference is Gizmo MFV/MFM, implemented here
in models/sph/gizmo*.py on the padded-tile engines.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from .riemann import exact_flux

F32 = jnp.float32


@dataclass(frozen=True)
class ShadowswiftParams:
    """hydro_parameters.h surface for the moving-mesh scheme."""

    gamma: float = 5.0 / 3.0
    CFL: float = 0.2
    box: float = 1.0
    # generator steering: fraction of the centroid offset added to the
    # mesh velocity to keep cells regular (hydro_velocities.h:118
    # "steering" of the generator towards the centroid)
    steer: float = 1.0


def voronoi1d(x: jnp.ndarray, box: float):
    """Exact 1D periodic Voronoi tessellation (voronoi1d_algorithm.h).

    Returns (order, volume, centroid, x_sorted):
      order: argsort of x; the k-th face sits between sorted generators
      k and k+1 (periodic);
      volume[k], centroid[k]: cell measure and centroid of sorted
      generator k (voronoi1d_cell.h:100 finalize computes
      V = 0.5 (x_R - x_L), centroid relative to the generator).
    """
    order = jnp.argsort(x)
    xs = x[order]
    x_next = jnp.roll(xs, -1)
    gap_r = jnp.mod(x_next - xs, box)       # distance to right neighbour
    gap_l = jnp.roll(gap_r, 1)              # distance to left neighbour
    volume = 0.5 * (gap_l + gap_r)
    centroid = xs + 0.25 * (gap_r - gap_l)  # midpoint of the interval
    return order, volume, centroid, xs


def primitives(p: ShadowswiftParams, Q: Dict[str, jnp.ndarray],
               volume: jnp.ndarray):
    """Conserved -> primitive (hydro.h hydro_convert_quantities):
    rho = m/V, v = p/m, P = (gamma-1) (E - p^2/2m) / V."""
    m = jnp.maximum(Q["m"], 1e-30)
    rho = Q["m"] / volume
    v = Q["p"] / m
    e_kin = 0.5 * Q["p"] * Q["p"] / m
    P = (p.gamma - 1.0) * jnp.maximum(Q["E"] - e_kin, 0.0) / volume
    return rho, v, P


def mesh_velocities(p: ShadowswiftParams, v_fluid, xs, centroid, volume,
                    cs, dt):
    """Generator velocity = fluid velocity + bounded steering toward the
    cell centroid (hydro_velocities.h: keeps the mesh regular without
    breaking Galilean invariance — the steering is O(cell size/dt) and
    vanishes for already-centroidal cells)."""
    if p.steer <= 0.0 or dt is None:
        return v_fluid
    d = centroid - xs
    # cap the steering speed at the local sound speed (Springel 2010
    # eq. 63 uses a similar switch)
    v_steer = jnp.clip(p.steer * d / jnp.maximum(dt, 1e-30), -cs, cs)
    return v_fluid + v_steer


@partial(jax.jit, static_argnums=(0,))
def mm_step(p: ShadowswiftParams, x: jnp.ndarray,
            Q: Dict[str, jnp.ndarray], dt: jnp.ndarray):
    """One moving-mesh step: tessellate -> primitives -> face fluxes ->
    conserved update -> drift generators (runner flux-exchange order;
    hydro_iact.h runner_iact_fluxes_common in 1D)."""
    box = p.box
    order, volume, centroid, xs = voronoi1d(x, box)
    Qs = {k: Q[k][order] for k in ("m", "p", "E")}
    rho, v, P = primitives(p, Qs, volume)
    cs = jnp.sqrt(p.gamma * P / jnp.maximum(rho, 1e-30))

    w = mesh_velocities(p, v, xs, centroid, volume, cs, dt)

    # face k between sorted k (left) and k+1 (right); normal = +x.
    # The solver contract (models/riemann.py, the Gizmo convention,
    # gizmo.py:486): states are boosted into the interface frame
    # (v - w_face) and vij only de-boosts the returned fluxes.
    zeros = jnp.zeros_like(rho)
    w_face = 0.5 * (w + jnp.roll(w, -1))
    WL = (rho, v - w_face, zeros, zeros, P)
    WR = (jnp.roll(rho, -1), jnp.roll(v, -1) - w_face, zeros, zeros,
          jnp.roll(P, -1))
    n = (jnp.ones_like(rho), zeros, zeros)
    vij = (w_face, zeros, zeros)
    Fm, Fpx, _, _, FE = exact_flux(WL, WR, n, vij, p.gamma)

    # dQ_k = (F_{left face} - F_{right face}) dt; left face of k is k-1
    dm = (jnp.roll(Fm, 1) - Fm) * dt
    dp = (jnp.roll(Fpx, 1) - Fpx) * dt
    dE = (jnp.roll(FE, 1) - FE) * dt
    Qs = {"m": Qs["m"] + dm, "p": Qs["p"] + dp, "E": Qs["E"] + dE}

    # drift the generators with the mesh
    xs_new = jnp.mod(xs + w * dt, box)

    # scatter back to original particle order
    inv = jnp.argsort(order)
    x_new = xs_new[inv]
    Q_new = {k: Qs[k][inv] for k in Qs}
    return x_new, Q_new


@partial(jax.jit, static_argnums=(0,))
def mm_timestep(p: ShadowswiftParams, x: jnp.ndarray,
                Q: Dict[str, jnp.ndarray]):
    """CFL limit: dt = CFL * R / (cs + |v - w|); with the mesh moving at
    the fluid speed the advection term drops and R = V/2 in 1D
    (hydro.h hydro_compute_timestep)."""
    order, volume, centroid, xs = voronoi1d(x, p.box)
    Qs = {k: Q[k][order] for k in ("m", "p", "E")}
    rho, v, P = primitives(p, Qs, volume)
    cs = jnp.sqrt(p.gamma * P / jnp.maximum(rho, 1e-30))
    return jnp.min(p.CFL * 0.5 * volume / jnp.maximum(cs, 1e-30))


def mm_init(p: ShadowswiftParams, x, rho, v, P):
    """Primitive ICs -> per-cell conserved state (hydro_first_init_part):
    the generator masses come from the initial tessellation volumes."""
    x = jnp.asarray(x, F32)
    order, volume, centroid, xs = voronoi1d(x, p.box)
    inv = jnp.argsort(order)
    V = volume[inv]
    rho = jnp.asarray(rho, F32)
    v = jnp.asarray(v, F32)
    P = jnp.asarray(P, F32)
    m = rho * V
    Q = {"m": m, "p": m * v,
         "E": P * V / (p.gamma - 1.0) + 0.5 * m * v * v}
    return x, Q


def mm_run(p: ShadowswiftParams, x, Q, t_end: float,
           dt_max: float = 1e30):
    """Host driver: adaptive global steps to t_end."""
    t = 0.0
    while t < t_end:
        dt = float(mm_timestep(p, x, Q))
        dt = min(dt, dt_max, t_end - t)
        x, Q = mm_step(p, x, Q, jnp.float32(dt))
        t += dt
    return x, Q
