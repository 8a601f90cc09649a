"""Lightcone particle output — TPU-native core of the reference's
src/lightcone/ (7.2k LoC: lightcone.c lightcone_check_particle_crosses,
lightcone_crossing.c, buffered HDF5 output).

The reference checks, during every drift, whether each particle's
trajectory crosses the observer's past lightcone and buffers the crossing
state to per-shell HDF5 files.  The bulk-synchronous analog:

* The host tracks the lightcone's comoving radius r_lc(ti) =
  c * int_t^t_end dt/a (the conformal lookback distance — reused from the
  cosmology's grav-kick table, which is exactly int dt/a).
* After each step a jitted predicate flags particles whose comoving
  distance from the observer sits between the shrinking radii
  [r_lc(ti_new), r_lc(ti_old)) — with one step's motion << cell size the
  particle crossed the cone during this step.
* Flagged slots are gathered host-side into a growing buffer and flushed
  to a SWIFT-style lightcone HDF5 file.

Replications (lightcone_replications.c): the observer's past cone
extends through periodic images of the box; a host-side replication list
enumerates every image cube whose distance range can intersect the
current shell, and the crossing predicate runs per image with the
unwrapped offset — so an observer near the box edge catches crossings of
images on the far side.  Crossing positions and scale factors are
drift-interpolated to the crossing instant (a jitted secant solve of
|p(t) - obs| = r_lc(t), the lightcone_crossing.c interpolation).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional

import h5py
import jax
import jax.numpy as jnp
import numpy as np

from ..utils import timeline as tl

F32 = jnp.float32


@dataclass
class LightconeParams:
    """Lightcone0: YAML section analog (lightcone.c:1003 property read)."""

    observer_position: tuple = (0.0, 0.0, 0.0)
    radius_max: float = 1e30       # only record crossings inside this
    radius_min: float = 0.0
    basename: str = "lightcone"
    use_replications: bool = True  # periodic-image crossings
    # (lightcone_replications.c replication_list_init)
    # --- HEALPix shell maps (lightcone_map.c; nside=0 disables) -------
    nside: int = 0
    shell_edges: tuple = ()        # ascending comoving radii; empty ->
    # one shell [radius_min, min(radius_max, r_lc(0))]
    map_types: tuple = ("TotalMass",)


def comoving_distance(cosmology, ti: int) -> float:
    """c * int_{t(ti)}^{t_end} dt/a — the comoving radius of the past
    lightcone of an observer at the end of the timeline."""
    c = cosmology.phys_const.const_speed_light_c
    return c * cosmology.grav_kick_factor(ti, tl.MAX_NR_TIMESTEPS)


def _crossing_interp(off, v, mask, corners, obs, shift, dt_drift,
                     r_new, r_old, r_min, r_max):
    """Drift-interpolated cone crossings (lightcone_crossing.c).

    Reconstructs the pre-drift position p0 = p1 - v*dt_drift and finds
    the fraction t in [0, 1] where the particle's observer distance
    meets the shrinking cone radius r_lc(t) = r_old + t (r_new - r_old)
    — a secant solve of f(t) = r(t) - r_lc(t), exact for linear motion
    like the reference's interpolation along the drift.  Returns
    (crossed (C,K) bool, pos_cross (C,K,3), t (C,K)).  Using v_full at
    step end (post-kick) off-sets p0 by O(a dt^2) — the same order as
    the drift interpolation itself."""
    pos1 = corners[:, None, :] + off + jnp.asarray(shift, F32)
    pos0 = pos1 - v * dt_drift
    obs = jnp.asarray(obs, F32)
    r0 = jnp.sqrt(jnp.sum((pos0 - obs) ** 2, axis=-1))
    r1 = jnp.sqrt(jnp.sum((pos1 - obs) ** 2, axis=-1))
    f0 = r0 - r_old
    f1 = r1 - r_new
    crossed = (mask > 0) & (f0 <= 0) & (f1 > 0)
    t = jnp.clip(f0 / jnp.minimum(f0 - f1, -1e-30), 0.0, 1.0)
    pos_c = pos0 + t[..., None] * (pos1 - pos0)
    r_c = jnp.sqrt(jnp.sum((pos_c - obs) ** 2, axis=-1))
    crossed = crossed & (r_c >= r_min) & (r_c <= r_max)
    return crossed, pos_c, t


_JIT_CROSS = jax.jit(_crossing_interp)


def replication_list(box, obs, r_max):
    """All periodic-image shifts (n_i * L_i) whose image cube can lie
    within r_max of the observer, with each cube's (d_min, d_max) range —
    replication_list_init (lightcone_replications.c).  Returns a list of
    (shift (3,), d_min, d_max)."""
    box = np.asarray(box, np.float64)
    obs = np.asarray(obs, np.float64)
    nrep = np.maximum(np.ceil(r_max / box).astype(int), 0) + 1
    out = []
    for ix in range(-nrep[0], nrep[0] + 1):
        for iy in range(-nrep[1], nrep[1] + 1):
            for iz in range(-nrep[2], nrep[2] + 1):
                shift = np.array([ix, iy, iz]) * box
                lo = shift
                hi = shift + box
                dmin = np.linalg.norm(
                    np.maximum(np.maximum(lo - obs, obs - hi), 0.0))
                dmax = np.linalg.norm(
                    np.maximum(np.abs(obs - lo), np.abs(obs - hi)))
                if dmin <= r_max:
                    out.append((shift, dmin, dmax))
    return out


class LightconeWriter:
    """Buffers crossings and writes one SWIFT-style lightcone file."""

    FIELDS = ("Coordinates", "Velocities", "Masses", "ParticleIDs",
              "ScaleFactorCrossing")

    def __init__(self, params: LightconeParams, cosmology, grid):
        self.p = params
        self.cosmology = cosmology
        self.grid = grid
        self.corners = jnp.asarray(grid.cell_corners().reshape(
            grid.C, 1, 3)[:, 0, :], F32)
        self.buf: Dict[str, List[np.ndarray]] = {f: [] for f in self.FIELDS}
        self.n_total = 0
        # replication list for the whole run (lightcone_replications.c);
        # r_max capped at the cone radius at the run start
        r_cap = min(params.radius_max,
                    comoving_distance(cosmology, 0))
        if params.use_replications:
            self.replications = replication_list(
                grid.box, params.observer_position, r_cap)
        else:
            self.replications = [(np.zeros(3), 0.0, np.inf)]
        # HEALPix shell maps (lightcone_map.c) — crossings accumulate
        # into (shell, pixel) mass maps alongside the particle buffer
        self.shell_maps = None
        if params.nside > 0:
            from ..ops.healpix import ShellMaps
            edges = params.shell_edges or (params.radius_min, r_cap)
            self.shell_maps = ShellMaps(params.nside, edges,
                                        params.map_types)

    def radius_at(self, ti: int) -> float:
        return comoving_distance(self.cosmology, ti)

    def after_step(self, state: Dict, ti_old: int, ti_new: int):
        """Record every particle crossing the cone during [ti_old, ti_new].

        The analog of runner_do_drift's lightcone_check_particle_crosses
        call per drifted particle."""
        r_old = self.radius_at(ti_old)
        r_new = self.radius_at(ti_new)
        if r_old <= self.p.radius_min or r_new >= self.p.radius_max:
            return 0
        n_all = 0
        vkey = "v_full" if "v_full" in state else "v"
        a_old = self.cosmology.a_of_ti(ti_old)
        a_new = self.cosmology.a_of_ti(ti_new)
        dt_drift = self.cosmology.drift_factor(ti_old, ti_new)
        for shift, dmin, dmax in self.replications:
            # skip images whose whole cube misses the current shell
            if dmin > r_old or dmax < r_new:
                continue
            crossed, pos_c, t_c = _JIT_CROSS(
                state["off"], state[vkey], state["mask"], self.corners,
                np.asarray(self.p.observer_position, np.float32),
                np.asarray(shift, np.float32), np.float32(dt_drift),
                np.float32(r_new), np.float32(r_old),
                np.float32(self.p.radius_min),
                np.float32(self.p.radius_max))
            crossed = np.asarray(crossed)
            idx = np.nonzero(crossed.reshape(-1))
            n = len(idx[0])
            if n == 0:
                continue
            # lightcone coordinates are UNWRAPPED (observer-centred
            # image positions, not box-wrapped — lightcone.c convention),
            # drift-interpolated to the crossing instant
            pos = np.asarray(pos_c).reshape(-1, 3)[idx]
            t = np.asarray(t_c).reshape(-1)[idx]
            self.buf["Coordinates"].append(pos)
            self.buf["Velocities"].append(
                np.asarray(state[vkey]).reshape(-1, 3)[idx])
            self.buf["Masses"].append(
                np.asarray(state["m"]).reshape(-1)[idx])
            self.buf["ParticleIDs"].append(
                np.asarray(state["pid"]).reshape(-1)[idx])
            self.buf["ScaleFactorCrossing"].append(
                (a_old + t * (a_new - a_old)).astype(np.float32))
            if self.shell_maps is not None:
                rel = pos - np.asarray(self.p.observer_position)
                r = np.linalg.norm(rel, axis=1)
                self.shell_maps.accumulate(
                    rel, r, {"TotalMass": self.buf["Masses"][-1]})
            n_all += n
        self.n_total += n_all
        return n_all

    def flush(self, path: Optional[str] = None):
        path = path or f"{self.p.basename}_0000.hdf5"
        with h5py.File(path, "w") as f:
            h = f.create_group("Lightcone")
            h.attrs["ObserverPosition"] = np.asarray(
                self.p.observer_position, np.float64)
            h.attrs["NumParticles"] = self.n_total
            g = f.create_group("PartTypeAll")
            for name in self.FIELDS:
                if self.buf[name]:
                    g.create_dataset(name,
                                     data=np.concatenate(self.buf[name]))
                else:
                    g.create_dataset(name, shape=(0,), dtype=np.float32)
            if self.shell_maps is not None:
                self.shell_maps.write(f.create_group("ShellMaps"))
        return path
