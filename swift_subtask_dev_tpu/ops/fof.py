"""Friends-of-friends group finder — the reference's fof.c, TPU-native.

The reference uses union-find with path compression, atomic locks and an
MPI fragment merge (fof_search_tree fof.c:2812).  The TPU equivalent is
**iterative minimum-label propagation over the cell stencil**: every
particle starts with a unique label; each sweep takes the minimum label
over all neighbours within the linking length; a `lax.while_loop` runs
sweeps until no label changes.  Convergence needs O(group diameter in
linking lengths) sweeps — with a label hop per sweep this is fine for
halo-like groups, and every sweep is a dense masked stencil pass.

Labels are int32 linear slot ids; groups are renumbered by size at the
end (host side).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..grid.cellgrid import CellGrid
from .stencil import (_apply_offsets, _bi, _bj, _grid_view,
                      _flat_view)

I32 = jnp.int32
BIG = np.int32(2 ** 31 - 1)


def fof_sweep(grid: CellGrid, mask, off, labels, ell2,
              use_scan: bool = True):
    """One min-label propagation sweep (all 27 offsets)."""
    maskg = _grid_view(grid, mask)
    offg = _grid_view(grid, off)
    lab = _grid_view(grid, labels)

    def accumulate(best, jf, shift):
        dx = tuple(_bi(offg[..., k]) - _bj(jf["off"][..., k]) - shift[k]
                   for k in range(3))
        r2 = dx[0] ** 2 + dx[1] ** 2 + dx[2] ** 2
        ok = (_bj(jf["mask"]) > 0) & (r2 < ell2)
        cand = jnp.where(ok, _bj(jf["lab"]), BIG)
        return jnp.minimum(best, jnp.min(cand, axis=-1))

    best = _apply_offsets(grid, {"off": offg, "mask": maskg, "lab": lab},
                          lab, accumulate, use_scan)
    best = jnp.where(maskg > 0, best, BIG)
    return _flat_view(grid, best)


def fof_labels(grid: CellGrid, mask: jnp.ndarray, off: jnp.ndarray,
               linking_length: float, max_sweeps: int = 10 ** 6):
    """(C, K) i32 group labels (BIG for empty slots) + sweep count.

    linking_length must be <= the grid cell edge (stencil coverage) —
    the analog of the reference requiring l < cell width.
    """
    if linking_length > min(grid.edge) * (1 + 1e-6):
        raise ValueError("linking length exceeds cell edge: refine ell or "
                         "coarsen the grid")
    C, K = grid.C, grid.K
    ell2 = jnp.float32(linking_length ** 2)
    lin = jnp.arange(C * K, dtype=I32).reshape(C, K)
    labels0 = jnp.where(mask > 0, lin, BIG)

    def cond(c):
        labels, prev_changed, it = c
        return prev_changed & (it < max_sweeps)

    def body(c):
        labels, _, it = c
        new = fof_sweep(grid, mask, off, labels, ell2)
        changed = jnp.any(new != labels)
        return (new, changed, it + 1)

    labels, _, n = jax.lax.while_loop(
        cond, body, (labels0, jnp.bool_(True), jnp.int32(0)))
    return labels, n


def group_catalogue(labels: np.ndarray, mask: np.ndarray,
                    min_size: int = 20,
                    m: np.ndarray = None, pos: np.ndarray = None,
                    v: np.ndarray = None, box=None,
                    seed_halo_mass: float = 0.0) -> Dict[str, np.ndarray]:
    """Host-side: renumber labels by group size, build the catalogue.

    Returns dict with group_id per slot (-1 below min_size / empty),
    group_sizes (descending) and — when m/pos[/v] are given — per-group
    masses, periodic-aware centres of mass and mean velocities, the
    analog of fof.c's group props + fof_catalogue_io.c.  With
    ``seed_halo_mass`` > 0 also returns the groups eligible for black
    hole seeding (fof.c: groups above FOF:black_hole_seed_halo_mass that
    the BH model turns into new particles at the densest gas location).
    """
    flat = labels.reshape(-1)
    valid = mask.reshape(-1) > 0
    ids, inverse, counts = np.unique(flat[valid], return_inverse=True,
                                     return_counts=True)
    order = np.argsort(-counts, kind="stable")
    rank_of = np.full(len(ids), -1, np.int64)
    keep = counts >= min_size
    n_groups = int(keep.sum())
    rank = 0
    for gi in order:
        if keep[gi]:
            rank_of[gi] = rank
            rank += 1
    group_id = np.full(flat.shape, -1, np.int64)
    group_id[valid] = rank_of[inverse]
    out = {
        "group_id": group_id.reshape(labels.shape),
        "group_sizes": np.sort(counts[keep])[::-1],
        "n_groups": n_groups,
    }
    if m is None or n_groups == 0:
        if m is not None:
            out.update(group_mass=np.zeros(0),
                       group_com=np.zeros((0, 3)),
                       group_vel=np.zeros((0, 3)))
        return out

    gid_v = rank_of[inverse]                     # (n_valid,) group rank
    sel = gid_v >= 0
    g = gid_v[sel]
    mm = np.asarray(m).reshape(-1)[valid][sel].astype(np.float64)
    mass = np.bincount(g, weights=mm, minlength=n_groups)
    out["group_mass"] = mass

    if pos is not None:
        pp = np.asarray(pos).reshape(-1, 3)[valid][sel].astype(np.float64)
        bx = np.asarray(box, np.float64) if box is not None else None
        # periodic CoM: wrap every member to the minimum image around the
        # group's first particle (fof.c accumulates with box wrapping)
        first = np.zeros((n_groups, 3))
        ug, first_idx = np.unique(g, return_index=True)
        first[ug] = pp[first_idx]
        rel = pp - first[g]
        if bx is not None:
            rel -= bx * np.round(rel / bx)
        com = np.stack([np.bincount(g, weights=mm * rel[:, k],
                                    minlength=n_groups)
                        for k in range(3)], axis=1) / mass[:, None]
        com = com + first
        if bx is not None:
            com = np.mod(com, bx)
        out["group_com"] = com
    if v is not None:
        vv = np.asarray(v).reshape(-1, 3)[valid][sel].astype(np.float64)
        out["group_vel"] = np.stack(
            [np.bincount(g, weights=mm * vv[:, k], minlength=n_groups)
             for k in range(3)], axis=1) / mass[:, None]
    if seed_halo_mass > 0:
        out["seed_groups"] = np.where(mass >= seed_halo_mass)[0]
    return out
