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
                    min_size: int = 20) -> Dict[str, np.ndarray]:
    """Host-side: renumber labels by group size, build the catalogue.

    Returns dict with group_id per slot (-1 below min_size / empty),
    group_sizes (descending).  The analog of fof.c's group props +
    fof_catalogue_io.c.
    """
    flat = labels.reshape(-1)
    valid = mask.reshape(-1) > 0
    ids, inverse, counts = np.unique(flat[valid], return_inverse=True,
                                     return_counts=True)
    order = np.argsort(-counts)
    rank_of = np.full(len(ids), -1, np.int64)
    kept = 0
    for r, gi in enumerate(order):
        if counts[gi] >= min_size:
            rank_of[gi] = r
            kept += 1
        else:
            rank_of[gi] = -1
    group_id = np.full(flat.shape, -1, np.int64)
    group_id[valid] = rank_of[inverse]
    return {
        "group_id": group_id.reshape(labels.shape),
        "group_sizes": np.sort(counts[counts >= min_size])[::-1],
        "n_groups": int((counts >= min_size).sum()),
    }
