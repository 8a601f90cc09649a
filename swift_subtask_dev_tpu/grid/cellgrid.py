"""The cell grid — TPU-native replacement for SWIFT's space/cell tree.

The reference builds a top-level grid of cells recursively oct-split into a
tree with per-cell particle arrays, rebuilt by a threadpooled counting sort
(src/space_rebuild.c:49, space_cell_index.c).  On TPU the equivalent is a
single **regular periodic grid of fixed-capacity tiles**: every particle
lives in exactly one of ``C = ncx*ncy*ncz`` cells, at one of ``K`` padded
SoA slots.  The "rebuild" is a jit-compiled counting sort (argsort by cell +
rank-in-cell scatter).  There is no oct-tree: the 27-stencil over the top
grid plays the role of SWIFT's pair tasks, and the grid spacing is tied to
the interaction range exactly like SWIFT ties cell width to h_max
(space_regrid logic, space.c).

Positions inside the framework are (cell, f32 offset-from-corner) pairs;
between rebuilds offsets may wander outside [0, edge) — pairwise math stays
exact because distances only ever use offset differences plus integer
stencil shifts.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

I32 = jnp.int32
F32 = jnp.float32


@dataclass(frozen=True)
class CellGrid:
    """Static description of the periodic top grid (jit-static)."""

    box: Tuple[float, float, float]
    cdim: Tuple[int, int, int]
    K: int
    # Cyclic x relabeling: physical column ix maps to ARRAY index
    # (ix + x_roll) % ncx.  Under shard_map every device owns an equal
    # contiguous ARRAY slab, so this roll is the one load-balance knob
    # equal-shape sharding leaves: it slides all shard boundaries by
    # whole columns (the measured-cost analog of the reference's
    # ParMETIS repartition, partition.c:1033 — see build_columns).
    # Adjacency is cyclic, so rolls preserve every neighbour relation.
    x_roll: int = 0

    def __post_init__(self):
        if any(c < 3 and c != 1 for c in self.cdim):
            raise ValueError(
                f"cdim {self.cdim} < 3: the 27-stencil needs >= 3 cells per "
                "axis (otherwise offsets alias and pairs double-count); "
                "an axis of exactly 1 is the column layout of the 'flat' "
                "backend (ops/pallas_flat.py), which never runs the stencil")

    def validate_range(self, interaction_range: float) -> None:
        """Check every cell edge covers the interaction range.

        The analog of SWIFT's cell-width >= h_max requirement
        (space_regrid, space.c) — violating it silently loses pairs.
        """
        bad = [e for e in self.edge if e < interaction_range * (1 - 1e-6)]
        if bad:
            raise ValueError(
                f"cell edges {self.edge} smaller than interaction range "
                f"{interaction_range}: box too thin or h too large "
                f"(need box >= 3*range per axis)")

    @property
    def C(self) -> int:
        return self.cdim[0] * self.cdim[1] * self.cdim[2]

    @property
    def edge(self) -> Tuple[float, float, float]:
        return (self.box[0] / self.cdim[0],
                self.box[1] / self.cdim[1],
                self.box[2] / self.cdim[2])

    @property
    def edge_arr(self) -> np.ndarray:
        return np.asarray(self.edge, dtype=np.float64)

    # --- construction --------------------------------------------------------
    @staticmethod
    def build(box, interaction_range: float, n_particles: int,
              occupancy: float = 0.55, k_align: int = 8,
              max_cdim: int = 128, min_cdim: int = 3,
              k_max: int = 2048) -> "CellGrid":
        """Choose cdim and K for a target interaction range.

        The cell edge must be >= interaction_range (so the 27-stencil covers
        all pairs) — the analog of SWIFT requiring cell width >= h_max
        (space.c space_regrid).  K is the padded capacity: mean occupancy
        over K targets `occupancy`, rounded up to a multiple of `k_align`
        (TPU sublane friendliness).
        """
        box = tuple(float(b) for b in box)
        cdim = []
        for b in box:
            n = int(math.floor(b / max(interaction_range, 1e-30)))
            cdim.append(int(np.clip(n, min_cdim, max_cdim)))
        C = cdim[0] * cdim[1] * cdim[2]
        mean_per_cell = n_particles / max(C, 1)
        K = int(math.ceil(mean_per_cell / occupancy / k_align)) * k_align
        K = max(K, k_align)
        K = min(K, k_max)
        return CellGrid(box=box, cdim=tuple(cdim), K=K)

    @staticmethod
    def build_for_positions(box, interaction_range: float, pos,
                            headroom: float = 1.5, k_align: int = 8,
                            max_cdim: int = 128, min_cdim: int = 3
                            ) -> "CellGrid":
        """Like :meth:`build` but sizes K from the *actual* worst-case cell.

        Histograms the particle positions on the candidate grid and sets
        K = max-count * headroom (rounded up to k_align).  This is the
        equivalent of SWIFT sizing cell arrays from real counts at rebuild
        (space_rebuild.c) — a mean-occupancy guess silently drops particles
        in clustered or lattice configurations.
        """
        box = tuple(float(b) for b in box)
        pos = np.asarray(pos, np.float64)
        cdim = []
        for b in box:
            n = int(math.floor(b / max(interaction_range, 1e-30)))
            cdim.append(int(np.clip(n, min_cdim, max_cdim)))
        edge = np.asarray(box) / np.asarray(cdim)
        ijk = np.floor(np.mod(pos, box) / edge).astype(np.int64)
        ijk = np.clip(ijk, 0, np.asarray(cdim) - 1)
        lin = (ijk[:, 0] * cdim[1] + ijk[:, 1]) * cdim[2] + ijk[:, 2]
        max_count = int(np.bincount(lin).max()) if len(lin) else 1
        K = int(math.ceil(max_count * headroom / k_align)) * k_align
        g = CellGrid(box=box, cdim=tuple(cdim), K=max(K, k_align))
        g.validate_range(interaction_range)
        return g

    @staticmethod
    def build_columns(box, interaction_range: float, pos,
                      headroom: float = 1.4, w_align: int = 128,
                      max_cdim: int = 512, n_shards: int = 0) -> "CellGrid":
        """Column grid for the flat (z-sorted) backend: cdim=(ncx, ncy, 1).

        Column cross-section >= interaction_range (so 9 neighbour columns
        cover all pairs); W sized from the actual fullest column, aligned
        to the kernel's 128-lane i-tiles.

        With ``n_shards > 0`` the x-resolution AND the cyclic x_roll are
        chosen **cost-balanced** for an n-device x-slab decomposition —
        the TPU analog of the reference's measured-cost repartition
        (partition.c:1033): shard_map demands equal column counts per
        device, so the load-balance knobs are the boundary GRANULARITY
        (ncx) and the boundary PHASE (x_roll — a cyclic relabeling that
        slides every slab boundary by whole columns).  Among feasible
        (ncx multiple of n_shards, roll), pick the pair minimizing the
        fullest slab's measured particle count.  Because auto-regrids
        call back into this builder with the CURRENT positions
        (Engine.regrid), the split re-balances as clustering develops.
        """
        box = tuple(float(b) for b in box)
        pos = np.asarray(pos, np.float64)
        cd = []
        for b in box[:2]:
            n = int(math.floor(b / max(interaction_range, 1e-30)))
            # (an even-count preference for the 2x2 bundling path was
            # measured 6% SLOWER at 1M — dropping a column widens every
            # tile's z-window — and bundling is opt-in, so no rounding)
            cd.append(int(np.clip(n, 3, max_cdim)))
        if n_shards > 0:
            nx_max = int(math.floor(box[0] / max(interaction_range, 1e-30)))
            nx_max = min(nx_max, max_cdim)
            cands = [n for n in range(n_shards, nx_max + 1, n_shards)
                     if n >= 3]
            if not cands:
                raise ValueError(
                    f"box_x={box[0]} cannot fit {n_shards} x-slabs of "
                    f">= interaction_range={interaction_range} columns")
            x = np.mod(pos[:, 0], box[0])

            def best_roll(nx):
                """(worst-slab count, roll) at this resolution: rolling
                the column->array map by k slides every shard boundary
                k columns; the per-shard sums are a cyclic windowed sum
                of the per-column histogram."""
                ix = np.clip((x / (box[0] / nx)).astype(np.int64), 0,
                             nx - 1)
                per_col = np.bincount(ix, minlength=nx)
                width = nx // n_shards
                best = (np.inf, 0)
                for k in range(width):
                    rolled = np.roll(per_col, k)
                    worst = rolled.reshape(n_shards, -1).sum(axis=1).max()
                    if worst < best[0]:
                        best = (worst, k)
                return best

            choice = min(((best_roll(n), -n) for n in cands),
                         key=lambda t: (t[0][0], t[1]))
            cd[0] = -choice[1]
            x_roll = choice[0][1]
        else:
            x_roll = 0
        edge = np.asarray([box[0] / cd[0], box[1] / cd[1]])
        ij = np.floor(np.mod(pos[:, :2], box[:2]) / edge).astype(np.int64)
        ij = np.clip(ij, 0, np.asarray(cd) - 1)
        lin = ij[:, 0] * cd[1] + ij[:, 1]
        max_count = int(np.bincount(lin).max()) if len(lin) else 1
        W = int(math.ceil(max_count * headroom / w_align)) * w_align
        return CellGrid(box=box, cdim=(cd[0], cd[1], 1),
                        K=max(W, w_align), x_roll=x_roll)

    # --- coordinate helpers ---------------------------------------------------
    def cell_corners(self) -> np.ndarray:
        """(C, 3) f64 cell corner positions (host-side, exact).

        Array x index j sits at physical column (j - x_roll) % ncx."""
        ix, iy, iz = np.meshgrid(np.arange(self.cdim[0]),
                                 np.arange(self.cdim[1]),
                                 np.arange(self.cdim[2]), indexing="ij")
        ix = (ix - self.x_roll) % self.cdim[0]
        idx = np.stack([ix, iy, iz], axis=-1).reshape(-1, 3).astype(np.float64)
        return idx * self.edge_arr

    def linear_cell_of(self, ixyz: jnp.ndarray) -> jnp.ndarray:
        """Linear cell index from integer (…,3) cell coords (with wrap)."""
        ncx, ncy, ncz = self.cdim
        ix = jnp.mod(ixyz[..., 0], ncx)
        iy = jnp.mod(ixyz[..., 1], ncy)
        iz = jnp.mod(ixyz[..., 2], ncz)
        return (ix * ncy + iy) * ncz + iz


# ---------------------------------------------------------------------------
# Bucketing (the rebuild).
# ---------------------------------------------------------------------------

def bucket_fields(grid: CellGrid, pos: jnp.ndarray,
                  fields: Dict[str, jnp.ndarray],
                  zsort: bool = False):
    """Counting-sort N particles into (C, K, ...) padded tiles.

    pos: (N, 3) absolute positions (any float dtype; wrapped periodically).
    fields: dict of (N,) or (N, 3) arrays scattered alongside.

    Returns (out_fields, mask, off, n_overflow):
      out_fields[name]: (C, K[, 3]);  mask: (C, K) f32;
      off: (C, K, 3) f32 cell-local offsets; n_overflow: particles dropped
      because their cell exceeded K (must be 0 — caller re-grids otherwise,
      the analog of space_regrid).

    Eager calls (IC ingestion, re-grids — every caller outside jit) take a
    host numpy fast path: op-by-op dispatch of the sort/scatter chain
    through a remote-device transport costs minutes at 3e5+ particles
    (measured 200 s at 351k through the axon tunnel), while the identical
    numpy chain is < 1 s.  Inside jit the traced path below runs unchanged.
    """
    import jax.core as _jc
    leaves = [pos, *fields.values()]
    if not any(isinstance(x, _jc.Tracer) for x in leaves):
        return _bucket_fields_host(grid, pos, fields, zsort)
    box = jnp.asarray(grid.box, pos.dtype)
    edge = jnp.asarray(grid.edge_arr, pos.dtype)
    ncx, ncy, ncz = grid.cdim
    C, K = grid.C, grid.K
    N = pos.shape[0]

    p = jnp.mod(pos, box)
    ixyz = jnp.floor(p / edge).astype(I32)
    ixyz = jnp.clip(ixyz, 0, jnp.asarray(grid.cdim, I32) - 1)
    off = (p - ixyz.astype(pos.dtype) * edge).astype(F32)
    if grid.x_roll:
        ixyz = ixyz.at[..., 0].add(grid.x_roll)   # physical -> array x
    cell = grid.linear_cell_of(ixyz)

    if zsort:
        # flat backend: z-sorted slot order within each column tile
        # (the analog of SWIFT's per-axis particle sorts, sort_part.h)
        order = jnp.lexsort((p[:, 2], cell))
    else:
        order = jnp.argsort(cell, stable=True)
    cell_s = cell[order]
    rank = _rank_in_run(cell_s)

    ok = rank < K
    n_overflow = jnp.sum(~ok).astype(I32)
    slot = jnp.where(ok, cell_s * K + rank, C * K)  # drop-overflow sentinel

    def scatter(x_sorted, fill=0.0):
        flat_shape = (C * K + 1,) + x_sorted.shape[1:]
        out = jnp.full(flat_shape, fill, x_sorted.dtype)
        out = out.at[slot].set(x_sorted)
        return out[:-1].reshape((C, K) + x_sorted.shape[1:])

    out_fields = {name: scatter(arr[order]) for name, arr in fields.items()}
    mask = scatter(jnp.ones((N,), F32))
    off_t = scatter(off[order])
    return out_fields, mask, off_t, n_overflow


def _rank_in_run(cell_s: jnp.ndarray) -> jnp.ndarray:
    """Rank of each element within its run of equal values, for a SORTED
    key array: boundary flags + one cumulative max of the boundary
    indices.  O(N) scan — the previous
    ``searchsorted(cell_s, cell_s)`` was an N x log N chain of
    latency-bound gathers and dominated the whole rebucket (measured
    2.6 s of a 4.4 s rebucket at 11.9M slots; the scan is ~50 ms)."""
    n = cell_s.shape[0]
    iota = jnp.arange(n, dtype=I32)
    boundary = jnp.concatenate(
        [jnp.ones((1,), bool), cell_s[1:] != cell_s[:-1]])
    first = jax.lax.cummax(jnp.where(boundary, iota, 0))
    return iota - first


def _bucket_fields_host(grid: CellGrid, pos, fields, zsort: bool):
    """Numpy mirror of the traced bucket_fields path (bit-identical: the
    same f32 mod/floor/lexsort/rank chain, just on host)."""
    # the traced path sees f32 (jnp converts f64 inputs under x64=off)
    pos = np.asarray(pos, np.float32)
    box = np.asarray(grid.box, np.float32)
    edge = np.asarray(grid.edge_arr, np.float32)
    C, K = grid.C, grid.K
    N = pos.shape[0]

    p = np.mod(pos, box)
    ixyz = np.floor(p / edge).astype(np.int32)
    ixyz = np.clip(ixyz, 0, np.asarray(grid.cdim, np.int32) - 1)
    ncx, ncy, ncz = grid.cdim
    off = (p - ixyz.astype(np.float32) * edge).astype(np.float32)
    cell = (((ixyz[:, 0] + grid.x_roll) % ncx) * ncy
            + ixyz[:, 1] % ncy) * ncz + ixyz[:, 2] % ncz

    if zsort:
        order = np.lexsort((p[:, 2], cell))
    else:
        order = np.argsort(cell, kind="stable")
    cell_s = cell[order]
    first = np.searchsorted(cell_s, cell_s, side="left")
    rank = np.arange(N, dtype=np.int32) - first.astype(np.int32)

    ok = rank < K
    n_overflow = jnp.asarray(int(np.sum(~ok)), jnp.int32)
    slot = np.where(ok, cell_s * K + rank, C * K)

    def scatter(x_sorted, fill=0.0):
        out = np.full((C * K + 1,) + x_sorted.shape[1:], fill,
                      x_sorted.dtype)
        out[slot] = x_sorted
        return jnp.asarray(out[:-1].reshape((C, K) + x_sorted.shape[1:]))

    out_fields = {}
    for name, arr in fields.items():
        a = np.asarray(arr)
        if a.dtype == np.float64:
            a = a.astype(np.float32)
        out_fields[name] = scatter(a[order])
    mask = scatter(np.ones((N,), np.float32))
    off_t = scatter(off[order])
    return out_fields, mask, off_t, n_overflow


def rebucket_offsets(grid: CellGrid, mask: jnp.ndarray, off: jnp.ndarray,
                     fields: Dict[str, jnp.ndarray], zsort: bool = False):
    """Re-bucket from existing (C,K) tiles after drift.

    Computes each slot's new cell from its (possibly out-of-cell) offset and
    redistributes all fields.  This is the per-rebuild analog of
    space_rebuild's "cell index + sort" (space_rebuild.c:150) — exact in f32
    because it never forms absolute positions.

    K is taken from the tiles themselves (species may carry different
    per-cell capacities than the grid's gas K).
    """
    C, K = grid.C, mask.shape[1]
    edge = jnp.asarray(grid.edge_arr, F32)
    cdim = jnp.asarray(grid.cdim, I32)

    # current cell coords of each slot
    cid = jnp.arange(C, dtype=I32)
    ncx, ncy, ncz = grid.cdim
    ix = cid // (ncy * ncz)
    iy = (cid // ncz) % ncy
    iz = cid % ncz
    cur = jnp.stack([ix, iy, iz], axis=-1)[:, None, :]  # (C,1,3)

    shift = jnp.floor(off / edge).astype(I32)            # (C,K,3)
    new_ixyz = jnp.mod(cur + shift, cdim)
    new_off = off - shift.astype(F32) * edge
    new_cell = grid.linear_cell_of(new_ixyz).reshape(-1)  # (C*K,)

    valid = mask.reshape(-1) > 0
    new_cell = jnp.where(valid, new_cell, C)  # invalid slots sort last

    if zsort:
        order = jnp.lexsort((new_off[..., 2].reshape(-1), new_cell))
    else:
        order = jnp.argsort(new_cell, stable=True)
    cell_s = new_cell[order]
    rank = _rank_in_run(cell_s)

    ok = (cell_s < C) & (rank < K)
    n_overflow = jnp.sum((cell_s < C) & (rank >= K)).astype(I32)
    slot = jnp.where(ok, cell_s * K + rank, C * K)

    # ONE i32 scatter builds the destination->source map; every field
    # then moves by gather (TPU scatters are far slower than gathers —
    # the previous per-field gather+scatter made the rebucket dominate
    # the step at 1e6+ particles).  Sentinel source C*K reads the
    # appended fill row.
    src = jnp.full((C * K + 1,), C * K, I32)
    src = src.at[slot].set(order.astype(I32))
    src = src[:-1]

    # Move every field with ONE row gather per dtype group: TPU gathers
    # are latency-bound per row and locality does not help (measured
    # ~20 ms/field at 1.7M rows, NOTES_ROUND6), so packing the F scalar
    # columns into a single (C*K+1, F) matrix amortises that latency
    # F-fold.  The appended fill row carries each column's own fill
    # value, so mixed fills (pid = -1) stay exact.
    CK = C * K
    entries = [("\x00mask", mask, 0.0), ("\x00off", new_off, 0.0)]
    for name, arr in fields.items():
        fill = (-1 if arr.dtype in (jnp.int32, jnp.int64)
                and name == "pid" else 0)
        entries.append((name, arr, fill))
    by_dtype: Dict = {}
    for name, arr, fill in entries:
        flat = arr.reshape((CK, -1))
        by_dtype.setdefault(jnp.dtype(arr.dtype).name, []).append(
            (name, flat, fill, arr.shape))
    moved = {}
    for dt, items in by_dtype.items():
        big = jnp.concatenate([f for _, f, _, _ in items], axis=1)
        fill_row = jnp.concatenate(
            [jnp.full((1, f.shape[1]), fl, dt) for _, f, fl, _ in items],
            axis=1)
        big = jnp.concatenate([big, fill_row], axis=0)
        out = big[src]
        c0 = 0
        for name, f, _, shp in items:
            k = f.shape[1]
            moved[name] = out[:, c0:c0 + k].reshape((C, K) + shp[2:])
            c0 += k
    out_fields = {name: moved[name] for name in fields}
    new_mask = moved["\x00mask"]
    out_off = moved["\x00off"]
    return out_fields, new_mask, out_off, n_overflow


def global_positions(grid: CellGrid, off: jnp.ndarray) -> np.ndarray:
    """(C, K, 3) f64 absolute positions (host-side; for I/O and checks)."""
    corners = grid.cell_corners().reshape(grid.cdim + (3,))
    corners = corners.reshape(grid.C, 1, 3)
    pos = corners + np.asarray(off, np.float64)
    return np.mod(pos, np.asarray(grid.box, np.float64))
