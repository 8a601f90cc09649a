"""Column/z-sorted Pallas pair engine — the pseudo-Verlet TPU kernel.

This is the TPU re-creation of SWIFT's sorted interaction machinery
(src/sort_part.h:42, runner_doiact_functions_hydro.h DOPAIR1): the
reference sorts particles along the pair axis and only walks overlapping
sorted ranges; here the domain is decomposed into **(x, y) columns** (a
CellGrid with cdim=(ncx, ncy, 1)), particles are kept **z-sorted inside
each column tile**, and the kernel walks, for each 128-particle i-tile,
only the z-overlapping JB-row blocks (default 64) of its 9 neighbour
columns:

* i-side: (F, W) SoA column blocks — fields are rows, particles lanes;
  i-tiles are 128-lane slices, so there is no per-cell padding waste.
* j-side: the 9 neighbour columns arrive as (W, F) AoS row windows via
  standard BlockSpec pipelining (index maps compute the wrapped
  neighbour-column id), one fetch per column per pass.
* The block-level work list is decided OUTSIDE the kernel: XLA computes,
  per (i-tile, neighbour), a packed contiguous-range word
  (s1|c1<<8|s2<<16|c2<<24, 8 bits each) of which JB-row j-blocks
  z-overlap the tile's reach-inflated z-range — one run of block ids,
  or two when the range wraps the periodic box.  The kernel loops
  exactly c1+c2 times — no per-block loads or tests for skipped work.

Pair physics comes in through the same callback protocol as
pallas_pairs/pallas_packed.pair_apply, so ops/hydro_pallas.py drives all
three engines with the shared scheme term functions.
"""

from __future__ import annotations

import math
from typing import Callable, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..grid.cellgrid import CellGrid

F32 = jnp.float32
I32 = jnp.int32

# 9 (dx, dy) column offsets, self first
OFFSETS_9 = [(0, 0)] + [(dx, dy)
                        for dx in (-1, 0, 1) for dy in (-1, 0, 1)
                        if not (dx == 0 and dy == 0)]
# 16 (dx, dy) offsets of a 2x2 column bundle (relative to the bundle's
# origin column): the 4x4 window covers every column within one edge of
# the 2-column-wide footprint
OFFSETS_16 = [(dx, dy) for dx in (-1, 0, 1, 2) for dy in (-1, 0, 1, 2)]

JB = 64          # default j-block rows (z-skip granularity); NBLK <= 255
# j-field broadcast path: True = MXU selector matmul (tile @ one-hot
# column -> already-broadcast (jb, 128) lanes; the matrix unit is idle
# in this kernel and the matmul overlaps VPU work), False = VPU lane
# broadcast of the (jb, 1) slice.  The probe (tools/probe_kernel.py B)
# measured the VPU lane-broadcast as the dominant per-field cost of the
# force pass; the MXU path measured ~17% faster on the synthetic
# 9-field probe.  FLAT_MXU_BCAST=0 switches back for A/B runs.
import os as _os
_mb = _os.environ.get("FLAT_MXU_BCAST", "0")
MXU_BCAST = "wide" if _mb == "wide" else _mb != "0"
# JB=64 measured fastest with the contiguous-range kernel at the bench
# geometry (1.69e6 vs 1.59e6 @32, 1.33e6 @128 steps/s): the ~230-cycle
# per-block walk floor (dependent VMEM slice + field lane-broadcasts)
# amortises over 2x the pairs, and the +16% candidate inflation from
# coarser z-granularity costs less than the floor saved.
LANES = 128      # i-tile width
# Fine z-ranges: the block-range words are computed at jb/4-row
# granularity (16 rows at the default jb=64) while the kernel still
# PROCESSES 64-row chunks (dynamic slices at 16-row-aligned starts,
# overhang rows masked).  This keeps the per-chunk walk floor of jb=64
# but cuts the ~half-block candidate waste at each window end 4x —
# the round-3 jb=16 experiment lost because it also quartered the
# processing chunk; this decouples the two.  FLAT_FINE_RANGES=0 to A/B.
FINE_RANGES = _os.environ.get("FLAT_FINE_RANGES", "1") != "0"
FINE_DIV = 4
NBLK_MAX = 63    # fine starts/counts pack into 4 x 8-bit fields
# (Wj/jb <= 63 so Wj/(jb/4) <= 252 fits 8 bits)
# Bundled-path chunking: ranges at 8-row granularity, processing chunks
# of 8 granules (64 rows).  Measured on TPU (in-process A/B, density
# pass, 93k): stride 8 = 9.55 ms vs 10.08 non-bundled, stride 9 (72-row
# chunks) = 11.2 (non-8x64 slices regress more than the saved trips),
# stride 11 = 10.1.  The paper 4x z-span quartering does NOT
# materialise: member columns' independent z-sorts misalign by their
# count differences (~span 32 -> ~60 rows), leaving ~13% fewer
# candidate rows + fuller i-tiles.  Step-level the per-pass transpose
# to/from the bundled layout eats that margin (16-bit-range bench:
# 0.414 non-bundled vs 0.394 bundled at 93k), so bundling is OPT-IN
# via FLAT_BUNDLE=1; FLAT_CHUNK_STRIDE granules/trip to A/B.
GRAN_BUNDLED = 8
CHUNK_STRIDE = int(_os.environ.get("FLAT_CHUNK_STRIDE", "8"))
# Process two 64-row chunks per fori trip (independent slice+extract
# chains; the probe measured a ~420-cycle dependent-op floor per trip).
DUO_CHUNK = _os.environ.get("FLAT_DUO", "0") != "0"


def _jb_for(Wj: int) -> int:
    """Block rows for a column capacity: starts/counts pack into 8-bit
    fields, so JB doubles as W grows past NBLK_MAX blocks; W is always
    a multiple of 128 (build_columns w_align) so JB divides it."""
    jb = JB
    while Wj // jb > NBLK_MAX:
        jb *= 2
    return jb


def _column_geometry(grid: CellGrid):
    ncx, ncy, ncz = grid.cdim
    assert ncz == 1, "flat engine needs a column grid (cdim z == 1)"
    return ncx, ncy, ncx * ncy


def nbr_col_table(grid: CellGrid) -> np.ndarray:
    """(Ncol, 9) i32 linear ids of each column's 9 neighbours."""
    ncx, ncy, Ncol = _column_geometry(grid)
    ids = np.arange(Ncol)
    ix, iy = ids // ncy, ids % ncy
    out = np.empty((Ncol, 9), np.int32)
    for o, (dx, dy) in enumerate(OFFSETS_9):
        out[:, o] = ((ix + dx) % ncx) * ncy + (iy + dy) % ncy
    return out


def nbr_col_table_bundled(grid: CellGrid) -> np.ndarray:
    """(Ngrp, 16) i32 linear column ids of each 2x2 bundle's window."""
    ncx, ncy, _ = _column_geometry(grid)
    ngx, ngy = ncx // 2, ncy // 2
    g = np.arange(ngx * ngy)
    gx, gy = g // ngy, g % ngy
    out = np.empty((ngx * ngy, 16), np.int32)
    for o, (dx, dy) in enumerate(OFFSETS_16):
        out[:, o] = ((2 * gx + dx) % ncx) * ncy + (2 * gy + dy) % ncy
    return out


def bundle_ok(grid: CellGrid) -> bool:
    """2x2 bundling needs even column counts and a window whose 16
    columns are distinct under periodic wrap (ncx, ncy >= 4)."""
    ncx, ncy, _ = _column_geometry(grid)
    return ncx >= 4 and ncy >= 4 and ncx % 2 == 0 and ncy % 2 == 0


def _to_bundled(arr: jnp.ndarray, ncx: int, ncy: int) -> jnp.ndarray:
    """(Ncol, W) column tiles -> (Ngrp, 4W) bundle tiles.

    Bundle lane order (within each 128-lane i-tile t): member (mx, my)
    contributes its z-rows [32t, 32t+32) as lanes [32(2mx+my),
    32(2mx+my)+32) — four quarter-tiles of z-sorted rows, so a bundled
    tile's z-span is ~1/4 of a single-column 128-row tile's."""
    W = arr.shape[1]
    a = arr.reshape(ncx // 2, 2, ncy // 2, 2, W // 32, 32)
    a = a.transpose(0, 2, 4, 1, 3, 5)     # gx, gy, t, mx, my, r
    return a.reshape((ncx // 2) * (ncy // 2), 4 * W)


def _from_bundled(arr: jnp.ndarray, ncx: int, ncy: int,
                  W: int) -> jnp.ndarray:
    """(n, Ngrp*4W) kernel output -> (n, Ncol, W) column layout."""
    a = arr.reshape(-1, ncx // 2, ncy // 2, W // 32, 2, 2, 32)
    a = a.transpose(0, 1, 4, 2, 5, 3, 6)
    return a.reshape(-1, ncx * ncy, W)


def _block_ranges(grid: CellGrid, maskf, zf, hf, gamma: float,
                  sym_range: bool, maskf_j=None, zf_j=None, hf_j=None,
                  jb: int = JB, reach_floor: float = 0.0, nbr=None):
    """(NI, TPC, NO, 2) i32 packed j-block ranges: word 0 = s1|c1<<16,
    word 1 = s2|c2<<16 (16-bit fields — capacities up to 65535 granules,
    where the old 8-bit quad-pack capped Wj/granularity at 255 and forced
    coarse granules at 1e7-scale column heights).

    Columns are z-sorted, so the j-blocks whose z-interval overlaps an
    i-tile's reach-inflated z-range form a CONTIGUOUS run of block ids —
    or two runs when the range wraps the periodic box.  The kernel loops
    exactly ``c1 + c2`` times instead of scanning every block against a
    bitmask, which removes the skipped-block visits entirely (measured
    ~10 ms/pass of pure loop overhead at 93k particles).

    When the j-side arrays are given (cross-species loops: the i tiles of
    one species against the column blocks of another), the block windows
    come from the j species' layout (its own W_j / NBLK_j); otherwise the
    loop is the usual self-pairing.
    """
    ncx, ncy, Ncol = _column_geometry(grid)
    NI, W = maskf.shape                  # i-side programs (cols or bundles)
    TPC = W // LANES
    boxz = jnp.float32(grid.box[2])
    live = maskf > 0
    if maskf_j is None:
        maskf_j, zf_j, hf_j = maskf, zf, hf
    live_j = maskf_j > 0
    NBLK = maskf_j.shape[1] // jb

    zi = jnp.where(live, zf, jnp.inf).reshape(NI, TPC, LANES)
    iz_lo = jnp.min(zi, axis=2)                                # (NI,TPC)
    iz_hi = jnp.max(jnp.where(jnp.isfinite(zi), zi, -jnp.inf), axis=2)
    hmax_tile = jnp.max(
        jnp.where(live, hf, 0.0).reshape(NI, TPC, LANES), axis=2)
    hmax_col = jnp.max(jnp.where(live_j, hf_j, 0.0), axis=1)   # (Ncol,)

    zb = jnp.where(live_j, zf_j, jnp.inf) \
        .reshape(maskf_j.shape[0], NBLK, jb)
    jb_lo = jnp.min(zb, axis=2)                                # (Ncol,NBLK)
    jb_hi = jnp.max(jnp.where(jnp.isfinite(zb), zb, -jnp.inf), axis=2)
    # empty blocks (trailing, z-sorted): never "below" an interval, and
    # excluded from the end count via jb_lo = +inf
    empty = ~jnp.isfinite(jb_hi)
    jb_hi_e = jnp.where(empty, jnp.inf, jb_hi)                 # (Ncol,NBLK)

    if nbr is None:
        nbr = jnp.asarray(nbr_col_table(grid))                 # (NI, NO)
    if sym_range:
        reach = jnp.float32(gamma) * jnp.maximum(
            hmax_tile[:, :, None], hmax_col[nbr][:, None, :])
    else:
        reach = jnp.float32(gamma) * hmax_tile[:, :, None]
    if reach_floor > 0.0:
        # fused passes (hydro force + P2P gravity) need the window to
        # cover BOTH interaction ranges: max(gamma*h, r_cut)
        reach = jnp.maximum(reach, jnp.float32(reach_floor))
    lo = iz_lo[:, :, None] - reach                             # (NI,TPC,NO)
    hi = iz_hi[:, :, None] + reach

    jlo = jb_lo[nbr]                                           # (NI,NO,NBLK)
    jhi = jb_hi_e[nbr]

    def range_of(a, b):
        """Blocks of the (wrapped-into-[0,boxz]) interval [a, b]:
        start = #blocks entirely below a, end = NBLK - #blocks entirely
        above b (both prefixes/suffixes by z-sortedness)."""
        start = jnp.sum(jhi[:, None] < a[..., None], axis=-1)
        end = NBLK - jnp.sum(jlo[:, None] > b[..., None], axis=-1)
        return start.astype(I32), jnp.maximum(end - start, 0).astype(I32)

    wrap_lo = lo < 0.0
    wrap_hi = hi > boxz
    full = (hi - lo) >= boxz                    # range covers the box
    a1 = jnp.where(wrap_lo, 0.0, lo)
    b1 = jnp.where(wrap_hi, boxz, hi)
    # second image (empty sentinel a2 > b2 yields count 0)
    a2 = jnp.where(wrap_lo, lo + boxz,
                   jnp.where(wrap_hi, 0.0, boxz + 1.0))
    b2 = jnp.where(wrap_lo, boxz,
                   jnp.where(wrap_hi, hi - boxz, -1.0))
    s1, c1 = range_of(a1, b1)
    s2, c2 = range_of(a2, b2)
    # a wide block can intersect both images, putting it in both ranges
    # — visit it once: clip range 2 out of range 1's index interval.
    # (wrap_lo: range1 = low prefix, range2 = high suffix; wrap_hi: the
    # reverse; nesting impossible for prefix/suffix pairs.)
    e1 = s1 + c1
    e2 = s2 + c2
    both = (c1 > 0) & (c2 > 0)
    s2 = jnp.where(both & (s1 <= s2), jnp.maximum(s2, e1), s2)
    e2 = jnp.where(both & (s1 > s2), jnp.minimum(e2, s1), e2)
    c2 = jnp.maximum(e2 - s2, 0)
    # empty i-tile: lo = +inf -> both images empty already; full box:
    s1 = jnp.where(full, 0, s1)
    c1 = jnp.where(full, NBLK, c1)
    c2 = jnp.where(full, 0, c2)
    return jnp.stack([(s1 | (c1 << 16)).astype(I32),
                      (s2 | (c2 << 16)).astype(I32)], axis=-1)


def pair_apply(grid: CellGrid,
               fields: Dict[str, jnp.ndarray],
               field_order: Sequence[str],
               pair_fn: Callable,
               n_sum: int, n_max: int,
               shifts_scale: Tuple[float, float, float],
               CB: int = 0,
               scalars: Sequence[jnp.ndarray] = (),
               pad_fills=None,
               interpret: bool = False,
               range_scale: float = 2.0,
               sym_range: bool = False,
               fields_j: Dict[str, jnp.ndarray] = None,
               field_order_j: Sequence[str] = None,
               active_i: jnp.ndarray = None,
               reach_floor: float = 0.0,
               bundle: bool = None):
    """Run ``pair_fn`` over all pairs of the column/z-sorted layout.

    fields are (Ncol, W) tiles, z-sorted within each column (the engine's
    flat-backend state).  Returns (sums, maxes) as lists of (Ncol, W)
    arrays; max outputs are -inf where a slot had no accepted pair.

    Cross-species loops (BH/star density, multi-species gravity) pass
    ``fields_j``/``field_order_j``: the i-side tiles come from ``fields``
    and the j-side windows from ``fields_j`` — both on the same column
    grid, each with its own per-column capacity.

    ``active_i`` ((Ncol, W) bool/0-1): i-tiles (128-lane slices) with NO
    active particle get zeroed range words, so the kernel skips them in
    O(9 scalar reads) — the ghost's unconverged-subset re-run
    (runner_ghost.c:1085 subset loops).  Outputs for skipped tiles are 0
    (sums) / -inf (maxes); the caller merges previous values.  Tiles
    with ANY active particle are computed in full (exact for every
    particle in them).

    ``bundle`` (default: env FLAT_BUNDLE, on): process 2x2 column
    bundles per program.  Each 128-lane i-tile interleaves four 32-row
    z-slices (one per member column), quartering the tile's z-span, and
    the j-side visits the bundle's 16-column window — 4 window fetches
    per column instead of 9 and ~30% fewer candidate rows per tile at
    uniform density.  Falls back to per-column automatically when the
    grid cannot bundle (odd or <4 column counts).
    """
    if jax.default_backend() == "cpu":
        # no Mosaic on CPU: run the kernel through the interpreter so the
        # flat backend works transparently in CPU test runs
        interpret = True
    ncx, ncy, Ncol = _column_geometry(grid)
    W = fields["mask"].shape[1]
    cross = fields_j is not None
    if not cross:
        fields_j, field_order_j = fields, field_order
    Wj = fields_j["mask"].shape[1]
    jb = JB
    # fine mode needs at least one full chunk per column and a
    # fine-divisible capacity (Wj is 128-aligned so 16 | Wj)
    fine = FINE_RANGES and Wj >= jb and (jb % FINE_DIV == 0)
    use_bundle = (bundle if bundle is not None
                  else _os.environ.get("FLAT_BUNDLE", "0") != "0")
    use_bundle = use_bundle and bundle_ok(grid)
    if use_bundle and fine:
        # finer grain + measured-best chunk (see GRAN_BUNDLED note)
        gran = GRAN_BUNDLED
        ch = min(CHUNK_STRIDE * gran, Wj)
    else:
        gran = jb // FINE_DIV if fine else jb
        ch = jb
    stride = ch // gran                  # granules advanced per trip
    assert W % LANES == 0 and Wj % gran == 0 and Wj // gran <= 65535 \
        and ch % gran == 0
    Np = Ncol * W
    Npj = Ncol * Wj
    F = len(field_order)
    Fj = len(field_order_j)
    Fp = int(math.ceil(F / 8)) * 8
    Fpj = int(math.ceil(Fj / 8)) * 8
    n_out = n_sum + n_max
    n8 = int(math.ceil(n_out / 8)) * 8
    fidx = {name: i for i, name in enumerate(field_order)}
    fidx_j = {name: i for i, name in enumerate(field_order_j)}
    ex, ey = float(grid.edge[0]), float(grid.edge[1])
    boxz = float(grid.box[2])

    # ---- i-side layout: per-column tiles or 2x2 bundle tiles ------------
    col_counts = jnp.sum(fields["mask"] > 0, axis=1).astype(I32)  # (Ncol,)
    if use_bundle:
        NPROG, WI, offsets = Ncol // 4, 4 * W, OFFSETS_16
        fi = {n: _to_bundled(fields[n].reshape(Ncol, W), ncx, ncy)
              for n in field_order}
        # positions become bundle-corner-relative so the per-offset
        # (dx*ex, dy*ey) shifts stay lane-uniform
        lane_m = (np.arange(WI) % LANES) // 32          # member per lane
        fi["off0"] = fi["off0"] + jnp.asarray((lane_m // 2) * ex, F32)
        fi["off1"] = fi["off1"] + jnp.asarray((lane_m % 2) * ey, F32)
        nbr_i = jnp.asarray(nbr_col_table_bundled(grid))
        # live particles are a z-sorted prefix per member column; a
        # bundled tile t is live iff any member has > 32*t particles
        cmax = jnp.max(col_counts.reshape(ncx // 2, 2, ncy // 2, 2),
                       axis=(1, 3)).reshape(NPROG)
        tcounts = ((cmax + 31) // 32).reshape(NPROG, 1, 1)
        act = (_to_bundled(active_i.reshape(Ncol, W), ncx, ncy)
               if active_i is not None else None)
    else:
        NPROG, WI, offsets = Ncol, W, OFFSETS_9
        fi, nbr_i, act = fields, None, active_i
        tcounts = ((col_counts + (LANES - 1)) // LANES) \
            .reshape(Ncol, 1, 1)
    TPC = WI // LANES
    n_off = len(offsets)

    # ---- SoA (F, Np) for i-side lane blocks -----------------------------
    Xi = jnp.stack([fi[n].reshape(Np) for n in field_order], axis=0)
    if Fp > F:
        Xi = jnp.pad(Xi, ((0, Fp - F), (0, 0)))
    # ---- AoS (Npj, Fpj) for j-side row windows --------------------------
    Xa = jnp.stack([fields_j[n].reshape(Npj) for n in field_order_j],
                   axis=1)
    if Fpj > Fj:
        Xa = jnp.pad(Xa, ((0, 0), (0, Fpj - Fj)))

    ranges = _block_ranges(
        grid, fi["mask"], fi["off2"], fi["h"],
        range_scale, sym_range,
        *((fields_j["mask"], fields_j["off2"], fields_j["h"])
          if (cross or use_bundle) else (None, None, None)),
        jb=gran, reach_floor=reach_floor, nbr=nbr_i)
    if act is not None:
        tile_act = jnp.any((act > 0).reshape(NPROG, TPC, LANES),
                           axis=2)
        ranges = jnp.where(tile_act[:, :, None, None], ranges, 0)
    # per-program SMEM blocks: (NPROG, TPC*n_off*2) so each program only
    # prefetches its own tiles' words (the flat all-programs array would
    # be MBs of SMEM at 1e7-scale grids)
    ranges = ranges.reshape(NPROG, 1, TPC * n_off * 2)

    n_sc = len(scalars)
    sc_arr = (jnp.stack([jnp.asarray(v, F32) for v in scalars])
              if n_sc else jnp.zeros((1,), F32)).reshape(1, -1)

    def kernel(counts_ref, rng_ref, tab_ref, xi_ref, *rest):
        wrefs = rest[:n_off]
        out_ref = rest[n_off]
        acc = rest[n_off + 1]
        n_tiles = counts_ref[0, 0, 0]
        sc = tuple(tab_ref[0, i] for i in range(n_sc))
        out_ref[:] = jnp.zeros_like(out_ref)

        def tile_body(it, _):
            l0 = pl.multiple_of(it * LANES, LANES)

            def sf(name):
                return xi_ref[fidx[name], pl.ds(l0, LANES)][None, :]

            # deferred reductions: accumulate (ch, LANES) per output and
            # collapse the j-rows ONCE per i-tile, not per block
            for q in range(n_sum):
                acc[q, :, :] = jnp.zeros_like(acc[q, :, :])
            for q in range(n_max):
                acc[n_sum + q, :, :] = jnp.full_like(
                    acc[n_sum + q, :, :], -jnp.inf)

            row_iota = jax.lax.broadcasted_iota(I32, (ch, 1), 0)
            for o, (dx, dy) in enumerate(offsets):
                wref = wrefs[o]
                w1 = rng_ref[0, 0, (it * n_off + o) * 2]
                w2 = rng_ref[0, 0, (it * n_off + o) * 2 + 1]
                s1 = w1 & 0xFFFF
                c1 = (w1 >> 16) & 0xFFFF
                s2 = w2 & 0xFFFF
                c2 = (w2 >> 16) & 0xFFFF
                sx = jnp.float32(dx * ex)
                sy = jnp.float32(dy * ey)
                if fine:
                    # counts in FINE units; each loop trip processes a
                    # ch-row chunk at a granule-aligned start, masking
                    # overhang rows past the fine range end
                    nc1 = (c1 + stride - 1) // stride
                    nc2 = (c2 + stride - 1) // stride
                else:
                    nc1, nc2 = c1, c2

                def chunk_body(n):
                    if fine:
                        in1 = n < nc1
                        base = jnp.where(in1, s1 + n * stride,
                                         s2 + (n - nc1) * stride)
                        hi_f = jnp.where(in1, s1 + c1, s2 + c2)
                        lo_row = base * gran
                        hi_row = jnp.minimum(hi_f, base + stride) \
                            * gran
                        r0 = pl.multiple_of(
                            jnp.minimum(lo_row, Wj - ch), gran)
                        row_ok = (row_iota + r0 >= lo_row) \
                            & (row_iota + r0 < hi_row)
                    else:
                        blk = jnp.where(n < c1, s1 + n, s2 + (n - c1))
                        r0 = pl.multiple_of(blk * ch, ch)
                        row_ok = True
                    tile = wref[pl.ds(r0, ch), :]           # (ch, Fpj)

                    if MXU_BCAST == "wide" and not interpret:
                        # ONE wide selector matmul lane-broadcasts ALL
                        # fields per block: (ch, Fpj) @ (Fpj, Fpj*128)
                        # with sel[r, c] = (r == c // 128).  HIGHEST
                        # precision (3-pass f32 decomposition) is exact
                        # for 0/1 selectors and amortises over every
                        # field; nf() is then a static free slice.
                        rows = jax.lax.broadcasted_iota(
                            jnp.int32, (Fpj, Fpj * LANES), 0)
                        cols = jax.lax.broadcasted_iota(
                            jnp.int32, (Fpj, Fpj * LANES), 1)
                        sel = (rows == cols // LANES).astype(F32)
                        bc = jax.lax.dot_general(
                            tile, sel,
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=F32,
                            precision=jax.lax.Precision.HIGHEST)

                        def nf(name):
                            i = fidx_j[name]
                            return bc[:, i * LANES:(i + 1) * LANES]
                    elif MXU_BCAST and not interpret:
                        # per-field selector matmul: tile @ e_i 1^T on
                        # the MXU (f32-exact: 0/1 selector, HIGHEST
                        # precision — the default bf16 pass rounds the
                        # field values ~1e-3 relative).  Measured ~par
                        # with the VPU lane-broadcast once HIGHEST is
                        # on (the 3-pass decomposition costs the gain).
                        rows = jax.lax.broadcasted_iota(
                            jnp.int32, (Fpj, LANES), 0)

                        def nf(name):
                            i = fidx_j[name]
                            sel = (rows == i).astype(F32)
                            return jax.lax.dot_general(
                                tile, sel,
                                dimension_numbers=(((1,), (0,)), ((), ())),
                                preferred_element_type=F32,
                                precision=jax.lax.Precision.HIGHEST)
                    else:
                        def nf(name):
                            i = fidx_j[name]
                            return tile[:, i:i + 1]         # (JB, 1)

                    dz = sf("off2") - nf("off2")
                    # reciprocal-multiply, not a per-pair divide
                    dz = dz - boxz * jnp.round(dz * (1.0 / boxz))
                    dxv = (sf("off0") - (nf("off0") + sx),
                           sf("off1") - (nf("off1") + sy),
                           dz)
                    r2 = (dxv[0] * dxv[0] + dxv[1] * dxv[1]
                          + dxv[2] * dxv[2])
                    ok_extra, sums, maxes = pair_fn(sf, nf, dxv,
                                                    r2, sc)
                    ok = (nf("mask") > 0) & (r2 > 0) & ok_extra \
                        & row_ok
                    w = ok.astype(F32)
                    for q, val in enumerate(sums):
                        acc[q, :, :] = acc[q, :, :] + val * w
                    for q, val in enumerate(maxes):
                        acc[n_sum + q, :, :] = jnp.maximum(
                            acc[n_sum + q, :, :],
                            jnp.where(ok, val, -jnp.inf))

                if DUO_CHUNK and fine:
                    # two chunks per trip: the dependent VMEM slice +
                    # field extraction chains of the two chunks are
                    # independent, hiding the per-trip latency floor;
                    # the odd-tail padding trip self-masks (its row_ok
                    # window is empty by construction)
                    def jblock(q, _):
                        chunk_body(2 * q)
                        chunk_body(2 * q + 1)
                        return 0
                    jax.lax.fori_loop(0, (nc1 + nc2 + 1) // 2, jblock, 0)
                else:
                    def jblock(n, _):
                        chunk_body(n)
                        return 0
                    jax.lax.fori_loop(0, nc1 + nc2, jblock, 0)

            for q in range(n_sum):
                out_ref[q, pl.ds(l0, LANES)] = jnp.sum(acc[q, :, :],
                                                       axis=0)
            for q in range(n_max):
                out_ref[n_sum + q, pl.ds(l0, LANES)] = jnp.max(
                    acc[n_sum + q, :, :], axis=0)
            return 0

        jax.lax.fori_loop(0, n_tiles, tile_body, 0)

    in_specs = [
        pl.BlockSpec((1, 1, 1), lambda c: (c, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, TPC * n_off * 2), lambda c: (c, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, max(n_sc, 1)), lambda c: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((Fp, WI), lambda c: (0, c),
                     memory_space=pltpu.VMEM),
    ]

    def _nbr_map(dx, dy):
        # pure index arithmetic (index maps must not capture arrays)
        def im(c):
            ix, iy = c // ncy, c % ncy
            return ((ix + dx) % ncx * ncy + (iy + dy) % ncy, 0)
        return im

    def _nbr_map_bundled(dx, dy):
        ngy = ncy // 2

        def im(g):
            gx, gy = g // ngy, g % ngy
            return ((2 * gx + dx) % ncx * ncy + (2 * gy + dy) % ncy, 0)
        return im

    nbr_map = _nbr_map_bundled if use_bundle else _nbr_map
    for (dx, dy) in offsets:
        in_specs.append(pl.BlockSpec((Wj, Fpj), nbr_map(dx, dy),
                                     memory_space=pltpu.VMEM))

    out = pl.pallas_call(
        kernel,
        grid=(NPROG,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((n8, WI), lambda c: (0, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n8, Np), F32),
        scratch_shapes=[pltpu.VMEM((n8, ch, LANES), F32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20),
        interpret=interpret,
    )(tcounts, ranges, sc_arr, Xi, *([Xa] * n_off))

    if use_bundle:
        res = _from_bundled(out, ncx, ncy, W)
    else:
        res = out.reshape(n8, Ncol, W)
    sums = [res[q] for q in range(n_sum)]
    maxes = [res[n_sum + q] for q in range(n_max)]
    return sums, maxes
