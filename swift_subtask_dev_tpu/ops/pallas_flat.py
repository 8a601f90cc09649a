"""Column/z-sorted Pallas pair engine — the pseudo-Verlet TPU kernel.

This is the TPU re-creation of SWIFT's sorted interaction machinery
(src/sort_part.h:42, runner_doiact_functions_hydro.h DOPAIR1): the
reference sorts particles along the pair axis and only walks overlapping
sorted ranges; here the domain is decomposed into **(x, y) columns** (a
CellGrid with cdim=(ncx, ncy, 1)), particles are kept **z-sorted inside
each column tile**, and the kernel walks, for each 128-particle i-tile,
only the z-overlapping 32-row blocks of its 9 neighbour columns:

* i-side: (F, W) SoA column blocks — fields are rows, particles lanes;
  i-tiles are 128-lane slices, so there is no per-cell padding waste.
* j-side: the 9 neighbour columns arrive as (W, F) AoS row windows via
  standard BlockSpec pipelining (index maps compute the wrapped
  neighbour-column id), one fetch per column per pass.
* The block-level work list is decided OUTSIDE the kernel: XLA computes,
  per (i-tile, neighbour), a 32-bit mask of which 32-row j-blocks
  z-overlap the tile's reach-inflated z-range (periodic) and are within
  the column's live count.  The kernel just tests bits — no per-block
  loads or reductions for skipped work.

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

JB = 32          # default j-block rows (z-skip granularity); NBLK <= 32
LANES = 128      # i-tile width


def _jb_for(Wj: int) -> int:
    """Block rows for a column capacity: the bitmask word holds 32 bits,
    so JB doubles (32 -> 64 -> 128...) as W grows past 1024; W is always
    a multiple of 128 (build_columns w_align) so JB divides it."""
    jb = JB
    while Wj // jb > 32:
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


def _block_masks(grid: CellGrid, maskf, zf, hf, gamma: float,
                 sym_range: bool, maskf_j=None, zf_j=None, hf_j=None,
                 jb: int = JB):
    """(Ncol, TPC, 9) i32 bitmasks of live z-overlapping j-blocks.

    When the j-side arrays are given (cross-species loops: the i tiles of
    one species against the column blocks of another), the block windows
    come from the j species' layout (its own W_j / NBLK_j); otherwise the
    loop is the usual self-pairing.
    """
    ncx, ncy, Ncol = _column_geometry(grid)
    W = maskf.shape[1]
    TPC = W // LANES
    boxz = jnp.float32(grid.box[2])
    live = maskf > 0
    if maskf_j is None:
        maskf_j, zf_j, hf_j = maskf, zf, hf
    live_j = maskf_j > 0
    NBLK = maskf_j.shape[1] // jb

    zi = jnp.where(live, zf, jnp.inf).reshape(Ncol, TPC, LANES)
    iz_lo = jnp.min(zi, axis=2)                                # (Ncol,TPC)
    iz_hi = jnp.max(jnp.where(jnp.isfinite(zi), zi, -jnp.inf), axis=2)
    hmax_tile = jnp.max(
        jnp.where(live, hf, 0.0).reshape(Ncol, TPC, LANES), axis=2)
    hmax_col = jnp.max(jnp.where(live_j, hf_j, 0.0), axis=1)   # (Ncol,)

    zb = jnp.where(live_j, zf_j, jnp.inf).reshape(Ncol, NBLK, jb)
    jb_lo = jnp.min(zb, axis=2)                                # (Ncol,NBLK)
    jb_hi = jnp.max(jnp.where(jnp.isfinite(zb), zb, -jnp.inf), axis=2)

    nbr = jnp.asarray(nbr_col_table(grid))                     # (Ncol, 9)
    # (Ncol, TPC, 9, NBLK) overlap: |wrap(jc - ic)| <= halves + reach
    ic = 0.5 * (iz_lo + iz_hi)[:, :, None, None]
    ih = 0.5 * (iz_hi - iz_lo)[:, :, None, None]
    jlo = jb_lo[nbr][:, None, :, :]                            # (Ncol,1,9,NBLK)
    jhi = jb_hi[nbr][:, None, :, :]
    jc = 0.5 * (jlo + jhi)
    jh = 0.5 * (jhi - jlo)
    if sym_range:
        reach = jnp.float32(gamma) * jnp.maximum(
            hmax_tile[:, :, None, None], hmax_col[nbr][:, None, :, None])
    else:
        reach = jnp.float32(gamma) * hmax_tile[:, :, None, None]
    dz = jc - ic
    dz = dz - boxz * jnp.round(dz / boxz)
    ok = (jnp.abs(dz) <= ih + jh + reach) & jnp.isfinite(jc) \
        & jnp.isfinite(ic)
    bits = jnp.sum(
        jnp.where(ok, (1 << jnp.arange(NBLK, dtype=I32)), 0),
        axis=3).astype(I32)                                    # (Ncol,TPC,9)
    return bits


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
               field_order_j: Sequence[str] = None):
    """Run ``pair_fn`` over all pairs of the column/z-sorted layout.

    fields are (Ncol, W) tiles, z-sorted within each column (the engine's
    flat-backend state).  Returns (sums, maxes) as lists of (Ncol, W)
    arrays; max outputs are -inf where a slot had no accepted pair.

    Cross-species loops (BH/star density, multi-species gravity) pass
    ``fields_j``/``field_order_j``: the i-side tiles come from ``fields``
    and the j-side windows from ``fields_j`` — both on the same column
    grid, each with its own per-column capacity.
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
    jb = _jb_for(Wj)
    assert W % LANES == 0 and Wj % jb == 0 and Wj // jb <= 32
    TPC = W // LANES
    NBLK = Wj // jb
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

    # ---- SoA (F, Np) for i-side lane blocks -----------------------------
    Xi = jnp.stack([fields[n].reshape(Np) for n in field_order], axis=0)
    if Fp > F:
        Xi = jnp.pad(Xi, ((0, Fp - F), (0, 0)))
    # ---- AoS (Npj, Fpj) for j-side row windows --------------------------
    Xa = jnp.stack([fields_j[n].reshape(Npj) for n in field_order_j],
                   axis=1)
    if Fpj > Fj:
        Xa = jnp.pad(Xa, ((0, 0), (0, Fpj - Fj)))

    counts = jnp.sum(fields["mask"] > 0, axis=1).astype(I32) \
        .reshape(1, Ncol)
    bits = _block_masks(
        grid, fields["mask"], fields["off2"], fields["h"],
        range_scale, sym_range,
        *((fields_j["mask"], fields_j["off2"], fields_j["h"])
          if cross else (None, None, None)),
        jb=jb).reshape(1, Ncol * TPC * 9)

    n_sc = len(scalars)
    sc_arr = (jnp.stack([jnp.asarray(v, F32) for v in scalars])
              if n_sc else jnp.zeros((1,), F32)).reshape(1, -1)

    def kernel(counts_ref, bits_ref, tab_ref, xi_ref, *rest):
        wrefs = rest[:9]
        out_ref = rest[9]
        acc = rest[10]
        col = pl.program_id(0)
        my_count = counts_ref[0, col]
        sc = tuple(tab_ref[0, i] for i in range(n_sc))
        out_ref[:] = jnp.zeros_like(out_ref)
        n_tiles = (my_count + (LANES - 1)) // LANES

        def tile_body(it, _):
            l0 = pl.multiple_of(it * LANES, LANES)

            def sf(name):
                return xi_ref[fidx[name], pl.ds(l0, LANES)][None, :]

            for q in range(n_sum):
                acc[q, :] = jnp.zeros_like(acc[q, :])
            for q in range(n_max):
                acc[n_sum + q, :] = jnp.full_like(acc[n_sum + q, :],
                                                  -jnp.inf)

            for o, (dx, dy) in enumerate(OFFSETS_9):
                wref = wrefs[o]
                word = bits_ref[0, (col * TPC + it) * 9 + o]
                sx = jnp.float32(dx * ex)
                sy = jnp.float32(dy * ey)

                def jblock(blk, _):
                    @pl.when((word >> blk) & 1 != 0)
                    def _():
                        r0 = pl.multiple_of(blk * jb, jb)
                        tile = wref[pl.ds(r0, jb), :]       # (jb, Fpj)

                        def nf(name):
                            i = fidx_j[name]
                            return tile[:, i:i + 1]         # (JB, 1)

                        dz = sf("off2") - nf("off2")
                        dz = dz - boxz * jnp.round(dz / boxz)
                        dxv = (sf("off0") - (nf("off0") + sx),
                               sf("off1") - (nf("off1") + sy),
                               dz)
                        r2 = (dxv[0] * dxv[0] + dxv[1] * dxv[1]
                              + dxv[2] * dxv[2])
                        ok_extra, sums, maxes = pair_fn(sf, nf, dxv,
                                                        r2, sc)
                        ok = (nf("mask") > 0) & (r2 > 0) & ok_extra
                        w = ok.astype(F32)
                        for q, val in enumerate(sums):
                            acc[q, :] = acc[q, :] + jnp.sum(
                                val * w, axis=0)
                        for q, val in enumerate(maxes):
                            acc[n_sum + q, :] = jnp.maximum(
                                acc[n_sum + q, :],
                                jnp.max(jnp.where(ok, val, -jnp.inf),
                                        axis=0))
                    return 0

                jax.lax.fori_loop(0, NBLK, jblock, 0)

            for q in range(n_out):
                out_ref[q, pl.ds(l0, LANES)] = acc[q, :]
            return 0

        jax.lax.fori_loop(0, n_tiles, tile_body, 0)

    in_specs = [
        pl.BlockSpec((1, Ncol), lambda c: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, Ncol * TPC * 9), lambda c: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, max(n_sc, 1)), lambda c: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((Fp, W), lambda c: (0, c),
                     memory_space=pltpu.VMEM),
    ]
    def _nbr_map(dx, dy):
        # pure index arithmetic (index maps must not capture arrays)
        def im(c):
            ix, iy = c // ncy, c % ncy
            return ((ix + dx) % ncx * ncy + (iy + dy) % ncy, 0)
        return im

    for (dx, dy) in OFFSETS_9:
        in_specs.append(pl.BlockSpec((Wj, Fpj), _nbr_map(dx, dy),
                                     memory_space=pltpu.VMEM))

    out = pl.pallas_call(
        kernel,
        grid=(Ncol,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((n8, W), lambda c: (0, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n8, Np), F32),
        scratch_shapes=[pltpu.VMEM((n8, LANES), F32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20),
        interpret=interpret,
    )(counts, bits, sc_arr, Xi, *([Xa] * 9))

    res = out.reshape(n8, Ncol, W)
    sums = [res[q] for q in range(n_sum)]
    maxes = [res[n_sum + q] for q in range(n_max)]
    return sums, maxes
