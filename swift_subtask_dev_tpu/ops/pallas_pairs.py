"""Pallas pair-interaction engine — the hot path of the framework.

This replaces the XLA roll-stencil (ops/stencil.py) for single-chip
execution.  It is the TPU re-design of the reference's hand-vectorized
AVX interaction loops + SoA caches (runner_doiact_hydro_vec.c:2488,
cache.h) — instead of sorting particles along pair axes and walking
sorted ranges, we stream dense cell tiles through VMEM:

* All per-particle fields are packed into one SoA tensor ``X[Cbuf, F, K]``
  whose **leading axis is a halo-padded linearized cell grid**: the 3D
  grid is wrap-padded by one cell per face, so the 27 neighbours of every
  interior cell sit at 27 *static* linear offsets.  The leading axis is
  untiled, so neighbour windows are plain strided DMAs at any offset.
* One Pallas program handles CB consecutive cells: it DMAs its own
  ``(CB, F, K)`` tile plus, double-buffered, the 27 neighbour windows
  (shifted views of the same buffer), computes masked ``(CB, KI, K)``
  pair tiles entirely in VMEM, and writes only the ``(CB, K)``
  reductions.  HBM traffic per pass is O(state), not O(state * K) like
  the XLA roll path.
* The pair physics is injected as a callback receiving broadcast-ready
  arrays — the same ``models/sph/sphenix.py`` term functions run here, in
  the XLA engine and in the brute-force oracle.
"""

from __future__ import annotations

import math
from typing import Callable, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..grid.cellgrid import CellGrid

F32 = jnp.float32

# 27 neighbour offsets (dx, dy, dz)
OFFSETS = [(dx, dy, dz)
           for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)]


def _geometry(grid: CellGrid, CB: int):
    ncx, ncy, ncz = grid.cdim
    nxp, nyp, nzp = ncx + 2, ncy + 2, ncz + 2
    Cp = nxp * nyp * nzp
    deltas = [(dx * nyp + dy) * nzp + dz for (dx, dy, dz) in OFFSETS]
    max_d = max(abs(d) for d in deltas)
    M = int(math.ceil((max_d + 1) / CB)) * CB
    Cpad = int(math.ceil(Cp / CB)) * CB
    return (nxp, nyp, nzp), Cp, Cpad, M, deltas


def _pack(grid: CellGrid, fields: Sequence[jnp.ndarray], CB: int,
          Kp: int, pad_fills=None):
    """(C, K) field list -> halo-padded (Cbuf, F, Kp) tensor.

    Kp is the lane-aligned slot count (>= K, multiple of 128): sub-128
    slot axes waste VPU lanes anyway, so padding costs nothing in compute
    and keeps every DMA slice tile-aligned.
    """
    ncx, ncy, ncz = grid.cdim
    K = grid.K
    (nxp, nyp, nzp), Cp, Cpad, M, deltas = _geometry(grid, CB)
    F = len(fields)
    Fp = int(math.ceil(F / 8)) * 8  # sublane-tile alignment for DMA
    stacked = jnp.stack(fields, axis=1)               # (C, F, K)
    x = stacked.reshape(ncx, ncy, ncz, F, K)
    x = jnp.pad(x, ((1, 1), (1, 1), (1, 1), (0, 0), (0, 0)), mode="wrap")
    x = x.reshape(Cp, F, K)
    x = jnp.pad(x, ((M, Cpad - Cp + M), (0, Fp - F), (0, Kp - K)))
    if pad_fills and Kp > K:
        # division-sensitive fields (h, m, rho, P) must not be zero in the
        # slot-padding region: masked-pair contributions are multiplied by
        # zero, but inf/NaN from 1/0 is not neutralised by that on device
        for fi, fill in pad_fills.items():
            x = x.at[:, fi, K:].set(fill)
    return x, M, Cp, Cpad, deltas


def _unpack(grid: CellGrid, out: jnp.ndarray) -> jnp.ndarray:
    """(n, Cpad, K) -> (n, C, K) interior."""
    ncx, ncy, ncz = grid.cdim
    nxp, nyp, nzp = ncx + 2, ncy + 2, ncz + 2
    Cp = nxp * nyp * nzp
    Kp = out.shape[-1]
    x = out[:, :Cp].reshape(out.shape[0], nxp, nyp, nzp, Kp)
    x = x[:, 1:-1, 1:-1, 1:-1]
    return x.reshape(out.shape[0], grid.C, Kp)[..., :grid.K]


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
               range_scale: float = 0.0,   # used by the flat engine only
               sym_range: bool = False):
    """Run `pair_fn` over all cell pairs of the 27-stencil.

    pair_fn(self_f: name->(CB,KI,1), nbr_f: name->(CB,1,K), dx, r2, sc)
      -> (pair_ok_extra, sums, maxes); sums/maxes are lists of (CB,KI,K)
      arrays reduced by masked sum/max over the last (j) axis.

    `scalars` are runtime scalar parameters (e.g. cosmology factors)
    shipped through SMEM — kernel closures must not capture traced
    constants.

    fields must contain 'mask', 'off0/1/2'.  Returns (sums, maxes) as
    lists of (C, K) arrays.
    """
    K = grid.K
    Kp = max(128, int(math.ceil(K / 128)) * 128)
    if CB <= 0:
        CB = 128 if Kp <= 128 else 64
    # cell-chunk size bounding the (CBc, Kp, Kp) pair temporaries
    CBc = 8
    while CBc * 2 * Kp * Kp * 4 * 16 <= 10 * 2 ** 20 and CBc * 2 <= CB:
        CBc *= 2
    F = int(math.ceil(len(field_order) / 8)) * 8
    fill_by_idx = None
    if pad_fills:
        fill_by_idx = {field_order.index(nm): v
                       for nm, v in pad_fills.items() if nm in field_order}
    X, M, Cp, Cpad, deltas = _pack(
        grid, [fields[name] for name in field_order], CB, Kp,
        fill_by_idx)
    nblocks = Cpad // CB
    fidx = {name: i for i, name in enumerate(field_order)}
    edge = grid.edge

    n_sc = len(scalars)
    # One flat SMEM table: per-offset [delta, sx, sy, sz] rows (padded to
    # 32 — the o+1 prefetch index is computed, though predicated off, at
    # o=26) followed by the runtime scalars.  Deltas ride as f32 (exact
    # for |delta| < 2^24).  The 27-offset fori_loop keeps the Mosaic
    # program 27x smaller than full unrolling.
    rows = [[float(deltas[o]),
             OFFSETS[o][0] * edge[0],
             OFFSETS[o][1] * edge[1],
             OFFSETS[o][2] * edge[2]] for o in range(27)]
    rows += [[0.0, 0.0, 0.0, 0.0]] * 5
    static_part = jnp.asarray([v for row in rows for v in row],
                              jnp.float32)
    if n_sc:
        # scalars may be traced (e.g. per-step cosmology factors)
        dyn = jnp.stack([jnp.asarray(v, jnp.float32) for v in scalars])
        flat = jnp.concatenate([static_part, dyn])
    else:
        flat = static_part
    tab_len = int(flat.shape[0])
    sc_arr = flat.reshape(1, tab_len)

    def kernel(tab_ref, x_hbm, sum_ref, max_ref,
               nbr_buf, acc_s, acc_m, sems):
        sc = tuple(tab_ref[0, 128 + i] for i in range(n_sc))
        b = pl.program_id(0)
        start0 = M + b * CB

        def delta_of(o):
            return tab_ref[0, 4 * o].astype(jnp.int32)

        # NOTE: the self tile lives in slot 2 of the same ring buffer — a
        # DMA into a separate whole scratch ref faults the TPU (observed
        # Mosaic/runtime bug); indexed destinations work.
        self_dma = pltpu.make_async_copy(
            x_hbm.at[pl.ds(start0, CB)], nbr_buf.at[2], sems.at[2])
        self_dma.start()

        def nbr_dma(o, slot):
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(start0 + delta_of(o), CB)],
                nbr_buf.at[slot], sems.at[slot])

        nbr_dma(0, 0).start()
        self_dma.wait()

        S = nbr_buf[2]  # (CB, F, Kp)

        acc_s[:] = jnp.zeros_like(acc_s)
        acc_m[:] = jnp.full_like(acc_m, -jnp.inf)

        def body(o, _):
            slot = jax.lax.rem(o, 2)

            @pl.when(o + 1 < 27)
            def _():
                nbr_dma(o + 1, 1 - slot).start()

            nbr_dma(o, slot).wait()
            Nb = nbr_buf[slot]  # (CB, F, Kp)

            def nf(name):
                return Nb[:, fidx[name], :][:, None, :]  # (CB, 1, Kp)

            sx = tab_ref[0, 4 * o + 1]
            sy = tab_ref[0, 4 * o + 2]
            sz = tab_ref[0, 4 * o + 3]

            # chunk over CELLS (the untiled leading axis): one pair-tile
            # evaluation per fori iteration keeps the Mosaic program small
            def cell_chunk(ci, _):
                c0 = pl.multiple_of(ci * CBc, CBc)
                csl = pl.ds(c0, CBc)

                def sfc(name):
                    # (CBc, Kp, 1): i-side slots of this cell chunk
                    # (read from the ref: pl.ds indexes refs, not values)
                    return nbr_buf[2, csl, fidx[name], :][:, :, None]

                def nfc(name):
                    # (CBc, 1, Kp): j-side slots of the neighbour cells
                    return nbr_buf[slot, csl, fidx[name], :][:, None, :]

                dx = (sfc("off0") - nfc("off0") - sx,
                      sfc("off1") - nfc("off1") - sy,
                      sfc("off2") - nfc("off2") - sz)
                r2 = dx[0] * dx[0] + dx[1] * dx[1] + dx[2] * dx[2]

                ok = (nfc("mask") > 0) & (r2 > 0)
                ok_extra, sums, maxes = pair_fn(sfc, nfc, dx, r2, sc)
                ok = ok & ok_extra
                w = ok.astype(F32)
                for i, val in enumerate(sums):
                    acc_s[i, csl, :] = acc_s[i, csl, :] \
                        + jnp.sum(val * w, axis=2)
                for i, val in enumerate(maxes):
                    acc_m[i, csl, :] = jnp.maximum(
                        acc_m[i, csl, :],
                        jnp.max(jnp.where(ok, val, -jnp.inf), axis=2))
                return 0

            jax.lax.fori_loop(0, CB // CBc, cell_chunk, 0)
            return 0

        jax.lax.fori_loop(0, 27, body, 0)

        sum_ref[:] = acc_s[:]
        max_ref[:] = acc_m[:]

    n_sum_eff = max(n_sum, 1)
    n_max_eff = max(n_max, 1)
    sum_out, max_out = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((1, tab_len), lambda b: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=(
            pl.BlockSpec((n_sum_eff, CB, Kp), lambda b: (0, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_max_eff, CB, Kp), lambda b: (0, b, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_sum_eff, Cpad, Kp), jnp.float32),
            jax.ShapeDtypeStruct((n_max_eff, Cpad, Kp), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((3, CB, F, Kp), jnp.float32),   # ring + self (slot 2)
            pltpu.VMEM((n_sum_eff, CB, Kp), jnp.float32),
            pltpu.VMEM((n_max_eff, CB, Kp), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20),
        interpret=interpret,
    )(sc_arr, X)

    sums = _unpack(grid, sum_out)[:n_sum]
    maxes = _unpack(grid, max_out)[:n_max] if n_max else []
    return list(sums), list(maxes)
