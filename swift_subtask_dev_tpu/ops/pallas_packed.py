"""Packed-j Pallas pair engine — dense pair tiles at full lane occupancy.

Second-generation Pallas path (supersedes the ring-buffer DMA engine of
ops/pallas_pairs.py for single-chip hot loops).  Two structural wins over
both the XLA roll-stencil and the ring kernel:

* **Full j-lane packing**: the 27 rolled neighbour views are concatenated
  on the slot axis *outside* the kernel into one ``(C, F, 27K)`` buffer
  (stencil shift folded into the packed offsets), so the kernel's pair
  tiles are ``(8, 27K->lane-padded)`` — ~99% lane occupancy, where the
  ring kernel padded every neighbour cell to 128 lanes (2.3x waste at
  K=56).
* **i-row-block skipping**: the counting-sort rebuild front-packs real
  particles per cell, so a per-cell count table (SMEM) lets the kernel
  skip whole 8-sublane i-blocks of padding — the analog of the
  reference's per-cell ``count`` loops never touching unused part array
  tails (runner_doiact_functions_hydro.h DOSELF1 iterates count, not
  capacity).

The pair physics is injected through the same callback protocol as
pallas_pairs.pair_apply, so ops/hydro_pallas.py drives either engine with
identical scheme term functions (models/sph/*.py).
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
from .stencil import STENCIL_27

F32 = jnp.float32


def _roll(arr, d):
    if d == (0, 0, 0):
        return arr
    return jnp.roll(arr, shift=(-d[0], -d[1], -d[2]), axis=(0, 1, 2))


def pair_apply(grid: CellGrid,
               fields: Dict[str, jnp.ndarray],
               field_order: Sequence[str],
               pair_fn: Callable,
               n_sum: int, n_max: int,
               shifts_scale: Tuple[float, float, float],
               CB: int = 8,
               scalars: Sequence[jnp.ndarray] = (),
               pad_fills=None,
               interpret: bool = False,
               range_scale: float = 0.0,   # used by the flat engine only
               sym_range: bool = False):
    """Run ``pair_fn`` over all pairs via packed-j dense tiles.

    Same contract as pallas_pairs.pair_apply: ``pair_fn(sf, nf, dx, r2,
    sc) -> (ok_extra, sums, maxes)`` with sf/nf returning broadcast-ready
    i/j views of a named field.  Returns (sums, maxes) as lists of (C, K)
    arrays; max outputs are -inf where a slot had no accepted pair.
    """
    K = grid.K
    C = grid.C
    F = len(field_order)
    J = 27 * K
    Jp = int(math.ceil(J / 128)) * 128
    K8 = int(math.ceil(K / 8)) * 8
    F8 = int(math.ceil(F / 8)) * 8
    Fp = 128
    Cpad = int(math.ceil(C / CB)) * CB
    n_out = n_sum + n_max
    assert n_out <= 128 and F <= Fp
    pad_fills = pad_fills or {}
    edge = grid.edge
    fidx = {name: i for i, name in enumerate(field_order)}

    # ---- packed j buffer (Cpad, F8, Jp) -----------------------------------
    # One stacked (nx,ny,nz,F,K) tensor rolled 27 times and concatenated on
    # the slot axis; the periodic stencil shift is folded into the off
    # fields via a per-offset constant added to just those F-rows.
    stacked = jnp.stack([fields[name] for name in field_order], axis=1)
    gv = stacked.reshape(grid.cdim + (F, K))
    shift_rows = np.zeros((27, F, 1), np.float32)
    for o, d in enumerate(STENCIL_27):
        for ax in range(3):
            nm = f"off{ax}"
            if nm in fidx:
                shift_rows[o, fidx[nm], 0] = d[ax] * edge[ax]
    rolls = [_roll(gv, d) + jnp.asarray(shift_rows[o])
             for o, d in enumerate(STENCIL_27)]
    Xj = jnp.concatenate(rolls, axis=4).reshape(C, F, J)
    # lane + cell padding; division-sensitive fields carry their pad fill
    lane_fill = np.zeros((F, 1), np.float32)
    for name, v in pad_fills.items():
        if name in fidx:
            lane_fill[fidx[name], 0] = v
    Xj = jnp.concatenate(
        [Xj, jnp.broadcast_to(jnp.asarray(lane_fill), (C, F, Jp - J))],
        axis=2) if Jp > J else Xj
    Xj = jnp.pad(Xj, ((0, Cpad - C), (0, F8 - F), (0, 0)))

    # ---- transposed i buffer (Cpad, K8, Fp): slots on sublanes ----------
    rows = []
    for name in field_order:
        fill = jnp.float32(pad_fills.get(name, 0.0))
        fv = jnp.pad(fields[name], ((0, Cpad - C), (0, K8 - K)),
                     constant_values=fill)
        rows.append(fv)
    Xi = jnp.stack(rows, axis=2)                      # (Cpad, K8, F)
    Xi = jnp.pad(Xi, ((0, 0), (0, 0), (0, Fp - F)))

    # ---- per-cell particle counts (SMEM) --------------------------------
    counts = jnp.sum(fields["mask"] > 0, axis=1).astype(jnp.int32)
    counts = jnp.pad(counts, (0, Cpad - C)).reshape(1, Cpad)

    n_sc = len(scalars)
    sc_arr = (jnp.stack([jnp.asarray(v, F32) for v in scalars])
              if n_sc else jnp.zeros((1,), F32)).reshape(1, -1)

    nrb = K8 // 8

    def kernel(counts_ref, tab_ref, xi_ref, xj_ref, out_ref):
        b = pl.program_id(0)
        sc = tuple(tab_ref[0, i] for i in range(n_sc))
        out_ref[:] = jnp.zeros_like(out_ref)
        lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)

        def nf(c, name):
            return xj_ref[c, fidx[name], :][None, :]          # (1, Jp)

        def cell_body(c, _):
            count = counts_ref[0, b * CB + c]
            # hoist the j-side loads shared by every i-row-block
            joff = (nf(c, "off0"), nf(c, "off1"), nf(c, "off2"))
            jmask = nf(c, "mask")

            def rb_body(rb, _):
                @pl.when(rb * 8 < count)
                def _():
                    r0 = pl.multiple_of(rb * 8, 8)
                    itile = xi_ref[c, pl.ds(r0, 8), :]        # (8, Fp)

                    def sf(name):
                        i = fidx[name]
                        return itile[:, i:i + 1]              # (8, 1)

                    dx = (sf("off0") - joff[0],
                          sf("off1") - joff[1],
                          sf("off2") - joff[2])
                    r2 = dx[0] * dx[0] + dx[1] * dx[1] + dx[2] * dx[2]
                    ok_extra, sums, maxes = pair_fn(
                        sf, lambda nm: nf(c, nm), dx, r2, sc)
                    ok = (jmask > 0) & (r2 > 0) & ok_extra
                    w = ok.astype(F32)
                    tile = jnp.zeros((8, 128), F32)
                    q = 0
                    for val in sums:
                        res = jnp.sum(val * w, axis=1, keepdims=True)
                        tile = jnp.where(lane == q, res, tile)
                        q += 1
                    for val in maxes:
                        res = jnp.max(jnp.where(ok, val, -jnp.inf),
                                      axis=1, keepdims=True)
                        tile = jnp.where(lane == q, res, tile)
                        q += 1
                    out_ref[c, pl.ds(r0, 8), :] = tile
                return 0

            jax.lax.fori_loop(0, nrb, rb_body, 0)
            return 0

        jax.lax.fori_loop(0, CB, cell_body, 0)

    out = pl.pallas_call(
        kernel,
        grid=(Cpad // CB,),
        in_specs=[
            pl.BlockSpec((1, Cpad), lambda b: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, max(n_sc, 1)), lambda b: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((CB, K8, Fp), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CB, F8, Jp), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((CB, K8, 128), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Cpad, K8, 128), F32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20),
        interpret=interpret,
    )(counts, sc_arr, Xi, Xj)

    res = out[:C, :K, :n_out]                          # (C, K, n_out)
    sums = [res[..., q] for q in range(n_sum)]
    maxes = [res[..., n_sum + q] for q in range(n_max)]
    return sums, maxes
