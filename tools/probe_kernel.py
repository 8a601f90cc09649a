#!/usr/bin/env python
"""Isolate the flat-kernel cost components on the TPU:
  A) traversal + 1 j-field, 1 op/pair  -> pure walk/slice overhead
  B) traversal + 8 j-fields, 1 op/pair -> field extraction cost
  C) traversal + 8 j-fields, ~60 dense fma/pair -> compute scaling
Run against the bench geometry so visit counts match production.
"""

import sys
import time

import numpy as np


def timed(fn, *args, n=8):
    import jax
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    return (time.perf_counter() - t0) / n * 1e3


def main():
    import jax
    import jax.numpy as jnp
    from swift_subtask_dev_tpu.grid import CellGrid
    from swift_subtask_dev_tpu.grid.cellgrid import bucket_fields
    from swift_subtask_dev_tpu.ics import uniform_box_ic
    from swift_subtask_dev_tpu.ops import pallas_flat

    jb = int(sys.argv[1]) if len(sys.argv) > 1 else pallas_flat.JB
    # match the bench geometry (mesh_N=128: hydro_reach 0.0621 wins)
    reach = float(sys.argv[2]) if len(sys.argv) > 2 else 0.0621
    ic = uniform_box_ic(n=36, jitter=0.2, seed=3)
    pos = jnp.asarray(ic["pos"])
    grid = CellGrid.build_columns(ic["box"], interaction_range=reach,
                                  pos=ic["pos"])
    pallas_flat.JB = jb
    print(f"grid={grid.cdim} K={grid.K} jb={jb}")
    base = {"m": jnp.asarray(ic["m"]), "h": jnp.asarray(ic["h"]) * 0 + 0.05}
    out, mask, off, nov = bucket_fields(grid, pos, base, zsort=True)
    F = {"mask": mask, "off0": off[..., 0], "off1": off[..., 1],
         "off2": off[..., 2], "h": out["h"], "m": out["m"]}
    for k in range(8):
        F[f"x{k}"] = out["m"] * (k + 1.0)

    def run(fields, order, pair_fn, n_sum):
        def f():
            sums, _ = pallas_flat.pair_apply(
                grid, fields, order, pair_fn, n_sum=n_sum, n_max=0,
                shifts_scale=grid.edge, range_scale=1.0)
            return sums[0]
        return jax.jit(f)

    # exact visited-block count (per pass) from the range words
    rng = pallas_flat._block_ranges(
        grid, F["mask"], F["off2"], F["h"], 1.0, False, jb=jb)
    rr = np.asarray(rng)
    c1 = (rr[..., 0] >> 16) & 0xFFFF
    c2 = (rr[..., 1] >> 16) & 0xFFFF
    nblocks = int((c1 + c2).sum())
    print(f"visited j-blocks/pass: {nblocks}  "
          f"candidate pairs: {nblocks * jb * 128 / 1e6:.1f} M")

    # A00: zero pair work — pure walk (slice + loop + 1 acc update)
    oA = ["mask", "off0", "off1", "off2", "h", "m"]
    f00 = run({k: F[k] for k in oA}, oA,
              lambda sf, nf, dx, r2, sc: (r2 > -1.0, [r2], []), 1)
    print(f"A00 walk only   {timed(f00):8.2f} ms")
    fA = run({k: F[k] for k in oA}, oA,
             lambda sf, nf, dx, r2, sc: (r2 < 0.0036, [nf("m")], []), 1)
    print(f"A walk+1field   {timed(fA):8.2f} ms")

    # B: 8 j-fields read, 1 sum
    oB = oA + [f"x{k}" for k in range(8)]
    def pfB(sf, nf, dx, r2, sc):
        acc = nf("m")
        for k in range(8):
            acc = acc + nf(f"x{k}")
        return r2 < 0.0036, [acc], []
    fB = run({k: F[k] for k in oB}, oB, pfB, 1)
    print(f"B walk+9fields  {timed(fB):8.2f} ms")

    # C: 8 j-fields + 60 fma on the pair grid
    def pfC(sf, nf, dx, r2, sc):
        acc = nf("m") * sf("m")
        v = r2
        for k in range(8):
            x = nf(f"x{k}")
            for _ in range(7):
                v = v * x + acc
        return r2 < 0.0036, [v], []
    fC = run({k: F[k] for k in oB}, oB, pfC, 1)
    print(f"C walk+56fma    {timed(fC):8.2f} ms")

    # D: the fused force-pass transcendental chain per pair:
    # 2x rsqrt + 1 divide + 1 sqrt + 1 exp (+ a few fmas)
    def pfD(sf, nf, dx, r2, sc):
        r_inv = jax.lax.rsqrt(jnp.maximum(r2, 1e-38))
        r = r2 * r_inv
        a = 1.0 / (nf("x0") + sf("m") + 3.0)
        b = jnp.sqrt(jnp.abs(nf("x1") - sf("m")) * a)
        e = jnp.exp(-r2)
        r2b = jax.lax.rsqrt(jnp.maximum(r2 + 1.0, 1e-38))
        return r2 < 0.0036, [r + a + b + e + r2b], []
    fD = run({k: F[k] for k in oB}, oB, pfD, 1)
    print(f"D walk+transc   {timed(fD):8.2f} ms")

    # E: D with pl.reciprocal(approx=True) for the divide and
    # rsqrt-composed sqrt (exp kept, so E-D isolates the divide/sqrt swap)
    from jax.experimental import pallas as pl

    def pfE(sf, nf, dx, r2, sc):
        r_inv = jax.lax.rsqrt(jnp.maximum(r2, 1e-38))
        r = r2 * r_inv
        a = pl.reciprocal(nf("x0") + sf("m") + 3.0, approx=True)
        ab = jnp.abs(nf("x1") - sf("m")) * a
        b = ab * jax.lax.rsqrt(jnp.maximum(ab, 1e-38))
        e = jnp.exp(-r2)
        r2b = jax.lax.rsqrt(jnp.maximum(r2 + 1.0, 1e-38))
        return r2 < 0.0036, [r + a + b + e + r2b], []
    fE = run({k: F[k] for k in oB}, oB, pfE, 1)
    print(f"E approx-recip  {timed(fE):8.2f} ms")


if __name__ == "__main__":
    main()
