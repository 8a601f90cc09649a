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

    jb = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    ic = uniform_box_ic(n=36, jitter=0.2, seed=3)
    pos = jnp.asarray(ic["pos"])
    grid = CellGrid.build_columns(ic["box"], interaction_range=0.0879,
                                  pos=ic["pos"])
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
                shifts_scale=grid.edge, range_scale=1.0, jb=jb)
            return sums[0]
        return jax.jit(f)

    # A: 1 j-field (m), 1 op
    oA = ["mask", "off0", "off1", "off2", "h", "m"]
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


if __name__ == "__main__":
    main()
