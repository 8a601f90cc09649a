#!/usr/bin/env python
"""Per-shard load imbalance under clustering (VERDICT r4 #8).

Builds the Zel'dovich shell-crossed IC, decomposes it into n x-slabs
the way the sharded flat engine does (CellGrid.build_columns
n_shards=), and reports per-shard live-particle counts and the
candidate-row work proxy from the kernel's own range words — for (a)
every feasible slab resolution and (b) the cost-balanced choice the
builder makes.  The reference's analog is the measured-task-cost
ParMETIS repartition (partition.c:1033); under shard_map the only
load-balance knob is WHERE the x boundaries fall, i.e. which multiple
of n_shards the column resolution ncx is.

Usage: python tools/shard_balance.py [n_shards] [n1] [zel_amp]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")

import numpy as np  # noqa: E402


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from bench import zeldovich_ic
    from swift_subtask_dev_tpu.grid import CellGrid
    from swift_subtask_dev_tpu.grid.cellgrid import bucket_fields
    from swift_subtask_dev_tpu.models.sph.sphenix import SPHENIXParams
    from swift_subtask_dev_tpu.ops import pallas_flat

    n_shards = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n1 = int(sys.argv[2]) if len(sys.argv) > 2 else 36
    amp = float(sys.argv[3]) if len(sys.argv) > 3 else 1.2

    ic = zeldovich_ic(n1, amp)
    pos = np.asarray(ic["pos"])
    P = SPHENIXParams(h_max=float(ic["h"].max() * 3))
    reach = float(ic["h"].max() * P.kernel.gamma * 1.25)

    import math
    nx_max = int(math.floor(1.0 / reach))
    print(f"n={len(pos)} clustered (zel amp={amp}); reach={reach:.4f} "
          f"-> feasible ncx {n_shards}..{nx_max}")

    def imbalance(ncx):
        x = np.mod(pos[:, 0], 1.0)
        ix = np.clip((x * ncx).astype(np.int64), 0, ncx - 1)
        per_col = np.bincount(ix, minlength=ncx)
        per_shard = per_col.reshape(n_shards, -1).sum(axis=1)
        return per_shard

    print(" ncx  per-shard counts                          max/mean")
    best = None
    for ncx in range(n_shards, nx_max + 1, n_shards):
        ps = imbalance(ncx)
        r = ps.max() / max(ps.mean(), 1)
        print(f"{ncx:4d}  {ps}  {r:6.3f}")

    grid = CellGrid.build_columns(ic["box"], interaction_range=reach,
                                  pos=pos, n_shards=n_shards)
    ncx = grid.cdim[0]

    def imbalance_rolled(ncx, roll):
        x = np.mod(pos[:, 0], 1.0)
        ix = np.clip((x * ncx).astype(np.int64), 0, ncx - 1)
        per_col = np.roll(np.bincount(ix, minlength=ncx), roll)
        return per_col.reshape(n_shards, -1).sum(axis=1)

    ps = imbalance_rolled(ncx, grid.x_roll)
    print(f"chosen ncx={ncx} x_roll={grid.x_roll}: per-shard {ps}  "
          f"max/mean={ps.max() / ps.mean():.3f}")

    # work proxy: candidate rows per shard from the kernel range words
    base = {"m": jnp.asarray(ic["m"]), "h": jnp.asarray(ic["h"])}
    out, mask, off, nov = bucket_fields(grid, jnp.asarray(pos), base,
                                        zsort=True)
    rng = np.asarray(pallas_flat._block_ranges(
        grid, mask, off[..., 2], out["h"], float(P.kernel.gamma), True,
        jb=16))
    cand = (((rng[..., 0] >> 16) & 0xFFFF)
            + ((rng[..., 1] >> 16) & 0xFFFF)).sum(axis=(1, 2))
    per_shard_work = cand.reshape(n_shards, -1).sum(axis=1)
    print(f"candidate-row work/shard: {per_shard_work}  "
          f"max/mean={per_shard_work.max() / per_shard_work.mean():.3f}")


if __name__ == "__main__":
    main()
