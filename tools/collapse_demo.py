#!/usr/bin/env python
"""Clustered-regime capacity demonstration (space_regrid analog at scale).

Cold collapse of a top-hat sphere: N particles at rest self-gravitate,
central density grows by orders of magnitude, and the engine's automatic
re-gridding (RegridNeeded -> host rebuild, engine.py:_with_regrid_retry)
must absorb the contrast without manual intervention — the VERDICT's
"clustered-regime capacity management" gate at >= 1e6 particles.

Usage: python tools/collapse_demo.py [--n 1000000] [--steps 120] [--cpu]
Prints one JSON line: steps, regrids, max density contrast, wall time.
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--steps", type=int, default=120)
    ap.add_argument("--dt", type=float, default=2e-3)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import os
        os.environ["JAX_PLATFORM_NAME"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")

    from swift_subtask_dev_tpu.engine import DMEngine, EngineConfig
    from swift_subtask_dev_tpu.grid import CellGrid
    from swift_subtask_dev_tpu.models.gravity import (GravityParams,
                                                      GravitySolver)

    rng = np.random.default_rng(42)
    # uniform sphere of radius 0.25 in a unit box
    n = args.n
    u = rng.uniform(0, 1, n)
    r = 0.25 * u ** (1 / 3)
    costh = rng.uniform(-1, 1, n)
    phi = rng.uniform(0, 2 * np.pi, n)
    sinth = np.sqrt(1 - costh ** 2)
    pos = 0.5 + np.stack([r * sinth * np.cos(phi),
                          r * sinth * np.sin(phi),
                          r * costh], axis=1)
    m = np.full(n, 1.0 / n, np.float32)

    gp = GravityParams(G=1.0, eps=0.01, mesh_N=64)
    r_cut = gp.r_cut_ratio * gp.a_smooth / gp.mesh_N

    # column layout: the flat Pallas P2P kernel absorbs density contrast
    # with z-block culling (the dense 27-stencil's (C,K,27K) pair tile
    # cannot — K grows with the densest cell and the tile goes K^2)
    grid = CellGrid.build_columns((1.0, 1.0, 1.0), r_cut * 1.0001, pos)
    solver = GravitySolver(gp, grid)

    eng = DMEngine(grid, EngineConfig(dt_max=args.dt, backend="flat",
                                      p2p_reach=solver.pm.r_cut,
                                      eta_grav=gp.eta),
                   0.0, 1e9,
                   gravity_fn=lambda s: solver.accelerations([s])[0],
                   eps_soft=gp.eps)
    eng.solver_builder = lambda g: GravitySolver(gp, g)
    eng.load_dm(pos, m, np.zeros((n, 3), np.float32))
    eng.init_particles()

    k0 = eng.grid.K
    cdim0 = eng.grid.cdim
    regrids = 0
    t0 = time.time()
    last_grid = eng.grid
    for i in range(args.steps):
        eng.step()
        if eng.grid is not last_grid:
            regrids += 1
            last_grid = eng.grid
    wall = time.time() - t0

    # density contrast via cell occupancy
    mask = np.asarray(eng.state["mask"])
    occ = mask.sum(axis=1)
    vol_cell = np.prod(np.asarray(eng.grid.edge))
    contrast = float(occ.max() / max(occ[occ > 0].mean(), 1e-30))
    print(json.dumps({
        "n": n, "steps": args.steps, "wall_s": round(wall, 1),
        "regrids": regrids,
        "grid0": list(cdim0) + [k0],
        "grid1": list(eng.grid.cdim) + [eng.grid.K],
        "occupancy_contrast": round(contrast, 1),
        "n_alive": int(mask.sum()),
    }))
    assert int(mask.sum()) == n, "lost particles during re-gridding"


if __name__ == "__main__":
    main()
