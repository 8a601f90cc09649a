#!/usr/bin/env python
"""Pass-by-pass timing of the bench step on the current backend.

Times, each as its own jitted launch on the bench geometry:
  density    one density pass (flat kernel)
  gradient   one gradient pass
  force      unfused force pass
  force+grav fused force + P2P gravity pass
  p2p        standalone P2P gravity pass
  rebucket   zsort counting-sort rebuild
  mesh       PM long-range (CIC + FFT + gradient + gather)
  step       the full engine step (per_launch=1)

plus the candidate-pair diagnostic: candidate j-rows per i-tile per pass
from the range words vs the measured mean neighbour count — the
waste factor the banded-kernel work targets (VERDICT round 3 #1).

Usage: python tools/profile_step.py [n1] (default 36 = 93k particles)
Env: BENCH_MESH_N, BENCH_SLACK as in bench.py.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args, n=16, **kw):
    import jax
    out = fn(*args, **kw)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    return (time.perf_counter() - t0) / n * 1e3


def main():
    import jax
    import jax.numpy as jnp
    from swift_subtask_dev_tpu.engine import (Engine, EngineConfig,
                                              _NO_COSMO_LIT)
    from swift_subtask_dev_tpu.grid import CellGrid
    from swift_subtask_dev_tpu.grid.cellgrid import rebucket_offsets
    from swift_subtask_dev_tpu.models.gravity import (GravityParams,
                                                      GravitySolver)
    from swift_subtask_dev_tpu.models.sph.sphenix import SPHENIXParams
    from swift_subtask_dev_tpu.ics import uniform_box_ic
    from swift_subtask_dev_tpu.ops import hydro_pallas, pallas_flat

    n1 = int(sys.argv[1]) if len(sys.argv) > 1 else 36
    mesh_N = int(os.environ.get("BENCH_MESH_N", "128"))
    slack = float(os.environ.get("BENCH_SLACK", "1.25"))

    ic = uniform_box_ic(n=n1, jitter=0.2, seed=3)
    n_parts = len(ic["pos"])
    P = SPHENIXParams(h_max=float(ic["h"].max() * 3))
    gp = GravityParams(G=1.0, eps=0.5 / n1, mesh_N=mesh_N)
    hydro_reach = float(ic["h"].max() * P.kernel.gamma * slack)
    r_cut = gp.r_cut_ratio * gp.a_smooth / gp.mesh_N
    grid = CellGrid.build_columns(
        ic["box"], interaction_range=max(hydro_reach, r_cut * 1.15),
        pos=ic["pos"])
    solver = GravitySolver(gp, grid)
    cfg = EngineConfig(dt_max=2e-4, backend="flat", with_self_gravity=True,
                       eps_soft=gp.eps, eta_grav=gp.eta,
                       mesh_dt_max=64 * 2e-4, p2p_reach=solver.pm.r_cut)
    eng = Engine(grid, P, cfg, 0.0, 1.0,
                 gravity_fn=solver.gas_short_range_fn(),
                 mesh_fn=solver.gas_mesh_fn(),
                 mesh_dt_scale=solver.pm.r_s)
    eng.load_particles(ic["pos"], ic["m"], ic["v"], ic["u"], ic["h"])
    eng.init_particles()
    eng.run_fixed_dt(4, per_launch=1)   # settle h, fill all fields
    s = dict(eng.state)
    fs = eng.gravity_fn.fuse_spec
    print(f"n={n_parts} grid={grid.cdim} K={grid.K} mesh_N={mesh_N} "
          f"r_cut={solver.pm.r_cut:.4f} reach={hydro_reach:.4f} "
          f"JB={pallas_flat.JB}")

    # --- candidate diagnostic -------------------------------------------
    F = {"mask": s["mask"], "off2": s["off"][..., 2], "h": s["h"]}
    gran = 16
    rng = np.asarray(pallas_flat._block_ranges(
        grid, F["mask"], F["off2"], F["h"], float(P.kernel.gamma), True,
        jb=gran, reach_floor=float(solver.pm.r_cut)))
    cand_rows = ((rng[..., 0] >> 16) & 0xFFFF) \
        + ((rng[..., 1] >> 16) & 0xFFFF)
    n_tiles_live = (np.asarray(s["mask"]).reshape(
        grid.C, -1, 128).sum(2) > 0).sum()
    mean_cand = float(cand_rows.reshape(grid.C, -1, 9).sum(2).sum()
                      / max(n_tiles_live, 1)) * gran
    msk = np.asarray(s["mask"])
    ngb = float((np.asarray(s["wcount"]) * (4 / 3 * np.pi)
                 * (np.asarray(s["h"]) * P.kernel.gamma) ** 3
                 * msk).sum() / msk.sum())
    print(f"candidate j-rows/i-tile (fused reach): {mean_cand:.0f}  "
          f"~true ngb/particle: {ngb:.0f}  waste x{mean_cand / max(ngb,1):.1f}")

    # --- per-pass timings -----------------------------------------------
    akw = {}
    dens = jax.jit(lambda st: hydro_pallas.density_loop(
        grid, st, P, engine="flat", **akw))
    grad = jax.jit(lambda st: hydro_pallas.gradient_loop(
        grid, st, P, _NO_COSMO_LIT, engine="flat", **akw))
    forc = jax.jit(lambda st: hydro_pallas.force_loop(
        grid, st, P, _NO_COSMO_LIT, engine="flat", **akw))
    fgrv = jax.jit(lambda st: hydro_pallas.force_gravity_loop(
        grid, st, P, _NO_COSMO_LIT, **fs, **akw))
    p2p = jax.jit(lambda st: hydro_pallas.p2p_gravity_loop(
        grid, st, [st], fs["G"], fs["H_soft"], fs["r_s"], fs["r_cut"]))
    rebk = jax.jit(lambda m, off, f: rebucket_offsets(
        grid, m, off, f, zsort=True))
    mesh = jax.jit(lambda st: solver.mesh_accelerations([st])[0])

    fkeys = [k for k in s if k not in ("mask", "off")
             and getattr(s[k], "ndim", 0) >= 2]
    print(f"density     {timed(dens, s):8.2f} ms")
    print(f"gradient    {timed(grad, s):8.2f} ms")
    print(f"force       {timed(forc, s):8.2f} ms")
    print(f"force+grav  {timed(fgrv, s):8.2f} ms")
    print(f"p2p alone   {timed(p2p, s):8.2f} ms")
    print(f"rebucket    {timed(rebk, s['mask'], s['off'], {k: s[k] for k in fkeys}):8.2f} ms")
    print(f"mesh (PM)   {timed(mesh, {k: s[k] for k in ('mask', 'off', 'm')}):8.2f} ms")

    t0 = time.time()
    eng.run_fixed_dt(16, per_launch=16)
    np.asarray(eng.state["rho"])
    t16 = time.time() - t0
    eng.run_fixed_dt(16, per_launch=16)
    t0 = time.time()
    eng.run_fixed_dt(16, per_launch=16)
    np.asarray(eng.state["rho"])
    t16 = time.time() - t0
    print(f"full step   {t16 / 16 * 1e3:8.2f} ms   (fused 16-launch)")


if __name__ == "__main__":
    main()
