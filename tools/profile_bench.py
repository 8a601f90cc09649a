#!/usr/bin/env python
"""Per-phase timing of the BENCH configuration (flat engine + P3M) on the
real TPU, so perf work attacks the measured bottleneck.

Times, with compile excluded and honest host-side materialisation
(block_until_ready is a no-op through axon — sync via np.asarray):
  - flat density / gradient / force passes
  - flat P2P gravity pass
  - PM mesh (CIC + FFT + gather)
  - full hydro_step
Also prints candidate-slot geometry for the column grid.
"""

import time

import numpy as np


def timed(fn, *args, n=8, **kw):
    out = fn(*args, **kw)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    _sync(out)
    return (time.perf_counter() - t0) / n * 1e3


def _sync(out):
    import jax
    leaves = jax.tree_util.tree_leaves(out)
    np.asarray(leaves[0]).ravel()[:1]


def main():
    import jax
    import jax.numpy as jnp

    from swift_subtask_dev_tpu.engine import Engine, EngineConfig
    from swift_subtask_dev_tpu.grid import CellGrid
    from swift_subtask_dev_tpu.models.gravity import (GravityParams,
                                                      GravitySolver)
    from swift_subtask_dev_tpu.models.sph.sphenix import SPHENIXParams
    from swift_subtask_dev_tpu.ics import uniform_box_ic
    from swift_subtask_dev_tpu.ops import hydro_pallas

    import sys
    n1 = 36
    mesh_N = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    ic = uniform_box_ic(n=n1, jitter=0.2, seed=3)
    n_parts = len(ic["pos"])

    P = SPHENIXParams(h_max=float(ic["h"].max() * 3))
    gp = GravityParams(G=1.0, eps=0.5 / n1, mesh_N=mesh_N)
    r_cut = gp.r_cut_ratio * gp.a_smooth * 1.0 / gp.mesh_N
    hydro_reach = float(ic["h"].max() * P.kernel.gamma * 1.25)
    print(f"hydro_reach={hydro_reach:.4f} r_cut={r_cut:.4f}")
    grid = CellGrid.build_columns(
        ic["box"], interaction_range=max(hydro_reach, r_cut * 1.0001),
        pos=ic["pos"])
    print(f"n={n_parts} grid={grid.cdim} K={grid.K} C={grid.C} "
          f"occ={n_parts/(grid.C*grid.K):.2f}")
    solver = GravitySolver(gp, grid)

    eng = Engine(grid, P,
                 EngineConfig(dt_max=2e-4, backend="flat",
                              with_self_gravity=True, eps_soft=gp.eps,
                              eta_grav=gp.eta,
                              p2p_reach=solver.pm.r_cut),
                 0.0, 1.0, gravity_fn=solver.gas_gravity_fn())
    eng.load_particles(ic["pos"], ic["m"], ic["v"], ic["u"], ic["h"])
    eng.init_particles()
    s = eng.state

    d = jax.jit(lambda st: hydro_pallas.density_loop(
        grid, st, P, engine="flat"))
    print(f"density  {timed(d, s):8.2f} ms")

    from swift_subtask_dev_tpu.models.sph.sphenix import CosmoFactors
    cos = CosmoFactors.no_cosmo()
    g = jax.jit(lambda st: hydro_pallas.gradient_loop(
        grid, st, P, cos, engine="flat"))
    print(f"gradient {timed(g, s):8.2f} ms")

    f = jax.jit(lambda st: hydro_pallas.force_loop(
        grid, st, P, cos, engine="flat"))
    print(f"force    {timed(f, s):8.2f} ms")

    p2 = jax.jit(lambda st: hydro_pallas.p2p_gravity_loop(
        grid, st, [st], gp.G, gp.H_soft, solver.pm.r_s, solver.pm.r_cut))
    print(f"p2p grav {timed(p2, s):8.2f} ms")

    mesh_fn = jax.jit(lambda st: solver.accelerations([st]))
    print(f"full grav{timed(mesh_fn, s):8.2f} ms")

    T = eng._tables(dt_drift=2e-4)
    from swift_subtask_dev_tpu.engine import hydro_step
    step = jax.jit(lambda st: hydro_step(grid, P, eng.cfg, eng.gravity_fn,
                                         eng.cosmo, st, T))
    print(f"full step{timed(step, s):8.2f} ms")


if __name__ == "__main__":
    main()


def pm_breakdown():
    import sys
    import jax
    import jax.numpy as jnp
    from swift_subtask_dev_tpu.ops import pm_gravity as pmg
    from swift_subtask_dev_tpu.ics import uniform_box_ic

    mesh_N = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    ic = uniform_box_ic(n=36, jitter=0.2, seed=3)
    pos = jnp.asarray(ic["pos"])
    m = jnp.asarray(ic["m"])
    pm = pmg.PMMeshParams(N=mesh_N, box=(1.0, 1.0, 1.0))

    dep = jax.jit(lambda p_, m_: pmg.cic_deposit(pm, p_, m_))
    print(f"cic_deposit {timed(dep, pos, m):8.2f} ms")
    grid = dep(pos, m)
    pot = jax.jit(lambda g: pmg.long_range_potential(pm, g, 1.0))
    print(f"fft potential {timed(pot, grid):8.2f} ms")
    phi = pot(grid)
    grad = jax.jit(lambda f: pmg.potential_gradient(pm, f))
    print(f"gradient  {timed(grad, phi):8.2f} ms")
    g4 = grad(phi)
    gath = jax.jit(lambda f, p_: pmg.cic_gather_multi(
        pm, [f[k] for k in range(3)] + [phi], p_))
    try:
        print(f"gather x4 {timed(gath, g4, pos):8.2f} ms")
    except Exception as e:
        print("gather skipped:", e)
