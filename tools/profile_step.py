#!/usr/bin/env python
"""Phase-by-phase timing of the bench step on the real TPU.

Times (compile excluded) each component of the hydro step on the bench.py
configuration so performance work attacks the real bottleneck instead of
the assumed one.
"""

import time

import numpy as np


def timed(fn, *args, n=10, **kw):
    import jax
    out = fn(*args, **kw)          # compile
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3  # ms


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from swift_subtask_dev_tpu.engine import (
        Engine, EngineConfig, _JIT_MULTI, hydro_step)
    from swift_subtask_dev_tpu.grid import CellGrid
    from swift_subtask_dev_tpu.grid.cellgrid import rebucket_offsets
    from swift_subtask_dev_tpu.models.sph.sphenix import SPHENIXParams
    from swift_subtask_dev_tpu.ics import uniform_box_ic
    from swift_subtask_dev_tpu.ops import stencil, hydro_pallas

    n1 = 36
    ic = uniform_box_ic(n=n1, jitter=0.2, seed=3)
    n_parts = len(ic["pos"])

    P = SPHENIXParams(h_max=float(ic["h"].max() * 3))
    grid = CellGrid.build_for_positions(
        ic["box"], interaction_range=float(ic["h"].max() * P.kernel.gamma
                                           * 1.25),
        pos=ic["pos"], headroom=1.6)
    print(f"n={n_parts} grid={grid.cdim} K={grid.K} C={grid.C} "
          f"occupancy={n_parts/(grid.C*grid.K):.2f}")

    cfg = EngineConfig(dt_max=2e-4, backend="xla")
    eng = Engine(grid, P, cfg, 0.0, 1.0)
    eng.load_particles(ic["pos"], ic["m"], ic["v"], ic["u"], ic["h"])
    eng.init_particles()
    s = eng.state
    cosmo = eng.cosmo
    T = eng._tables(dt_drift=2e-4)

    # individual passes
    dens = jax.jit(lambda st: stencil.density_loop(grid, st, P))
    grad = jax.jit(lambda st: stencil.gradient_loop(grid, st, P, cosmo))
    forc = jax.jit(lambda st: stencil.force_loop(grid, st, P, cosmo))
    rebk = jax.jit(lambda st: rebucket_offsets(
        grid, st["mask"], st["off"],
        {k: v for k, v in st.items()
         if k not in ("mask", "off", "drift_accum")}))
    print(f"density_pass_ms={timed(dens, s):.2f}")
    print(f"gradient_pass_ms={timed(grad, s):.2f}")
    print(f"force_pass_ms={timed(forc, s):.2f}")
    print(f"rebucket_ms={timed(rebk, s):.2f}")

    dens_p = jax.jit(lambda st: hydro_pallas.density_loop(grid, st, P))
    forc_p = jax.jit(lambda st: hydro_pallas.force_loop(grid, st, P, cosmo))
    print(f"pallas_density_ms={timed(dens_p, s):.2f}")
    print(f"pallas_force_ms={timed(forc_p, s):.2f}")

    # full step (single launch)
    stepj = jax.jit(lambda st, TT: hydro_step(grid, P, cfg, None, cosmo,
                                              st, TT))
    print(f"full_step_ms={timed(stepj, s, T, n=5):.2f}")

    # ghost iteration count on the fly
    s2, diag = stepj(s, T)
    print(f"ghost_iters={int(diag['n_ghost_iter'])}")

    # batched multi-step (what bench times): per-step cost
    ms = timed(lambda: _JIT_MULTI(grid, P, cfg, None, 16, cosmo, s, T), n=2)
    print(f"multi16_per_step_ms={ms/16:.2f}")
    print(f"implied_rate={n_parts/(ms/16/1e3):.3e} part-steps/s")


if __name__ == "__main__":
    main()
