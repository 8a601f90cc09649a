#!/usr/bin/env python
"""Sedov-Taylor blast — the reference's HydroTests/SedovBlast_3D.

Point-like energy injection into a uniform medium; the blast wave radius
follows r_sh = 1.1517 (E t^2 / rho)^{1/5}.  This exercises exactly what
the reference designed its ghost machinery for: a huge dynamic range of
smoothing lengths and per-particle time bins around the shock.

Usage: python examples/sedov/run.py [--n 32] [--tend 0.05] [--cpu]
"""

import argparse
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=32)
    ap.add_argument("--tend", type=float, default=0.05)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--backend", default="xla", choices=["xla", "pallas"])
    args = ap.parse_args()

    if args.cpu:
        import os
        os.environ["JAX_PLATFORM_NAME"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    from swift_subtask_dev_tpu.engine import Engine, EngineConfig
    from swift_subtask_dev_tpu.grid import CellGrid, global_positions
    from swift_subtask_dev_tpu.models.sph.sphenix import SPHENIXParams
    from swift_subtask_dev_tpu.ics import sedov_ic
    from swift_subtask_dev_tpu.io.statistics import gas_statistics

    ic = sedov_ic(n=args.n, E0=1.0)
    n_parts = len(ic["pos"])
    print(f"N = {n_parts}")

    # grid sized for blast-driven h growth; h_max capped just under the
    # stencil reach so the engine's regrid guard never trips (SWIFT's
    # equivalent: h_max + space_regrid, space.c)
    grid = CellGrid.build_for_positions(
        ic["box"], float(ic["h"].max() * 3.2),
        ic["pos"], headroom=2.2)
    P = SPHENIXParams(h_max=float(min(grid.edge) / 1.825742 * 0.98),
                      CFL=0.1)
    print(f"grid: {grid.cdim} K={grid.K} h_max={P.h_max:.3f}")

    eng = Engine(grid, P,
                 EngineConfig(dt_max=1e-3, backend=args.backend),
                 0.0, args.tend + 1e-9)
    eng.load_particles(ic["pos"], ic["m"], ic["v"], ic["u"], ic["h"])
    eng.init_particles()
    st0 = gas_statistics(eng.state)

    t0 = time.time()
    nsteps = eng.run(args.tend)
    print(f"{nsteps} steps in {time.time()-t0:.1f}s; t={eng.time:.4f}")
    st1 = gas_statistics(eng.state)
    de = abs(float(st1["e_tot"]) - float(st0["e_tot"])) \
        / abs(float(st0["e_tot"]))
    print(f"energy drift: {de:.2e}")

    # shock radius check: density peak vs Sedov prediction
    s = eng.state
    mask = np.asarray(s["mask"]) > 0
    pos = global_positions(grid, np.asarray(s["off"]))[mask]
    rho = np.asarray(s["rho"])[mask]
    r = np.linalg.norm(pos - 0.5, axis=1)
    r_sh_expect = 1.15167 * (1.0 * eng.time ** 2) ** 0.2
    # density-weighted shock radius from particles near the peak
    sel = rho > 0.5 * rho.max()
    r_sh = np.median(r[sel])
    err = abs(r_sh - r_sh_expect) / r_sh_expect
    print(f"shock radius: {r_sh:.4f} vs Sedov {r_sh_expect:.4f} "
          f"(err {err:.1%})")
    ok = err < 0.10 and de < 0.05
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
