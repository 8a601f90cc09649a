#!/usr/bin/env python
"""Sod shock tube — the reference's HydroTests/SodShock_3D, TPU-native.

Runs the SPHENIX engine on a 3D periodic shock tube and compares the
particle profile at t=0.2 against the exact Riemann solution, printing L1
errors like the reference's plotSolution.py reports visually.

Usage:  python examples/sodshock/run.py [--n 64] [--tend 0.2] [--cpu]
"""

import argparse
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64,
                    help="left-state lattice spacings per unit length")
    ap.add_argument("--tend", type=float, default=0.2)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--plot", type=str, default="")
    args = ap.parse_args()

    if args.cpu:
        import os
        os.environ["JAX_PLATFORM_NAME"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")

    from swift_subtask_dev_tpu.engine import Engine, EngineConfig
    from swift_subtask_dev_tpu.grid import CellGrid, global_positions
    from swift_subtask_dev_tpu.models.sph.sphenix import SPHENIXParams
    from swift_subtask_dev_tpu.ics import sod_shock_ic
    from swift_subtask_dev_tpu.validation import sod_solution
    from swift_subtask_dev_tpu.io.statistics import gas_statistics

    ic = sod_shock_ic(n_l=args.n, y_aspect=0.5)
    print(f"N = {len(ic['pos'])} particles, box = {ic['box']}")

    P = SPHENIXParams(h_max=float(ic["h"].max() * 4))
    grid = CellGrid.build_for_positions(
        ic["box"], interaction_range=float(ic["h"].max() * P.kernel.gamma
                                           * 1.4),
        pos=ic["pos"], headroom=1.8)
    print(f"grid: cdim={grid.cdim} K={grid.K} C={grid.C}")

    eng = Engine(grid, P, EngineConfig(dt_max=1e-2), 0.0, args.tend + 1e-9)
    eng.load_particles(ic["pos"], ic["m"], ic["v"], ic["u"], ic["h"])

    t0 = time.time()
    eng.init_particles()
    print(f"init done in {time.time() - t0:.1f}s")
    st0 = gas_statistics(eng.state)

    t0 = time.time()
    nsteps = eng.run(args.tend)
    elapsed = time.time() - t0
    st1 = gas_statistics(eng.state)
    n_parts = len(ic["pos"])
    print(f"{nsteps} steps in {elapsed:.1f}s  "
          f"({nsteps * n_parts / elapsed:.3e} particle-steps/s)")

    de = abs(float(st1["e_tot"]) - float(st0["e_tot"])) / float(st0["e_tot"])
    print(f"energy drift: {de:.2e}")

    # gather profile
    s = eng.state
    mask = np.asarray(s["mask"]) > 0
    pos = global_positions(grid, np.asarray(s["off"]))[mask.nonzero()[0] if False else mask]
    rho = np.asarray(s["rho"])[mask]
    v = np.asarray(s["v_full"])[mask]
    u = np.asarray(s["u_full"])[mask]
    x = pos[:, 0]

    # exact solution (contact at x0=1; ignore the second discontinuity at
    # x=0/2 by only checking 0.35 < x < 1.75)
    sel = (x > 0.35) & (x < 1.75)
    rho_ex, v_ex, P_ex = sod_solution(x[sel], eng.time)
    l1_rho = np.mean(np.abs(rho[sel] - rho_ex)) / rho_ex.mean()
    l1_v = np.mean(np.abs(v[sel, 0] - v_ex))
    print(f"t = {eng.time:.4f}")
    print(f"L1(rho)/mean = {l1_rho:.4f}")
    print(f"L1(vx)       = {l1_v:.4f}")

    if args.plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        xs = np.linspace(0.3, 1.8, 500)
        re, ve, pe = sod_solution(xs, eng.time)
        fig, axes = plt.subplots(1, 3, figsize=(14, 4))
        for ax, (data, exact, name) in zip(axes, [
                (rho[sel], re, "rho"), (v[sel, 0], ve, "vx"),
                ((5 / 3 - 1) * rho[sel] * u[sel], pe, "P")]):
            ax.plot(x[sel], data, ".", ms=1, alpha=0.3)
            ax.plot(xs, exact, "r-", lw=1)
            ax.set_title(name)
        fig.savefig(args.plot, dpi=120)
        print(f"wrote {args.plot}")

    ok = l1_rho < 0.05 and de < 1e-3
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
