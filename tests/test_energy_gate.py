"""Self-gravitating hydro energy-conservation gate.

The BASELINE.md acceptance for SmallCosmoVolume-class runs is a relative
energy error < 1e-4.  This is the non-cosmological version of that gate:
a jittered periodic box evolving under SPH + self-gravity (P3M) must
conserve E_kin + E_int + E_pot to < 1e-4 over many KDK steps, using the
full statistics reductions (statistics.c:635 analog).
"""

import dataclasses

import numpy as np

from swift_subtask_dev_tpu.engine import Engine, EngineConfig
from swift_subtask_dev_tpu.grid import CellGrid
from swift_subtask_dev_tpu.io.statistics import species_statistics
from swift_subtask_dev_tpu.models.gravity import GravityParams, GravitySolver
from swift_subtask_dev_tpu.models.sph.sphenix import SPHENIXParams
from swift_subtask_dev_tpu.ics import uniform_box_ic


def test_energy_conservation_selfgrav_hydro():
    ic = uniform_box_ic(n=10, jitter=0.15, seed=5, u0=2e-3)
    P = SPHENIXParams(h_max=float(ic["h"].max() * 3))
    grid = CellGrid.build_for_positions(
        ic["box"],
        interaction_range=float(ic["h"].max() * P.kernel.gamma * 1.3),
        pos=ic["pos"], headroom=1.8)
    gp = GravityParams(G=0.5, eps=0.01, mesh_N=32)
    solver = GravitySolver(gp, grid)
    cfg = EngineConfig(dt_max=2e-4, with_self_gravity=True,
                       p2p_reach=solver.pm.r_cut)
    eng = Engine(grid, P, cfg, 0.0, 1.0,
                 gravity_fn=solver.gas_gravity_fn())
    eng.load_particles(ic["pos"], ic["m"], ic["v"], ic["u"], ic["h"])
    eng.init_particles()

    def total_e():
        st = species_statistics(eng.grid, eng.state)
        return float(st["e_kin"] + st["e_int"] + st["e_pot"]), st

    e0, st0 = total_e()
    scale = abs(float(st0["e_kin"])) + abs(float(st0["e_int"])) \
        + abs(float(st0["e_pot"]))
    for _ in range(40):
        eng.step()
    e1, _ = total_e()
    drift = abs(e1 - e0) / max(scale, 1e-30)
    assert drift < 1e-4, f"energy drift {drift:.3e} over 40 steps"
