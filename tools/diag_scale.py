"""Diagnose the BENCH_N1=56 stall: stage-timestamped bench replica."""
import os, sys, time
import numpy as np

t00 = time.time()
def log(msg):
    print(f"[{time.time()-t00:8.1f}s] {msg}", flush=True)

N1 = int(os.environ.get("BENCH_N1", "56"))
MESH_N = int(os.environ.get("BENCH_MESH_N", "96"))

import jax
log("jax imported")

from swift_subtask_dev_tpu.engine import Engine, EngineConfig
from swift_subtask_dev_tpu.grid import CellGrid
from swift_subtask_dev_tpu.models.gravity import GravityParams, GravitySolver
from swift_subtask_dev_tpu.models.sph.sphenix import SPHENIXParams
from swift_subtask_dev_tpu.ics import uniform_box_ic

ic = uniform_box_ic(n=N1, jitter=0.2, seed=3)
n_parts = len(ic["pos"])
log(f"ic done n={n_parts}")

P = SPHENIXParams(h_max=float(ic["h"].max() * 3))
gp = GravityParams(G=1.0, eps=0.5 / N1, mesh_N=MESH_N)
r_cut = gp.r_cut_ratio * gp.a_smooth * 1.0 / gp.mesh_N
hydro_reach = float(ic["h"].max() * P.kernel.gamma * 1.25)
grid = CellGrid.build_columns(
    ic["box"], interaction_range=max(hydro_reach, r_cut * 1.0001),
    pos=ic["pos"])
log(f"grid {grid.cdim} K={grid.K}")
solver = GravitySolver(gp, grid)

eng = Engine(grid, P,
             EngineConfig(dt_max=2e-4, backend="flat",
                          with_self_gravity=True, eps_soft=gp.eps,
                          eta_grav=gp.eta, mesh_dt_max=64 * 2e-4,
                          p2p_reach=solver.pm.r_cut),
             0.0, 1.0, gravity_fn=solver.gas_short_range_fn(),
             mesh_fn=solver.gas_mesh_fn(),
             mesh_dt_scale=solver.pm.r_s)
eng.load_particles(ic["pos"], ic["m"], ic["v"], ic["u"], ic["h"])
log("particles loaded")
eng.init_particles()
np.asarray(eng.state["rho"]).ravel()[:1]
log("init_particles done (synced)")

eng.run_fixed_dt(16, per_launch=16)
np.asarray(eng.state["rho"]).ravel()[:1]
log("warmup 16 steps done (synced)")

t0 = time.time()
eng.run_fixed_dt(64, per_launch=16)
np.asarray(eng.state["rho"])
el = time.time() - t0
log(f"timed 64 steps: {el:.2f}s -> {64*n_parts/el:.3e} part-steps/s")
