#!/usr/bin/env python
"""Stage-stamped DMO scale probe (VERDICT r4 #2 done-criterion): where
the time goes at 1e7 particles — per-step P2P+kick+drift, the rebucket,
the PM mesh boundary, and the rebucket cadence over a timed window.

Usage: BENCH_N1=171 BENCH_MESH_N=384 python tools/diag_dmo_scale.py
"""
import os, sys, time
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N1 = int(os.environ.get("BENCH_N1", "80"))
MESH_N = int(os.environ.get("BENCH_MESH_N", "192"))
HEADROOM = float(os.environ.get("BENCH_HEADROOM", "1.15"))
t00 = time.time()
def log(m): print(f"[{time.time()-t00:7.1f}s] {m}", flush=True)

import jax, jax.numpy as jnp
from swift_subtask_dev_tpu.engine import DMEngine, EngineConfig
from swift_subtask_dev_tpu.grid import CellGrid
from swift_subtask_dev_tpu.grid.cellgrid import rebucket_offsets
from swift_subtask_dev_tpu.models.gravity import GravityParams, GravitySolver
from swift_subtask_dev_tpu.ics import uniform_box_ic

ic = uniform_box_ic(n=N1, jitter=0.2, seed=3)
n = len(ic["pos"]); log(f"IC {n} particles")
gp = GravityParams(G=1.0, eps=0.5 / N1, mesh_N=MESH_N)
r_cut = gp.r_cut_ratio * gp.a_smooth / gp.mesh_N
grid = CellGrid.build_columns(ic["box"], interaction_range=r_cut * 1.25,
                              pos=ic["pos"], headroom=HEADROOM)
log(f"grid {grid.cdim} K={grid.K} slots={grid.C*grid.K/1e6:.1f}M "
    f"occupancy={n/(grid.C*grid.K):.2f}")
solver = GravitySolver(gp, grid)

def gfn(s):
    [(a, p)] = solver.short_range_accelerations([s]); return a, p
def mfn(s):
    [(a, p)] = solver.mesh_accelerations([s]); return a, p

eng = DMEngine(grid, EngineConfig(dt_min=1e-9, dt_max=2e-4, eta_grav=gp.eta,
                                  p2p_reach=solver.pm.r_cut,
                                  mesh_dt_max=64 * 2e-4, backend="flat"),
               0.0, 1.0, gravity_fn=gfn, eps_soft=gp.eps,
               mesh_fn=mfn, mesh_dt_scale=solver.pm.r_s)
eng.load_dm(ic["pos"], ic["m"], ic["v"])
log("loaded (host bucket)")
eng.init_particles(); np.asarray(eng.state["pot"]).ravel()[:1]
log("init done")
for _ in range(3): eng.step()
np.asarray(eng.state["pot"]).ravel()[:1]; log("3 warm steps")

def timed(f, k=4):
    # sync via a scalar reduction — np.asarray of a full leaf would pull
    # the whole array through the tunnel and swamp the timing
    def sync(o):
        np.asarray(jnp.sum(jax.tree_util.tree_leaves(o)[0]))
    sync(f())
    t0 = time.perf_counter()
    for _ in range(k): o = f()
    sync(o)
    return (time.perf_counter() - t0) / k * 1e3

s = dict(eng.state)
jp2p = jax.jit(lambda st: gfn(st))
jmesh = jax.jit(lambda st: mfn(st))
fields = {k: v for k, v in s.items()
          if k not in ("mask", "off", "drift_accum")
          and hasattr(v, "shape") and v.ndim >= 2}
jreb = jax.jit(lambda m, o, f: rebucket_offsets(grid, m, o, f, zsort=True))
print(f"p2p pass        {timed(lambda: jp2p(s)):9.1f} ms")
print(f"PM mesh solve   {timed(lambda: jmesh(s)):9.1f} ms")
print(f"rebucket (full) {timed(lambda: jreb(s['mask'], s['off'], fields)):9.1f} ms"
      f"   fields moved: {len(fields)}")

# cadence: run 24 steps, count rebuilds via engine phase counters
t0 = time.perf_counter()
for _ in range(24): eng.step()
np.asarray(jnp.sum(eng.state["pot"]))
dt_all = (time.perf_counter() - t0) / 24 * 1e3
print(f"full step avg   {dt_all:9.1f} ms  over 24 steps")
print(f"rate = {24*n/ (dt_all*24/1e3):,.0f} particle-steps/s")
da = float(eng.state.get("drift_accum", 0.0))
print(f"drift_accum after window: {da:.3e} (rebucket fires when 2D+reach"
      f" >= min_edge; cadence = margin/(v_max*dt) steps)")
