"""Fused force+gravity pass: one flat traversal == two separate passes.

hydro_pallas.force_gravity_loop runs short-range P2P gravity inside the
hydro force pass (shared column windows).  The fused step must reproduce
the separate force_loop + p2p_gravity_loop step to f32 round-off: the
extra window blocks each side sees contribute exact zeros.
"""

import numpy as np

from swift_subtask_dev_tpu.engine import Engine, EngineConfig
from swift_subtask_dev_tpu.grid import CellGrid
from swift_subtask_dev_tpu.models.gravity import GravityParams, GravitySolver
from swift_subtask_dev_tpu.models.sph.sphenix import SPHENIXParams
from swift_subtask_dev_tpu.ics import uniform_box_ic


def _run(fused: bool, n_steps: int = 6):
    ic = uniform_box_ic(n=8, jitter=0.2, seed=11, u0=2e-3)
    P = SPHENIXParams(h_max=float(ic["h"].max() * 3))
    gp = GravityParams(G=0.5, eps=0.01, mesh_N=32)
    r_cut = gp.r_cut_ratio * gp.a_smooth / gp.mesh_N
    hydro_reach = float(ic["h"].max() * P.kernel.gamma * 1.3)
    grid = CellGrid.build_columns(
        ic["box"], interaction_range=max(hydro_reach, r_cut * 1.0001),
        pos=ic["pos"])
    solver = GravitySolver(gp, grid)
    gravity_fn = solver.gas_short_range_fn()
    assert hasattr(gravity_fn, "fuse_spec")  # flat solver advertises it
    if not fused:
        del gravity_fn.fuse_spec
    eng = Engine(grid, P,
                 EngineConfig(dt_max=2e-4, backend="flat",
                              with_self_gravity=True, eps_soft=gp.eps,
                              mesh_dt_max=4 * 2e-4,
                              p2p_reach=solver.pm.r_cut),
                 0.0, 1.0, gravity_fn=gravity_fn,
                 mesh_fn=solver.gas_mesh_fn(),
                 mesh_dt_scale=solver.pm.r_s)
    eng.load_particles(ic["pos"], ic["m"], ic["v"], ic["u"], ic["h"])
    eng.init_particles()
    for _ in range(n_steps):
        eng.step()
    return eng


def _perpid(eng, k):
    pid = np.asarray(eng.state["pid"]).ravel()
    msk = np.asarray(eng.state["mask"]).ravel() > 0
    x = np.asarray(eng.state[k])
    x = x.reshape(-1, *x.shape[2:])
    return x[msk][np.argsort(pid[msk])]


def test_fused_matches_separate_passes():
    ef = _run(fused=True)
    es = _run(fused=False)
    for k in ("off", "v_full", "u_full", "a_grav", "a_hydro", "pot",
              "rho", "h"):
        a, b = _perpid(ef, k), _perpid(es, k)
        scale = np.abs(b).max() + 1e-30
        err = np.abs(a - b).max() / scale
        assert err < 2e-6, (k, err)
    assert np.array_equal(_perpid(ef, "time_bin"), _perpid(es, "time_bin"))
