"""MultiEngine on the flat (column/z-sorted) backend vs the roll-stencil.

Gas + DM with joint P2P+PM gravity: the flat Pallas pipeline must
reproduce the xla-stencil engine per particle (same physics, different
pair enumeration/layout) — the TPU analog of the reference checking its
vectorized loops against the generic ones (testInteractions).
"""

import numpy as np
import jax.numpy as jnp

from swift_subtask_dev_tpu.engine import EngineConfig
from swift_subtask_dev_tpu.engine_multi import MultiEngine
from swift_subtask_dev_tpu.grid.cellgrid import CellGrid
from swift_subtask_dev_tpu.models.gravity import GravityParams, GravitySolver
from swift_subtask_dev_tpu.models.sph.sphenix import SPHENIXParams
from swift_subtask_dev_tpu.ics import uniform_box_ic


def _run(backend, n_steps=3):
    ic = uniform_box_ic(n=8, jitter=0.05)
    n = len(ic["pos"])
    rng = np.random.default_rng(2)
    pos_dm = rng.uniform(0, 1, (n, 3))
    gp = GravityParams(G=1.0, eps=0.02, mesh_N=32)
    sph = SPHENIXParams()
    box = (1.0, 1.0, 1.0)
    r_cut = gp.r_cut_ratio * gp.a_smooth * 1.0 / gp.mesh_N
    reach = max(float(ic["h"].max()) * sph.kernel.gamma * 1.3,
                r_cut * 1.0001)
    pos_all = np.concatenate([ic["pos"], pos_dm])
    if backend == "flat":
        grid = CellGrid.build_columns(box, reach, pos_all)
    else:
        grid = CellGrid.build_for_positions(box, reach, pos_all,
                                            headroom=1.6)
    solver = GravitySolver(gp, grid)
    cfg = EngineConfig(dt_min=1e-12, dt_max=2e-3, with_self_gravity=True,
                       eta_grav=gp.eta, eps_soft=gp.eps,
                       p2p_reach=solver.pm.r_cut, backend=backend)
    eng = MultiEngine(grid, sph, cfg, 0.0, 1.0,
                      gravity_fn=solver.short_range_accelerations,
                      eps_soft=gp.eps,
                      mesh_fn=solver.mesh_accelerations,
                      mesh_dt_scale=solver.pm.r_s)
    eng.load_gas(ic["pos"], ic["m"], ic["v"], ic["u"], ic["h"])
    eng.load_dm(pos_dm, np.full(n, 2.0 / n, np.float32),
                np.zeros((n, 3), np.float32))
    eng.init_particles()
    for _ in range(n_steps):
        eng.step()

    out = {}
    from swift_subtask_dev_tpu.grid.cellgrid import global_positions
    for name, sp in eng.state.items():
        mask = np.asarray(sp["mask"]) > 0
        pid = np.asarray(sp["pid"])[mask]
        order = np.argsort(pid)
        pos = global_positions(eng.grid, np.asarray(sp["off"]))[mask][order]
        v = np.asarray(sp["v_full"])[mask][order]
        row = {"pos": pos, "v": v}
        if "u_full" in sp:
            row["u"] = np.asarray(sp["u_full"])[mask][order]
            row["rho"] = np.asarray(sp["rho"])[mask][order]
        out[name] = row
    return out


def test_multi_flat_matches_xla():
    a = _run("xla")
    b = _run("flat")
    for name in ("gas", "dm"):
        # positions: same ICs, tolerance covers f32 ordering + the flat
        # kernel's r_cut pair cut (the stencil keeps truncated pairs
        # beyond r_cut)
        dv = np.abs(a[name]["v"] - b[name]["v"]).max()
        scale = max(np.abs(a[name]["v"]).max(), 1e-10)
        assert dv / scale < 2e-3, (name, dv, scale)
        dx = np.abs(a[name]["pos"] - b[name]["pos"]).max()
        assert dx < 1e-5, (name, dx)
    du = np.abs(a["gas"]["u"] - b["gas"]["u"]).max()
    assert du / np.abs(a["gas"]["u"]).max() < 2e-3
    drho = np.abs(a["gas"]["rho"] - b["gas"]["rho"]).max()
    assert drho / np.abs(a["gas"]["rho"]).max() < 1e-3
