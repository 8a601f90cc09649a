"""DM (gravity-only) engine tests — orbit/static checks like the
reference's GravityTests examples."""

import numpy as np
import jax.numpy as jnp

from swift_subtask_dev_tpu.engine import DMEngine, EngineConfig
from swift_subtask_dev_tpu.grid import CellGrid
from swift_subtask_dev_tpu.models.gravity import GravityParams, GravitySolver
from swift_subtask_dev_tpu.ics import bcc_lattice


def make_dm_engine(pos, m, v, mesh_N=32, eps=2e-3, dt_max=1e-3, K=32):
    grid = CellGrid(box=(1.0, 1.0, 1.0), cdim=(3, 3, 3), K=K)
    gp = GravityParams(G=1.0, eps=eps, mesh_N=mesh_N)
    solver = GravitySolver(gp, grid)
    def gfn(s):
        [(acc, _)] = solver.accelerations([s])
        return acc
    eng = DMEngine(grid, EngineConfig(dt_max=dt_max, eta_grav=gp.eta,
                                      p2p_reach=solver.pm.r_cut),
                   0.0, 1.0, gravity_fn=gfn, eps_soft=eps)
    eng.load_dm(pos, m, v)
    return eng


def test_uniform_dm_lattice_static():
    """A uniform periodic lattice has zero net force (exact cancellation)."""
    pos = bcc_lattice((6, 6, 6), (1.0, 1.0, 1.0))
    n = len(pos)
    m = np.full(n, 1.0 / n, np.float32)
    v = np.zeros((n, 3), np.float32)
    eng = make_dm_engine(pos, m, v)
    eng.init_particles()
    for _ in range(3):
        eng.step()
    vmax = np.abs(np.asarray(eng.state["v_full"])
                  [np.asarray(eng.state["mask"]) > 0]).max()
    # velocity growth from residual lattice forces must be tiny vs the
    # dynamical velocity sqrt(G M / L) ~ 1
    assert vmax < 5e-3, f"lattice not static: vmax={vmax}"


def test_two_body_attraction():
    """Two isolated particles accelerate toward each other Newtonianly."""
    pos = np.array([[0.45, 0.5, 0.5], [0.55, 0.5, 0.5]])
    m = np.array([1e-4, 1e-4], np.float32)  # tiny so mesh bg negligible
    v = np.zeros((2, 3), np.float32)
    eng = make_dm_engine(pos, m, v, dt_max=1e-4, K=8)
    eng.init_particles()
    a = np.asarray(eng.state["a_grav"])
    mask = np.asarray(eng.state["mask"]) > 0
    ag = a[mask]
    pid = np.asarray(eng.state["pid"])[mask]
    ax = np.zeros(2); ax[pid] = ag[:, 0]
    # |a| = G m / r^2 = 1e-4 / 0.01 = 1e-2
    assert np.isclose(ax[0], 1e-2, rtol=0.05), ax
    assert np.isclose(ax[1], -1e-2, rtol=0.05), ax
    # run and verify infall velocities develop (x-velocities point inward)
    for _ in range(10):
        eng.step()
    mask = np.asarray(eng.state["mask"]) > 0
    vv = np.asarray(eng.state["v_full"])[mask]
    pid = np.asarray(eng.state["pid"])[mask]
    vx = np.zeros(2); vx[pid] = vv[:, 0]
    t_elapsed = eng.time
    expect_v = 1e-2 * t_elapsed  # a*t
    assert vx[0] > 0.5 * expect_v and vx[1] < -0.5 * expect_v, (vx, expect_v)
