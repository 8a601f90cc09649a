"""Flat (column/z-sorted Pallas) backend vs the roll-stencil backend.

ops/pallas_flat.py is the pseudo-Verlet TPU kernel (sort_part.h analog);
on CPU it runs through the Pallas interpreter automatically, so these
tests exercise the identical kernel logic that runs on TPU.
"""

import numpy as np
import pytest

from swift_subtask_dev_tpu.engine import Engine, EngineConfig
from swift_subtask_dev_tpu.grid import CellGrid
from swift_subtask_dev_tpu.ics import uniform_box_ic
from swift_subtask_dev_tpu.models.sph.sphenix import (CosmoFactors,
                                                      SPHENIXParams)
from swift_subtask_dev_tpu.ops import hydro_pallas, stencil


@pytest.fixture(scope="module")
def setup():
    ic = uniform_box_ic(n=8, jitter=0.25, seed=7)
    P = SPHENIXParams(h_max=float(ic["h"].max() * 3))
    rng = float(ic["h"].max() * P.kernel.gamma * 1.25)
    grid3 = CellGrid.build_for_positions(ic["box"], interaction_range=rng,
                                         pos=ic["pos"], headroom=1.6)
    gridF = CellGrid.build_columns(ic["box"], interaction_range=rng,
                                   pos=ic["pos"])

    def state_for(grid, backend):
        eng = Engine(grid, P, EngineConfig(dt_max=2e-4, backend=backend),
                     0.0, 1.0)
        eng.load_particles(ic["pos"], ic["m"], ic["v"], ic["u"], ic["h"])
        eng.init_particles()
        return dict(eng.state)

    return ic, P, grid3, gridF, state_for


def _perpid(s, x):
    pid = np.asarray(s["pid"]).ravel()
    m = np.asarray(s["mask"]).ravel() > 0
    x = np.asarray(x)
    x = x.reshape(-1, *x.shape[2:])
    return x[m][np.argsort(pid[m])]


def test_loops_match_stencil(setup):
    ic, P, grid3, gridF, state_for = setup
    s3 = state_for(grid3, "xla")
    sF = state_for(gridF, "flat")
    cosmo = CosmoFactors.no_cosmo()

    def cmp(a3, aF, tol=5e-5):
        a, b = _perpid(s3, a3), _perpid(sF, aF)
        scale = np.max(np.abs(a)) + 1e-30
        assert np.max(np.abs(a - b)) / scale < tol

    d3 = stencil.density_loop(grid3, s3, P)
    dF = hydro_pallas.density_loop(gridF, sF, P, engine="flat")
    for k in d3:
        cmp(d3[k], dF[k])
    f3 = stencil.force_loop(grid3, s3, P, cosmo)
    fF = hydro_pallas.force_loop(gridF, sF, P, cosmo, engine="flat")
    for k in ("a_hydro", "u_dt", "h_dt", "v_sig"):
        cmp(f3[k], fF[k])


def test_engine_trajectory_matches(setup):
    ic, P, grid3, gridF, state_for = setup

    def run(grid, backend, n=4):
        eng = Engine(grid, P, EngineConfig(dt_max=2e-4, backend=backend),
                     0.0, 1.0)
        eng.load_particles(ic["pos"], ic["m"], ic["v"], ic["u"], ic["h"])
        eng.init_particles()
        for _ in range(n):
            eng.step()
        return eng.state

    sx, sf = run(grid3, "xla"), run(gridF, "flat")
    for k in ("rho", "h", "u_full"):
        a = _perpid(sx, sx[k])
        b = _perpid(sf, sf[k])
        assert np.max(np.abs(a - b) / (np.abs(a) + 1e-10)) < 1e-3, k


def test_timebin_loop_matches_stencil(setup):
    """The limiter wake scan on the flat engine (hydro_pallas.timebin_loop)
    agrees with the stencil version per particle."""
    import jax.numpy as jnp
    from swift_subtask_dev_tpu.ops import stencil as st

    ic, P, grid3, gridF, state_for = setup
    s3 = state_for(grid3, "xla")
    sF = state_for(gridF, "flat")
    rng = np.random.default_rng(3)

    def sub_for(s):
        pid = np.asarray(s["pid"])
        # deterministic per-pid bins/active flags so both layouts agree
        tb = (pid % 5 + 30) * (np.asarray(s["mask"]) > 0)
        act = ((pid % 3) == 0) & (np.asarray(s["mask"]) > 0)
        return {"mask": s["mask"], "off": s["off"], "h": s["h"],
                "time_bin": jnp.asarray(tb, jnp.int32),
                "active": jnp.asarray(act, jnp.float32)}

    m3 = st.timebin_loop(grid3, sub_for(s3), P)
    mF = hydro_pallas.timebin_loop(gridF, sub_for(sF), P, engine="flat")
    a = _perpid(s3, np.asarray(m3))
    b = _perpid(sF, np.asarray(mF))
    assert np.array_equal(a, b)
