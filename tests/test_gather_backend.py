"""Gather (Verlet candidate-list) backend vs the roll-stencil backend.

The gather backend (ops/gather_pairs.py) is the TPU analog of the
reference's sorted pseudo-Verlet candidate pruning (sort_part.h:42,
runner_doiact_functions_hydro.h DOPAIR1): both must produce the same
physics as the dense 27-stencil loops to f32 roundoff.
"""

import numpy as np
import pytest

from swift_subtask_dev_tpu.engine import Engine, EngineConfig, _nbr_rebuild
from swift_subtask_dev_tpu.grid import CellGrid
from swift_subtask_dev_tpu.ics import uniform_box_ic
from swift_subtask_dev_tpu.models.sph.sphenix import (CosmoFactors,
                                                      SPHENIXParams)
from swift_subtask_dev_tpu.ops import gather_pairs, stencil


@pytest.fixture(scope="module")
def setup():
    ic = uniform_box_ic(n=8, jitter=0.25, seed=7)
    P = SPHENIXParams(h_max=float(ic["h"].max() * 3))
    grid = CellGrid.build_for_positions(
        ic["box"],
        interaction_range=float(ic["h"].max() * P.kernel.gamma * 1.25),
        pos=ic["pos"], headroom=1.6)
    cfg = EngineConfig(dt_max=2e-4, backend="gather")
    eng = Engine(grid, P, cfg, 0.0, 1.0)
    eng.load_particles(ic["pos"], ic["m"], ic["v"], ic["u"], ic["h"])
    eng.init_particles()
    return grid, P, dict(eng.state)


def _close(a, b, tol=5e-5):
    a, b = np.asarray(a), np.asarray(b)
    scale = np.max(np.abs(a)) + 1e-30
    assert np.max(np.abs(a - b)) / scale < tol


def test_density_matches_stencil(setup):
    grid, P, s = setup
    d_s = stencil.density_loop(grid, s, P)
    d_g = gather_pairs.density_loop(grid, s, P)
    for k in d_s:
        _close(d_s[k], d_g[k])


def test_gradient_matches_stencil(setup):
    grid, P, s = setup
    cosmo = CosmoFactors.no_cosmo()
    g_s = stencil.gradient_loop(grid, s, P, cosmo)
    g_g = gather_pairs.gradient_loop(grid, s, P, cosmo)
    for k in g_s:
        _close(g_s[k], g_g[k])


def test_force_matches_stencil(setup):
    grid, P, s = setup
    cosmo = CosmoFactors.no_cosmo()
    f_s = stencil.force_loop(grid, s, P, cosmo)
    f_g = gather_pairs.force_loop(grid, s, P, cosmo)
    for k in f_s:
        _close(f_s[k], f_g[k])


def test_engine_trajectory_matches(setup):
    """A short gather-backend run tracks the stencil run (f32 chaos aside:
    densities and smoothing lengths must agree to accumulated roundoff)."""
    ic = uniform_box_ic(n=8, jitter=0.2, seed=3)
    P = SPHENIXParams(h_max=float(ic["h"].max() * 3))
    grid = CellGrid.build_for_positions(
        ic["box"],
        interaction_range=float(ic["h"].max() * P.kernel.gamma * 1.25),
        pos=ic["pos"], headroom=1.6)

    def run(backend):
        eng = Engine(grid, P, EngineConfig(dt_max=2e-4, backend=backend),
                     0.0, 1.0)
        eng.load_particles(ic["pos"], ic["m"], ic["v"], ic["u"], ic["h"])
        eng.init_particles()
        for _ in range(4):
            eng.step()
        return eng.state

    sx, sg = run("xla"), run("gather")
    for k in ("rho", "h", "u_full"):
        pid_x = np.asarray(sx["pid"]).ravel()
        pid_g = np.asarray(sg["pid"]).ravel()
        mx = np.asarray(sx["mask"]).ravel() > 0
        mg = np.asarray(sg["mask"]).ravel() > 0
        a = np.asarray(sx[k]).reshape(-1)[mx][np.argsort(pid_x[mx])]
        b = np.asarray(sg[k]).reshape(-1)[mg][np.argsort(pid_g[mg])]
        assert np.max(np.abs(a - b) / (np.abs(a) + 1e-10)) < 1e-3, k
