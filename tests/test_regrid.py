"""Automatic re-gridding (space_regrid analog): a run that outgrows its
cell capacity or smoothing-length coverage rebuilds the grid from the
live state and continues — no manual re-grid, no lost particles."""

import numpy as np
import jax.numpy as jnp
import pytest

from swift_subtask_dev_tpu.engine import Engine, EngineConfig, RegridNeeded
from swift_subtask_dev_tpu.grid import CellGrid
from swift_subtask_dev_tpu.ics import uniform_box_ic
from swift_subtask_dev_tpu.models.sph.sphenix import SPHENIXParams


def _count(eng):
    if "mask" in eng.state:
        return int((np.asarray(eng.state["mask"]) > 0).sum())
    return sum(int((np.asarray(sp["mask"]) > 0).sum())
               for sp in eng.state.values())


def test_collapse_overflows_and_regrids():
    """Cold converging flow: particles pile into the central cells until
    the padded capacity K overflows; the engine must regrid (larger K)
    and keep stepping with every particle intact."""
    ic = uniform_box_ic(n=8, jitter=0.02, seed=3)
    n = len(ic["pos"])
    # strong converging flow toward the box centre
    v = (0.5 - ic["pos"]) * 2.0
    u = ic["u"] * 1e-6           # cold: pressure cannot resist
    p = SPHENIXParams(h_max=0.3)
    # deliberately tight K: the initial max cell count + tiny headroom
    grid = CellGrid.build_for_positions((1.0, 1.0, 1.0), 0.31, ic["pos"],
                                        headroom=1.05, k_align=8)
    eng = Engine(grid, p, EngineConfig(dt_max=2e-2, dt_min=1e-12),
                 0.0, 10.0)
    eng.load_particles(ic["pos"], ic["m"], v, u,
                       np.minimum(ic["h"], 0.15))
    eng.init_particles()
    K0 = eng.grid.K
    for _ in range(12):
        eng.step()
    assert eng.grid.K > K0, "collapse never forced a capacity re-grid"
    assert _count(eng) == n, "particles lost across the re-grid"
    rho = np.asarray(eng.state["rho"])[np.asarray(eng.state["mask"]) > 0]
    assert np.isfinite(rho).all()


def test_h_growth_regrids_coarser():
    """The converged smoothing length outgrows the cell edge (the ghost
    wants ~48 neighbours): the engine must rebuild a coarser grid and
    continue — the space_regrid trigger 'cell width < h_max'."""
    ic = uniform_box_ic(n=8, jitter=0.02, seed=4)
    n = len(ic["pos"])
    p = SPHENIXParams(h_max=0.2)
    # too-fine grid: the ~48-neighbour h of an 8^3 box is ~0.124, whose
    # reach gamma*h ~ 0.227 exceeds the 5^3 edge of 0.2
    grid = CellGrid(box=(1.0, 1.0, 1.0), cdim=(5, 5, 5), K=64)
    eng = Engine(grid, p, EngineConfig(dt_max=1e-3, dt_min=1e-12),
                 0.0, 10.0)
    eng.load_particles(ic["pos"], ic["m"], ic["v"], ic["u"],
                       np.full(n, 0.105, np.float32))
    eng.init_particles()
    assert eng.grid.cdim != (5, 5, 5), "h growth never forced a re-grid"
    # the new edge covers the converged smoothing reach
    mask = np.asarray(eng.state["mask"]) > 0
    reach = float(np.asarray(eng.state["h"])[mask].max()) * p.kernel.gamma
    assert min(eng.grid.edge) >= reach * (1 - 1e-5)
    assert _count(eng) == n
    for _ in range(3):
        eng.step()  # still steppable on the rebuilt grid


def test_regrid_preserves_fields():
    """regrid() round-trips every per-particle field exactly."""
    ic = uniform_box_ic(n=6, jitter=0.1, seed=5)
    p = SPHENIXParams(h_max=0.18)
    grid = CellGrid(box=(1.0, 1.0, 1.0), cdim=(3, 3, 3), K=64)
    eng = Engine(grid, p, EngineConfig(dt_max=5e-4), 0.0, 1.0)
    eng.load_particles(ic["pos"], ic["m"], ic["v"], ic["u"],
                       np.minimum(ic["h"], 0.18))
    eng.init_particles()

    def flat_by_pid(state, key):
        mask = np.asarray(state["mask"]) > 0
        pid = np.asarray(state["pid"])[mask]
        order = np.argsort(pid)
        return np.asarray(state[key])[mask][order]

    before = {k: flat_by_pid(eng.state, k)
              for k in ("u_full", "v_full", "m", "h", "rho", "time_bin")}
    eng.regrid()
    for k, v in before.items():
        np.testing.assert_allclose(flat_by_pid(eng.state, k), v,
                                   rtol=0, atol=0, err_msg=k)
    # positions survive up to the f32 offset re-derivation
    eng.step()  # still steppable after the rebuild
