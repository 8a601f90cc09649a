"""Gas particle splitting — engine_split_gas_particles (engine.c:268).

A particle heavier than SPH:particle_splitting_mass_threshold splits into
two halves displaced +-0.2h along a deterministic direction, with
h -> h/2^(1/3).  Mass is conserved exactly, IDs stay unique, intensive
quantities are copied, and the trigger fires from the step diagnostics.
"""

import numpy as np

from swift_subtask_dev_tpu.engine import Engine, EngineConfig
from swift_subtask_dev_tpu.engine_multi import MultiEngine
from swift_subtask_dev_tpu.grid import CellGrid
from swift_subtask_dev_tpu.ics import uniform_box_ic
from swift_subtask_dev_tpu.models.sph.sphenix import SPHENIXParams


def _loaded_engine(cls, heavy_ids, heavy_factor=3.0):
    ic = uniform_box_ic(n=6, jitter=0.05, seed=3)
    m = np.asarray(ic["m"], np.float32).copy()
    m[heavy_ids] *= heavy_factor
    P = SPHENIXParams(h_max=0.4)
    grid = CellGrid(box=(1.0, 1.0, 1.0), cdim=(3, 3, 3), K=48)
    eng = cls(grid, P, EngineConfig(dt_max=1e-3), 0.0, 1.0)
    if cls is MultiEngine:
        eng.load_gas(ic["pos"], m, ic["v"], ic["u"], ic["h"])
    else:
        eng.load_particles(ic["pos"], m, ic["v"], ic["u"], ic["h"])
    return eng, m


def _gas(eng):
    return eng.state["gas"] if isinstance(eng, MultiEngine) else eng.state


def test_split_conserves_mass_and_ids():
    heavy = [0, 7, 100]
    eng, m0 = _loaded_engine(Engine, heavy)
    thr = float(np.median(m0)) * 2.0
    mask0 = np.asarray(_gas(eng)["mask"]) > 0
    n0 = int(mask0.sum())
    n_split = eng.split_gas_particles(thr)
    assert n_split == len(heavy)

    s = _gas(eng)
    mask = np.asarray(s["mask"]) > 0
    assert int(mask.sum()) == n0 + len(heavy)
    # exact mass conservation
    np.testing.assert_allclose(float(np.asarray(s["m"])[mask].sum()),
                               float(m0.sum()), rtol=1e-6)
    # no particle above the threshold anymore
    assert float(np.asarray(s["m"])[mask].max()) <= thr
    # unique ids
    pid = np.asarray(s["pid"])[mask]
    assert len(np.unique(pid)) == len(pid)
    # halves have h shrunk by 2^(1/3)
    h = np.asarray(s["h"])[mask]
    assert float(h.min()) < 0.9 * float(h.max())


def test_split_trigger_from_step():
    heavy = [42]
    eng, m0 = _loaded_engine(Engine, heavy, heavy_factor=4.0)
    thr = float(np.median(m0)) * 2.0
    eng.split_mass_threshold = thr
    eng.init_particles()
    n_before = int((np.asarray(_gas(eng)["mask"]) > 0).sum())
    eng.step()
    assert getattr(eng, "n_split_total", 0) == 1
    s = _gas(eng)
    mask = np.asarray(s["mask"]) > 0
    assert int(mask.sum()) == n_before + 1
    np.testing.assert_allclose(float(np.asarray(s["m"])[mask].sum()),
                               float(m0.sum()), rtol=1e-6)
    # the engine keeps stepping cleanly after the split
    eng.step()
    assert getattr(eng, "n_split_total", 0) == 1  # no re-split


def test_split_multi_engine_gas_only():
    heavy = [3, 50]
    eng, m0 = _loaded_engine(MultiEngine, heavy)
    dm_pos = np.mod(np.random.default_rng(1).uniform(size=(32, 3)), 1.0)
    eng.load_dm(dm_pos, np.full(32, 0.1, np.float32),
                np.zeros((32, 3), np.float32))
    n_dm = int((np.asarray(eng.state["dm"]["mask"]) > 0).sum())
    thr = float(np.median(m0)) * 2.0
    n_split = eng.split_gas_particles(thr)
    assert n_split == 2
    assert int((np.asarray(eng.state["dm"]["mask"]) > 0).sum()) == n_dm
    g = eng.state["gas"]
    mask = np.asarray(g["mask"]) > 0
    np.testing.assert_allclose(float(np.asarray(g["m"])[mask].sum()),
                               float(m0.sum()), rtol=1e-6)
