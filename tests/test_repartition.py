"""Occupancy re-grid trigger — the TPU analog of the reference's
load-imbalance repartition (engine.c:1781, partition.c).

Under shard_map/GSPMD every device computes the same padded shapes, so
live-count imbalance is free; the real cost is the global per-cell
capacity K outgrowing the distribution (masked-but-computed lanes).
The engine watches the fullest live cell (diag['k_max_live']) and
re-grids when the tiles are mostly padding; the overflow direction is
the existing RegridNeeded path (tools/collapse_demo.py).
"""

import numpy as np

from swift_subtask_dev_tpu.engine import Engine, EngineConfig
from swift_subtask_dev_tpu.grid import CellGrid
from swift_subtask_dev_tpu.ics import uniform_box_ic
from swift_subtask_dev_tpu.models.sph.sphenix import SPHENIXParams


def _engine(K, trigger, cooldown=0):
    ic = uniform_box_ic(n=10, jitter=0.1, seed=5)
    P = SPHENIXParams(h_max=float(ic["h"].max() * 3))
    grid = CellGrid(box=ic["box"], cdim=(3, 3, 3), K=K)
    grid.validate_range(float(ic["h"].max() * P.kernel.gamma * 1.05))
    eng = Engine(grid, P,
                 EngineConfig(dt_max=2e-4,
                              regrid_shrink_trigger=trigger,
                              regrid_cooldown=cooldown),
                 0.0, 1.0)
    eng.load_particles(ic["pos"], ic["m"], ic["v"], ic["u"], ic["h"])
    eng.init_particles()
    return eng, ic


def test_shrink_regrid_fires_on_padded_tiles():
    # 1000 particles over 27 cells: ~40 live/cell in tiles of K=512 —
    # > 92% padding, the dispersed-remnant regime
    eng, ic = _engine(K=512, trigger=0.5, cooldown=0)
    n0 = int((np.asarray(eng.state["mask"]) > 0).sum())
    eng.step()
    assert getattr(eng, "n_shrink_regrids", 0) == 1
    assert eng.grid.K < 512 // 2, f"K still {eng.grid.K}"
    # no particles lost, engine keeps stepping on the tight grid
    assert int((np.asarray(eng.state["mask"]) > 0).sum()) == n0
    eng.step()
    assert getattr(eng, "n_shrink_regrids", 0) == 1  # no re-fire


def test_shrink_regrid_respects_cooldown_and_fit():
    # well-fitted tiles never shrink
    eng, _ = _engine(K=128, trigger=0.5, cooldown=0)
    eng.step()
    assert getattr(eng, "n_shrink_regrids", 0) == 0

    # padded tiles but a long cooldown: engine start counts as the last
    # re-grid, so nothing fires within the first `cooldown` steps
    eng2, _ = _engine(K=512, trigger=0.5, cooldown=100)
    eng2.step()
    eng2.step()
    assert getattr(eng2, "n_shrink_regrids", 0) == 0
