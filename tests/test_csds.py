"""CSDS particle history stream (src/csds.c core behavior)."""

import h5py
import numpy as np

from swift_subtask_dev_tpu.engine import Engine, EngineConfig
from swift_subtask_dev_tpu.grid import CellGrid
from swift_subtask_dev_tpu.io.csds import CSDSParams, CSDSWriter
from swift_subtask_dev_tpu.models.sph.sphenix import SPHENIXParams
from swift_subtask_dev_tpu.ics import uniform_box_ic


def test_csds_records_history(tmp_path):
    ic = uniform_box_ic(n=8, jitter=0.1, seed=3)
    P = SPHENIXParams(h_max=float(ic["h"].max() * 3))
    grid = CellGrid.build_for_positions(
        ic["box"],
        interaction_range=float(ic["h"].max() * P.kernel.gamma * 1.25),
        pos=ic["pos"], headroom=1.6)
    eng = Engine(grid, P, EngineConfig(dt_max=2e-4), 0.0, 1.0)
    eng.load_particles(ic["pos"], ic["m"], ic["v"], ic["u"], ic["h"])
    eng.init_particles()

    csds = CSDSWriter(CSDSParams(delta_step=4), grid)
    n_steps = 12
    for _ in range(n_steps):
        eng.step()
        csds.after_step(eng.state, eng.timeline.ti_current, eng.time)

    path = csds.flush(str(tmp_path / "csds.hdf5"))
    with h5py.File(path) as f:
        pid = np.asarray(f["Records/ParticleIDs"])
        times = np.asarray(f["Records/Times"])
        order = np.asarray(f["Records/HistoryOrder"])

    n = len(ic["m"])
    # every particle logged ~ n_steps/delta_step times (all one bin here)
    assert csds.n_records > 0
    counts = np.bincount(pid, minlength=n)
    assert counts.min() >= n_steps // 4 - 1
    assert counts.max() <= n_steps // 4 + 1

    # the history index walks (pid, time) in order
    ps, ts = pid[order], times[order]
    for k in range(1, len(ps)):
        assert (ps[k] > ps[k - 1]) or \
            (ps[k] == ps[k - 1] and ts[k] >= ts[k - 1])
