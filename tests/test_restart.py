"""Checkpoint/restart determinism (reference restart.c contract):
resuming from a checkpoint reproduces the uninterrupted run exactly."""

import numpy as np

from swift_subtask_dev_tpu.engine import Engine, EngineConfig
from swift_subtask_dev_tpu.grid import CellGrid
from swift_subtask_dev_tpu.io.restart import (
    save_checkpoint, load_checkpoint, engine_meta, restore_engine)
from swift_subtask_dev_tpu.models.sph.sphenix import SPHENIXParams
from swift_subtask_dev_tpu.ics import uniform_box_ic


def build():
    ic = uniform_box_ic(n=6, jitter=0.05, seed=2)
    P = SPHENIXParams(h_max=0.3)
    grid = CellGrid(box=(1.0, 1.0, 1.0), cdim=(3, 3, 3), K=48)
    eng = Engine(grid, P, EngineConfig(dt_max=1e-3), 0.0, 1.0)
    eng.load_particles(ic["pos"], ic["m"], ic["v"], ic["u"], ic["h"])
    return eng


def test_restart_bitwise(tmp_path):
    eng = build()
    eng.init_particles()
    for _ in range(2):
        eng.step()
    ck = str(tmp_path / "restart/run")
    save_checkpoint(ck, eng.state, engine_meta(eng))

    # continue the original
    for _ in range(3):
        eng.step()
    rho_a = np.asarray(eng.state["rho"])
    v_a = np.asarray(eng.state["v_full"])

    # resume a fresh engine from the checkpoint
    eng2 = build()
    state, meta = load_checkpoint(ck)
    restore_engine(eng2, state, meta)
    for _ in range(3):
        eng2.step()
    rho_b = np.asarray(eng2.state["rho"])
    v_b = np.asarray(eng2.state["v_full"])

    np.testing.assert_array_equal(rho_a, rho_b)
    np.testing.assert_array_equal(v_a, v_b)
    assert eng.timeline.ti_current == eng2.timeline.ti_current


def test_resubmit_hook(tmp_path):
    """Restarts:resubmit_on_exit analog: the policy resubmits only after
    a max_run_time stop (restart_resubmit, swift.c:1873)."""
    from swift_subtask_dev_tpu.io import restart as rst
    pol = rst.RestartPolicy(delta_hours=100.0, max_run_time_hours=1e-9,
                            restart_dir=str(tmp_path))
    assert pol.should_stop()
    assert pol.stop_reason == "maxtime"
    marker = tmp_path / "resubmitted"
    rc = pol.resubmit(f"touch {marker}")
    assert rc == 0 and marker.exists()
    # stop-file stops carry a different reason
    pol2 = rst.RestartPolicy(delta_hours=100.0,
                             restart_dir=str(tmp_path))
    (tmp_path / "stop").write_text("")
    assert pol2.should_stop() and pol2.stop_reason == "stopfile"
