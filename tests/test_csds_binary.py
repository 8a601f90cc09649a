"""CSDS binary logfile: field-masked records with back-offset chains
(csds.c:200-267) + per-particle reverse reconstruction."""

import numpy as np

from swift_subtask_dev_tpu.io.csds import (CSDSBinaryLog,
                                           csds_read_trajectory,
                                           csds_scan)


def test_binary_roundtrip_and_backoffsets(tmp_path):
    path = str(tmp_path / "csds.dump")
    log = CSDSBinaryLog(path)
    rng = np.random.default_rng(0)
    # three appends: pids interleave; the third drops the gas fields
    # (different mask -> different record size)
    times = [0.1, 0.2, 0.3]
    for i, t in enumerate(times):
        pids = np.array([1, 2, 3]) if i < 2 else np.array([2, 3])
        rec = {"ParticleIDs": pids,
               "Times": np.full(len(pids), t),
               "Coordinates": rng.random((len(pids), 3)).astype(np.float32),
               "Velocities": rng.random((len(pids), 3)).astype(np.float32)}
        if i < 2:
            rec["InternalEnergies"] = np.full(len(pids), 10.0 + i,
                                              np.float32)
        log.append(rec)
    log.close()

    # full scan sees every record
    recs = list(csds_scan(path))
    assert len(recs) == 8

    # particle 2 has three records, oldest first, with the right masks
    traj = csds_read_trajectory(path, 2)
    np.testing.assert_allclose(traj["Times"].ravel(), [0.1, 0.2, 0.3])
    assert len(traj["InternalEnergies"]) == 2   # third record dropped it
    np.testing.assert_allclose(traj["InternalEnergies"].ravel(),
                               [10.0, 11.0])
    # particle 1 only has the first two
    traj1 = csds_read_trajectory(path, 1)
    np.testing.assert_allclose(traj1["Times"].ravel(), [0.1, 0.2])
    # unknown particle -> empty
    assert csds_read_trajectory(path, 99) == {}


def test_binary_writer_through_engine_stream(tmp_path):
    """CSDSWriter(format='binary') end-to-end over a tiny run."""
    import jax.numpy as jnp
    from swift_subtask_dev_tpu.engine import Engine, EngineConfig
    from swift_subtask_dev_tpu.grid import CellGrid
    from swift_subtask_dev_tpu.io.csds import CSDSParams, CSDSWriter
    from swift_subtask_dev_tpu.ics import uniform_box_ic
    from swift_subtask_dev_tpu.models.sph.sphenix import SPHENIXParams

    ic = uniform_box_ic(n=5, jitter=0.05, seed=1)
    grid = CellGrid(box=(1.0, 1.0, 1.0), cdim=(3, 3, 3), K=32)
    eng = Engine(grid, SPHENIXParams(h_max=0.18),
                 EngineConfig(dt_max=5e-4), 0.0, 1.0)
    eng.load_particles(ic["pos"], ic["m"], ic["v"], ic["u"],
                       np.minimum(ic["h"], 0.15))
    eng.init_particles()
    w = CSDSWriter(CSDSParams(delta_step=1, basename=str(
        tmp_path / "csds"), format="binary"), grid)
    for _ in range(4):
        eng.step()
        w.after_step(eng.state, eng.timeline.ti_current, eng.time)
    out = w.flush()
    assert out.endswith(".dump") and w.n_records > 0
    # some particle has a multi-record chain
    import json
    idx = json.load(open(out + ".index"))
    pid = int(next(iter(idx["last_offset"])))
    traj = csds_read_trajectory(out, pid)
    assert len(traj["Times"]) >= 1
    assert np.isfinite(traj["Coordinates"]).all()
