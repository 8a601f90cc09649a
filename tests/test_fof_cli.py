"""swift-tpu-fof standalone group finder (swift_fof.c analog)."""

import numpy as np
import h5py

from swift_subtask_dev_tpu.cli import fof_main
from swift_subtask_dev_tpu.io.snapshot import write_snapshot, PTYPE_DM


def test_fof_cli_end_to_end(tmp_path):
    rng = np.random.default_rng(0)
    blob1 = 0.3 + rng.normal(0, 0.004, (200, 3))
    blob2 = np.array([0.7, 0.7, 0.7]) + rng.normal(0, 0.004, (120, 3))
    field = rng.uniform(0, 1, (80, 3))
    pos = np.concatenate([blob1, blob2, field])
    ic = str(tmp_path / "fof_ic.hdf5")
    write_snapshot(ic, (1.0, 1.0, 1.0), 0.0, {PTYPE_DM: {
        "Coordinates": pos,
        "Velocities": np.zeros((len(pos), 3), np.float32),
        "Masses": np.ones(len(pos), np.float32),
        "ParticleIDs": np.arange(len(pos), dtype=np.uint64)}})
    out = str(tmp_path / "cat.hdf5")
    rc = fof_main([ic, "-o", out, "--min-size", "50", "-l", "0.02"])
    assert rc == 0
    with h5py.File(out) as f:
        assert f["Groups"].attrs["NumGroups"] == 2
        sizes = sorted(f["Groups/GroupSizes"][:], reverse=True)
        assert sizes == [200, 120]
        assert len(f["Particles/GroupIDs"]) == len(pos)
