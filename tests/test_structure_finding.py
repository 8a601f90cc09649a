"""On-the-fly structure finding (the VELOCIraptor-hook analog:
velociraptor_interface.c:224, engine.c:3144 Snapshots:invoke_stf)."""

import numpy as np

from swift_subtask_dev_tpu.io.structure_finding import (
    StructureFinder, StructureFindingParams)


def _two_clumps(n_per=40, seed=1):
    rng = np.random.default_rng(seed)
    a = 0.25 + 0.03 * rng.standard_normal((n_per, 3))
    b = 0.75 + 0.03 * rng.standard_normal((n_per, 3))
    return np.clip(np.concatenate([a, b]), 0.01, 0.99)


def _species(pos):
    # minimal tile-free stand-in: one cell is enough for the gatherer's
    # contract (mask/off/pid/m/v on (C, K) tiles)
    n = len(pos)
    return {"dm": {
        "mask": np.ones((1, n), np.float32),
        "off": pos.reshape(1, n, 3).astype(np.float32),
        "pid": np.arange(n, dtype=np.int32).reshape(1, n),
        "m": np.ones((1, n), np.float32),
        "v": np.zeros((1, n, 3), np.float32),
    }}


class _Grid1:
    C = 1

    def cell_corners(self):
        return np.zeros((1, 3))


def test_stf_finds_two_groups(tmp_path):
    pos = _two_clumps()
    p = StructureFindingParams(
        basename=str(tmp_path / "stf"), delta_time=0.5, first=0.0,
        linking_length=0.08, min_group_size=10)
    stf = StructureFinder(p, _Grid1(), (1.0, 1.0, 1.0),
                          cosmological=False)
    path = stf.after_step(_species(pos), 0.6)
    assert path is not None
    import h5py
    with h5py.File(path) as f:
        ng = int(f["Groups"].attrs["NumGroups"])
        sizes = np.asarray(f["Groups/GroupSizes"])
        assert ng == 2
        assert (sizes >= 35).all()
        centres = np.asarray(f["Groups/Centres"])
        d = np.linalg.norm(centres - 0.25, axis=1).min()
        assert d < 0.05
    # cadence advanced: immediate re-check does not fire
    assert stf.after_step(_species(pos), 0.7) is None
    assert stf.after_step(_species(pos), 1.2) is not None


def test_stf_params_gated_by_invoke_stf():
    class P:
        def __init__(self, on):
            self.on = on

        def opt_int(self, sec, name, default):
            return self.on if name == "invoke_stf" else default

        def opt_float(self, sec, name, default):
            return default

        def opt_string(self, sec, name, default):
            return default

    assert StructureFindingParams.from_params(P(0), False) is None
    assert StructureFindingParams.from_params(P(1), False) is not None
