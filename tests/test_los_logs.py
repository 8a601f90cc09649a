"""Line-of-sight output + timesteps log tests."""

import numpy as np
import h5py
import jax.numpy as jnp

from swift_subtask_dev_tpu.grid import CellGrid, bucket_fields
from swift_subtask_dev_tpu.io.line_of_sight import (
    select_los_particles, write_los)
from swift_subtask_dev_tpu.io.logs import TimestepsWriter


def test_los_selection_and_write(tmp_path):
    rng = np.random.default_rng(1)
    n = 2000
    pos = rng.uniform(0, 1, (n, 3))
    h = np.full(n, 0.02, np.float32)
    gamma = 1.825742

    # analytic expectation: cylinder of radius gamma*h around the z-line
    sel = select_los_particles(pos, h, gamma, 2, (0.5, 0.5), (1, 1, 1))
    b = np.hypot(pos[:, 0] - 0.5, pos[:, 1] - 0.5)
    np.testing.assert_array_equal(sel, b < gamma * 0.02)

    # tiled state -> LOS file
    grid = CellGrid(box=(1.0, 1.0, 1.0), cdim=(4, 4, 4), K=64)
    f, mask, off, _ = bucket_fields(grid, jnp.asarray(pos), {
        "h": jnp.asarray(h),
        "m": jnp.ones(n, dtype=jnp.float32),
        "v_full": jnp.zeros((n, 3), jnp.float32),
        "u_full": jnp.ones(n, dtype=jnp.float32),
        "rho": jnp.ones(n, dtype=jnp.float32)})
    state = {"mask": mask, "off": off, **f}
    path = str(tmp_path / "los.hdf5")
    counts = write_los(path, grid, state, gamma,
                       [(2, 0.5, 0.5), (0, 0.25, 0.75)])
    assert counts[0] == int(sel.sum())
    with h5py.File(path) as fh:
        assert fh["Header"].attrs["NumLOS"] == 2
        g = fh["LOS_0000"]
        assert g.attrs["NumParts"] == counts[0]
        assert len(g["Coordinates"]) == counts[0]
        assert "InternalEnergies" in g


def test_timesteps_log(tmp_path):
    p = str(tmp_path / "timesteps.txt")
    w = TimestepsWriter(p)
    diag = {"bin_counts": np.zeros(57, int), "n_active": 100,
            "n_ghost_iter": 2}
    diag["bin_counts"][30] = 60
    diag["bin_counts"][32] = 40
    w.write(1, 0.001, 1e-4, diag)
    w.write(2, 0.002, 1e-4, diag)
    lines = open(p).read().strip().split("\n")
    assert len(lines) == 3
    cols = lines[1].split()
    assert cols[0] == "1" and cols[4] == "30" and cols[5] == "32"
