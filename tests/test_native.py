"""Native (C++/OpenMP) bucketing vs the JAX reference implementation."""

import numpy as np
import jax.numpy as jnp
import pytest

from swift_subtask_dev_tpu.grid import CellGrid, bucket_fields
from swift_subtask_dev_tpu import native


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
def test_native_bucketing_matches_jax():
    rng = np.random.default_rng(7)
    n = 20000
    grid = CellGrid(box=(1.0, 2.0, 0.5), cdim=(8, 16, 4), K=128)
    pos = rng.uniform(0, 1, (n, 3)) * np.array([1.0, 2.0, 0.5])
    m = rng.uniform(1, 2, n).astype(np.float32)
    pid = np.arange(n, dtype=np.int32)

    nf, nmask, noff, nover = native.bucket_fields_native(
        grid, pos, {"m": m, "pid": pid})
    jf, jmask, joff, jover = bucket_fields(
        grid, jnp.asarray(pos), {"m": jnp.asarray(m),
                                 "pid": jnp.asarray(pid)})
    assert nover == int(jover) == 0
    assert int(nmask.sum()) == int(jmask.sum()) == n

    # per-particle equality independent of slot ordering: compare sorted
    # (cell, pid, m, off) tuples
    def canon(mask, pidt, mt, offt):
        mask = np.asarray(mask) > 0
        cells = np.nonzero(mask.reshape(grid.C, grid.K))[0]
        p = np.asarray(pidt).reshape(-1)[mask.reshape(-1)]
        order = np.argsort(p)
        return (cells[order], p[order],
                np.asarray(mt).reshape(-1)[mask.reshape(-1)][order],
                np.asarray(offt).reshape(-1, 3)[mask.reshape(-1)][order])

    c1, p1, m1, o1 = canon(nmask, nf["pid"], nf["m"], noff)
    c2, p2, m2, o2 = canon(jmask, jf["pid"], jf["m"], joff)
    np.testing.assert_array_equal(p1, p2)
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_allclose(m1, m2)
    np.testing.assert_allclose(o1, o2, atol=1e-6)


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
def test_native_max_cell_count():
    grid = CellGrid(box=(1.0, 1.0, 1.0), cdim=(4, 4, 4), K=64)
    pos = np.full((17, 3), 0.1)  # all in one cell
    assert native.max_cell_count(grid, pos) == 17


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
def test_native_overflow():
    grid = CellGrid(box=(1.0, 1.0, 1.0), cdim=(4, 4, 4), K=8)
    pos = np.full((20, 3), 0.1)
    _, mask, _, nover = native.bucket_fields_native(grid, pos, {})
    assert nover == 12
    assert int(mask.sum()) == 8
