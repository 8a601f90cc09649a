"""Distributed slab-FFT Poisson solve (mesh_gravity_mpi.c analog) vs the
single-device rfftn path, on a virtual 8-device CPU mesh."""

import numpy as np
import pytest

from swift_subtask_dev_tpu.ops.pm_gravity import (
    PMMeshParams, long_range_potential, long_range_potential_sharded)


@pytest.mark.parametrize("N", [16, 48])
def test_sharded_fft_matches(N):
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    pm = PMMeshParams(N=N, box=(1.0, 1.0, 1.0), a_smooth=1.25,
                      r_cut_max_ratio=4.5)
    rng = np.random.default_rng(3)
    grid = rng.standard_normal((N, N, N)).astype(np.float32)
    ref = np.asarray(long_range_potential(pm, grid, G=1.0))
    out = np.asarray(long_range_potential_sharded(pm, grid, G=1.0,
                                                  n_shards=8))
    scale = np.abs(ref).max() + 1e-30
    np.testing.assert_allclose(out, ref, atol=2e-5 * scale, rtol=0)


def test_sharded_fft_indivisible_raises():
    pm = PMMeshParams(N=20, box=(1.0, 1.0, 1.0), a_smooth=1.25,
                      r_cut_max_ratio=4.5)
    with pytest.raises(ValueError):
        long_range_potential_sharded(pm, np.zeros((20, 20, 20)), 1.0,
                                     n_shards=8)
