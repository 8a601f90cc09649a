"""Sharded production paths: DMO gravity, multi-species, FOF.

VERDICT item: 'explicit multi-chip execution of the production paths'.
Each test runs the REAL step (P2P + PM gravity, multi-species KDK, FOF
label propagation) sharded over a virtual 4-device mesh and matches the
single-device result — the analog of the reference validating multi-rank
physics against the single-node answer (SURVEY §4.4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from swift_subtask_dev_tpu.engine import (DMEngine, EngineConfig,
                                          _JIT_DM_STEP)
from swift_subtask_dev_tpu.engine_multi import (MultiEngine,
                                                _JIT_MULTI_STEP)
from swift_subtask_dev_tpu.grid import CellGrid
from swift_subtask_dev_tpu.grid.cellgrid import bucket_fields
from swift_subtask_dev_tpu.models.gravity import GravityParams, GravitySolver
from swift_subtask_dev_tpu.models.sph.sphenix import SPHENIXParams
from swift_subtask_dev_tpu.ics import uniform_box_ic
from swift_subtask_dev_tpu.parallel import (cell_sharding, make_mesh,
                                            shard_multi_state, shard_state,
                                            sharded_dm_step,
                                            sharded_multi_step)

NDEV = 4

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < NDEV, reason=f"needs >= {NDEV} devices")


def _dm_engine():
    rng = np.random.default_rng(3)
    n = 400
    pos = rng.uniform(0, 1, (n, 3))
    m = rng.uniform(0.5, 1.5, n).astype(np.float32)
    gp = GravityParams(G=1.0, eps=0.02, mesh_N=24)
    grid = CellGrid(box=(1.0, 1.0, 1.0), cdim=(NDEV, 3, 3), K=80)
    solver = GravitySolver(gp, grid)
    assert not solver.use_fmm and min(grid.edge) >= solver.pm.r_cut

    def gfn(s):
        [(acc, pot)] = solver.accelerations([s])
        return acc, pot

    eng = DMEngine(grid, EngineConfig(dt_max=1e-3,
                                      rebucket_every_step=True,
                                      p2p_reach=solver.pm.r_cut,
                                      eta_grav=gp.eta),
                   0.0, 1.0, gravity_fn=gfn, eps_soft=gp.eps)
    eng.load_dm(pos, m, np.zeros((n, 3), np.float32))
    eng.init_particles()
    return eng


def test_sharded_dmo_step_matches_single_device():
    """P2P + PM-FFT gravity step sharded == single device."""
    mesh = make_mesh(NDEV)
    eng = _dm_engine()
    T = eng._tables(dt_drift=2e-4)
    ref_state, ref_diag = _JIT_DM_STEP(eng.grid, eng.cfg, eng.gravity_fn,
                                       eng.eps_soft, eng.state, T)
    st = shard_state(eng.state, eng.grid, mesh)
    step = sharded_dm_step(eng.grid, eng.cfg, eng.gravity_fn,
                           eng.eps_soft, mesh)
    new_state, diag = step(st, T)
    assert int(diag["n_active"]) == int(ref_diag["n_active"])
    for key in ("a_grav", "v_full", "time_bin", "mask", "pot"):
        # rtol 3e-5: the spectral-gradient mesh runs three extra inverse
        # FFTs whose sharded (all_to_all slab) evaluation rounds in a
        # different order than single-device rfftn — a halo bug shows
        # as ~1e-2 errors across whole boundary cells, not 1e-5 noise
        np.testing.assert_allclose(
            np.asarray(new_state[key]), np.asarray(ref_state[key]),
            rtol=3e-5, atol=1e-6, err_msg=key)


def test_sharded_multi_step_matches_single_device():
    """Gas+DM joint short-range gravity + SPH, sharded == single."""
    mesh = make_mesh(NDEV)
    ic = uniform_box_ic(n=2 * NDEV, jitter=0.05, seed=1)
    n = len(ic["pos"])
    rng = np.random.default_rng(2)
    pos_dm = rng.uniform(0, 1, (n, 3))
    gp = GravityParams(G=1.0, eps=0.02, mesh_N=24)
    P = SPHENIXParams(h_max=float(ic["h"].max() * 3))
    K = int(np.ceil(n / (NDEV * 9) * 3 / 8)) * 8
    grid = CellGrid(box=(1.0, 1.0, 1.0), cdim=(NDEV, 3, 3), K=K)
    grid.validate_range(float(ic["h"].max() * P.kernel.gamma))
    solver = GravitySolver(gp, grid)
    cfg = EngineConfig(dt_max=1e-3, rebucket_every_step=True,
                       max_ghost_iterations=2, ghost_unroll=True,
                       stencil_scan=True, with_self_gravity=True,
                       eps_soft=gp.eps, p2p_reach=solver.pm.r_cut)
    eng = MultiEngine(grid, P, cfg, 0.0, 1.0,
                      gravity_fn=solver.short_range_accelerations,
                      eps_soft=gp.eps)
    eng.load_gas(ic["pos"], ic["m"], ic["v"], ic["u"], ic["h"])
    eng.load_dm(pos_dm, np.full(n, 1.0 / n, np.float32),
                np.zeros((n, 3), np.float32))
    eng.init_particles()
    T = eng._tables(dt_drift=2e-4)

    ref_state, ref_diag = _JIT_MULTI_STEP(
        eng.grid, eng.sph, eng.cfg, eng.gravity_fn, eng.eps_soft,
        eng.cosmo, eng.state, T, None, None, None, None)

    st = shard_multi_state(eng.state, eng.grid, mesh)
    step = sharded_multi_step(eng.grid, eng.sph, eng.cfg, eng.gravity_fn,
                              eng.eps_soft, eng.cosmo, mesh)
    new_state, diag = step(st, T)
    assert int(diag["n_active"]) == int(ref_diag["n_active"])
    for name in ("gas", "dm"):
        for key in ("v_full", "a_grav", "mask", "time_bin"):
            np.testing.assert_allclose(
                np.asarray(new_state[name][key]),
                np.asarray(ref_state[name][key]),
                rtol=1e-5, atol=1e-6, err_msg=f"{name}.{key}")


def test_sharded_fof_matches_single_device():
    """FOF label propagation sharded over x-slabs: the iterative min-label
    sweeps' rolls become halo collectives (fof.c:2812 MPI merge analog)."""
    from swift_subtask_dev_tpu.ops.fof import fof_labels

    mesh = make_mesh(NDEV)
    rng = np.random.default_rng(7)
    # clustered blobs straddling shard boundaries
    centers = rng.uniform(0, 1, (10, 3))
    pos = np.concatenate([c + rng.normal(0, 0.01, (30, 3))
                          for c in centers]) % 1.0
    grid = CellGrid(box=(1.0, 1.0, 1.0), cdim=(NDEV, 4, 4), K=128)
    f, mask, off, nov = bucket_fields(grid, jnp.asarray(pos), {})
    assert int(nov) == 0
    ell = 0.05

    labels_ref, _ = fof_labels(grid, mask, off, ell)

    shard_c = cell_sharding(mesh)
    mask_s = jax.device_put(mask, shard_c)
    off_s = jax.device_put(off, shard_c)
    labels_sh, _ = jax.jit(
        lambda m, o: fof_labels(grid, m, o, ell))(mask_s, off_s)
    np.testing.assert_array_equal(np.asarray(labels_sh),
                                  np.asarray(labels_ref))
