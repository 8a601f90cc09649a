"""Multi-device tests: the sharded step must reproduce the single-device
step bit-for-bit (same program, GSPMD only changes the schedule).

The reference can only test its distributed layer under real mpirun
(SURVEY §4.4); here a virtual 8-device CPU mesh exercises the sharded
compile + halo-exchange collectives in every CI run.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from swift_subtask_dev_tpu.engine import (Engine, EngineConfig, hydro_step,
                                          _JIT_STEP)
from swift_subtask_dev_tpu.grid import CellGrid
from swift_subtask_dev_tpu.models.sph.sphenix import SPHENIXParams
from swift_subtask_dev_tpu.ics import uniform_box_ic
from swift_subtask_dev_tpu.parallel import (cell_sharding, make_mesh,
                                            shard_state, sharded_hydro_step)

NDEV = 4  # enough to force real halo traffic; keeps the compile tractable

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < NDEV, reason=f"needs >= {NDEV} devices")


def _problem(ncx):
    ic = uniform_box_ic(n=2 * ncx, jitter=0.05, seed=1)
    P = SPHENIXParams(h_max=float(ic["h"].max() * 3))
    K = int(np.ceil(len(ic["pos"]) / (ncx * 9) * 3 / 8)) * 8
    grid = CellGrid(box=ic["box"], cdim=(ncx, 3, 3), K=K)
    grid.validate_range(float(ic["h"].max() * P.kernel.gamma))
    cfg = EngineConfig(dt_max=1e-3, rebucket_every_step=True,
                       max_ghost_iterations=2, ghost_unroll=True,
                       stencil_scan=True)
    eng = Engine(grid, P, cfg, 0.0, 1.0)
    eng.load_particles(ic["pos"], ic["m"], ic["v"], ic["u"], ic["h"])
    eng.init_particles()
    return eng


def test_roll_stencil_halo_exchange():
    """A sharded jnp.roll (the stencil's halo exchange) matches unsharded."""
    mesh = make_mesh(NDEV)
    x = jnp.arange(NDEV * 2 * 3 * 8, dtype=jnp.float32).reshape(
        NDEV * 2, 3, 8)
    xs = jax.device_put(x, cell_sharding(mesh))

    f = jax.jit(lambda a: jnp.roll(a, shift=-1, axis=0) * 2.0)
    np.testing.assert_array_equal(np.asarray(f(xs)), np.asarray(f(x)))


def test_sharded_step_matches_single_device():
    """Full engine step (rebucket + unrolled ghost ON) sharded == single."""
    mesh = make_mesh(NDEV)
    eng = _problem(ncx=NDEV)
    T = eng._tables(dt_drift=2e-4)

    ref_state, ref_diag = _JIT_STEP(eng.grid, eng.sph, eng.cfg, None,
                                    eng.cosmo, eng.state, T)

    state_sh = shard_state(eng.state, eng.grid, mesh)
    step = sharded_hydro_step(eng.grid, eng.sph, eng.cfg, None, eng.cosmo,
                              mesh)
    new_state, diag = step(state_sh, T)

    assert int(diag["n_active"]) == int(ref_diag["n_active"])
    assert int(diag["n_overflow"]) == 0
    for key in ("rho", "h", "u", "v_full", "a_hydro", "time_bin", "mask"):
        np.testing.assert_allclose(
            np.asarray(new_state[key]), np.asarray(ref_state[key]),
            rtol=5e-6, atol=1e-7, err_msg=f"field {key} diverged")


def test_shard_state_layout():
    """Cell-tile arrays land sharded over x-slabs, tables replicated."""
    mesh = make_mesh(NDEV)
    eng = _problem(ncx=NDEV)
    st = shard_state(eng.state, eng.grid, mesh)
    shard_c = cell_sharding(mesh)
    assert st["rho"].sharding.is_equivalent_to(shard_c, st["rho"].ndim)
    # a wrong-cdim grid must be rejected (device must own whole x-slabs)
    bad_grid = CellGrid(box=eng.grid.box, cdim=(NDEV + 1, 3, 3), K=8)
    with pytest.raises(ValueError):
        shard_state({"rho": jnp.zeros((bad_grid.C, 8))}, bad_grid, mesh)
