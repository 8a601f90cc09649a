"""Unconverged/inactive-subset skipping on the flat engine.

pair_apply(active_i=...) zeroes the packed block-range words of i-tiles
with no active particle (the runner_ghost.c:1085 subset-loop analog and
the hierarchical-timestep masked-inactive cost eliminator).  Tiles with
ANY active particle must be computed in full; skipped tiles return 0
sums, and the engine's active-masked merges keep their old values.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from swift_subtask_dev_tpu.engine import _gas_loops, EngineConfig, Engine
from swift_subtask_dev_tpu.grid import CellGrid
from swift_subtask_dev_tpu.ics import uniform_box_ic
from swift_subtask_dev_tpu.models.sph.sphenix import (CosmoFactors,
                                                      SPHENIXParams)
from swift_subtask_dev_tpu.ops import hydro_pallas


@pytest.fixture(scope="module")
def setup():
    ic = uniform_box_ic(n=8, jitter=0.25, seed=11)
    P = SPHENIXParams(h_max=float(ic["h"].max() * 3))
    rng = float(ic["h"].max() * P.kernel.gamma * 1.25)
    grid3 = CellGrid.build_for_positions(ic["box"], interaction_range=rng,
                                         pos=ic["pos"], headroom=1.6)
    gridF = CellGrid.build_columns(ic["box"], interaction_range=rng,
                                   pos=ic["pos"])

    def state_for(grid, backend):
        eng = Engine(grid, P, EngineConfig(dt_max=2e-4, backend=backend),
                     0.0, 1.0)
        eng.load_particles(ic["pos"], ic["m"], ic["v"], ic["u"], ic["h"])
        eng.init_particles()
        return dict(eng.state)

    return ic, P, grid3, gridF, state_for


def _perpid(s, x, sel=None):
    pid = np.asarray(s["pid"]).ravel()
    m = np.asarray(s["mask"]).ravel() > 0
    if sel is not None:
        m = m & np.asarray(sel).ravel()
    x = np.asarray(x)
    x = x.reshape(-1, *x.shape[2:])
    return x[m][np.argsort(pid[m])]


def test_density_subset_matches_full_on_computed_tiles(setup):
    ic, P, grid3, gridF, state_for = setup
    s = state_for(gridF, "flat")
    pid = np.asarray(s["pid"])
    act = jnp.asarray(((pid % 4) == 0) & (np.asarray(s["mask"]) > 0))

    full = hydro_pallas.density_loop(gridF, s, P, engine="flat")
    sub = hydro_pallas.density_loop(gridF, s, P, engine="flat",
                                    active_i=act)
    C, W = np.asarray(s["mask"]).shape
    tflag = np.any(np.asarray(act).reshape(C, W // 128, 128), axis=2)
    in_tile = np.broadcast_to(tflag[:, :, None],
                              (C, W // 128, 128)).reshape(C, W)
    for k in full:
        a = _perpid(s, full[k], in_tile)
        b = _perpid(s, sub[k], in_tile)
        np.testing.assert_allclose(b, a, rtol=1e-6, atol=1e-7,
                                   err_msg=k)
        # skipped tiles: sums identically zero
        z = _perpid(s, sub[k], ~in_tile)
        assert np.all(z == 0.0), k


def test_gas_loops_mixed_activity_matches_stencil(setup):
    """Full density+ghost -> gradient -> force chain with a mixed active
    mask: flat (tile-skipping) == stencil (full compute, active merge)."""
    ic, P, grid3, gridF, state_for = setup
    cosmo = CosmoFactors.no_cosmo()
    dt_alpha = jnp.zeros(64, jnp.float32)

    out = {}
    for grid, backend in ((grid3, "xla"), (gridF, "flat")):
        s = state_for(grid, backend)
        pid = np.asarray(s["pid"])
        act = jnp.asarray(((pid % 3) == 0) & (np.asarray(s["mask"]) > 0))
        cfg = EngineConfig(dt_max=2e-4, backend=backend)
        s2, _ = _gas_loops(grid, P, cfg, cosmo, s, act, dt_alpha)
        out[backend] = (s, s2, act)

    (s3, r3, a3), (sf, rf, af) = out["xla"], out["flat"]
    for k in ("rho", "h", "a_hydro", "u_dt", "h_dt", "v_sig",
              "laplace_u", "alpha_visc"):
        a = _perpid(s3, r3[k])
        b = _perpid(sf, rf[k])
        scale = np.max(np.abs(a)) + 1e-30
        assert np.max(np.abs(a - b)) / scale < 5e-5, k
