"""BH repositioning (potential-minimum jumps) and BH-BH mergers.

References: EAGLE/black_holes_iact.h:290-375 (reposition candidate
selection), black_holes.h:193-230 (the jump),
runner_iact_nonsym_bh_bh_swallow (merger criterion + swallow).
"""

import numpy as np
import jax.numpy as jnp

from swift_subtask_dev_tpu.engine import EngineConfig
from swift_subtask_dev_tpu.engine_multi import MultiEngine
from swift_subtask_dev_tpu.grid import CellGrid
from swift_subtask_dev_tpu.grid.cellgrid import bucket_fields, \
    global_positions
from swift_subtask_dev_tpu.models.sph.sphenix import SPHENIXParams
from swift_subtask_dev_tpu.ics import uniform_box_ic
from swift_subtask_dev_tpu.ops import black_holes as bh_ops
from swift_subtask_dev_tpu.subgrid.black_holes import EagleBlackHoles
from swift_subtask_dev_tpu.subgrid.spin_jet import SpinJetBlackHoles


def _bucket(grid, pos, fields):
    out, mask, off, n_over = bucket_fields(grid, jnp.asarray(pos), fields)
    assert int(n_over) == 0
    return {"mask": mask, "off": off, **out}


def test_reposition_loop_picks_min_potential():
    grid = CellGrid(box=(1.0, 1.0, 1.0), cdim=(4, 4, 4), K=16)
    P = SPHENIXParams(h_max=0.3)
    # gas: a ring of particles around the BH; one has a deep potential
    ang = np.linspace(0, 2 * np.pi, 8, endpoint=False)
    gas_pos = np.stack([0.5 + 0.05 * np.cos(ang),
                        0.5 + 0.05 * np.sin(ang),
                        np.full(8, 0.5)], -1)
    pot = np.zeros(8, np.float32)
    pot[3] = -5.0
    gas = _bucket(grid, gas_pos, {
        "m": jnp.ones((8,), jnp.float32),
        "v_full": jnp.zeros((8, 3), jnp.float32),
        "pot": jnp.asarray(pot)})
    bh = _bucket(grid, np.asarray([[0.5, 0.5, 0.5]]), {
        "h": jnp.asarray([0.1], jnp.float32),
        "v_full": jnp.zeros((1, 3), jnp.float32),
        "cs_gas": jnp.asarray([1.0], jnp.float32)})
    found, delta = bh_ops.bh_reposition_loop(grid, bh, gas, P,
                                             max_dist=0.3)
    bm = np.asarray(bh["mask"]) > 0
    assert bool(np.asarray(found)[bm][0])
    new_pos = (global_positions(grid, np.asarray(bh["off"]))
               + np.asarray(delta))[bm][0]
    np.testing.assert_allclose(new_pos, gas_pos[3], atol=1e-5)

    # velocity cut: a fast candidate is rejected
    gas_fast = {**gas, "v_full": gas["v_full"] + 100.0}
    found2, _ = bh_ops.bh_reposition_loop(grid, bh, gas_fast, P,
                                          max_dist=0.3, v2_max_fac=0.5)
    assert not bool(np.asarray(found2)[bm][0])


def _merger_engine(model, spins=None):
    ic = uniform_box_ic(n=8, jitter=0.05, seed=13)
    P = SPHENIXParams(h_max=0.3)
    grid = CellGrid(box=(1.0, 1.0, 1.0), cdim=(4, 4, 4), K=32)
    eng = MultiEngine(grid, P,
                      EngineConfig(dt_max=1e-5, eps_soft=0.1), 0.0, 1.0,
                      bh_model=model)
    eng.load_gas(ic["pos"], ic["m"], ic["v"], ic["u"], ic["h"])
    eng.load_bh(np.asarray([[0.495, 0.5, 0.5], [0.505, 0.5, 0.5]]),
                np.asarray([2.0, 1.0], np.float32),
                np.zeros((2, 3), np.float32),
                h=np.asarray([0.1, 0.1], np.float32))
    if spins is not None:
        bh = eng.state["bh"]
        bm = np.asarray(bh["mask"]) > 0
        spin = np.zeros(bm.shape, np.float32)
        spin[bm] = spins
        eng.state["bh"] = {**bh, "spin": jnp.asarray(spin)}
    eng.init_particles()
    return eng


def test_bh_bh_merger_conserves_mass_momentum():
    m = EagleBlackHoles(G=1.0, merging_ratio=3.0,
                        merger_threshold="escape_velocity")
    eng = _merger_engine(m)
    bh0 = eng.state["bh"]
    bm0 = np.asarray(bh0["mask"]) > 0
    m_tot0 = float(np.asarray(bh0["m"])[bm0].sum())
    eng.step()
    bh = eng.state["bh"]
    bm = np.asarray(bh["mask"]) > 0
    assert int(bm.sum()) == 1, "lighter BH merged onto the heavier"
    # dynamical + subgrid mass conserved (both started m_subgrid = m)
    np.testing.assert_allclose(float(np.asarray(bh["m"])[bm][0]),
                               m_tot0, rtol=1e-5)
    assert float(np.asarray(bh["m_subgrid"])[bm][0]) >= m_tot0 * (1 - 1e-5)
    # both BHs were at rest: remnant stays at rest
    np.testing.assert_allclose(np.asarray(bh["v_full"])[bm][0], 0.0,
                               atol=1e-6)


def test_bh_bh_merger_respects_escape_velocity():
    """Unbound pairs (v >> v_esc) must NOT merge."""
    m = EagleBlackHoles(G=1e-8, merging_ratio=3.0,
                        merger_threshold="escape_velocity")
    eng = _merger_engine(m)
    bh = eng.state["bh"]
    bm = np.asarray(bh["mask"]) > 0
    v = np.zeros(bm.shape + (3,), np.float32)
    v[bm] = np.asarray([[0.0, 0.0, 0.0], [100.0, 0.0, 0.0]])
    eng.state["bh"] = {**bh, "v_full": jnp.asarray(v)}
    eng.step()
    assert int((np.asarray(eng.state["bh"]["mask"]) > 0).sum()) == 2


def test_spin_jet_merger_updates_spin():
    m = SpinJetBlackHoles(G=1.0, c_light=10.0, seed_spin=0.7,
                          merging_ratio=3.0, include_jets=False,
                          delta_u=1e20, edd_pref=1.0)
    eng = _merger_engine(m, spins=[0.7, 0.7])
    eng.step()
    bh = eng.state["bh"]
    bm = np.asarray(bh["mask"]) > 0
    assert int(bm.sum()) == 1
    a = float(np.asarray(bh["spin"])[bm][0])
    # aligned 0.7+0.7 at q=0.5: remnant spin above either input is
    # possible; must stay in bounds and move off the accretion-only value
    assert 0.01 <= abs(a) <= 0.998
    assert abs(a - 0.7) > 1e-4, "merger changed the spin"
