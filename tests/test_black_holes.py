"""EAGLE black holes: Bondi growth, gas swallowing, AGN heating.

The VERDICT gate: a BH grows by swallowing gas in a dense environment
and heats gas via AGN events, with (gas + BH dynamical) mass conserved —
the masked-scatter analog of bh_swallow/do_gas_swallow/bh_feedback
(black_holes/EAGLE/black_holes_iact.h:398, runner_black_holes.c)."""

import numpy as np
import jax.numpy as jnp

from swift_subtask_dev_tpu.engine import EngineConfig
from swift_subtask_dev_tpu.engine_multi import MultiEngine
from swift_subtask_dev_tpu.grid import CellGrid
from swift_subtask_dev_tpu.models.sph.sphenix import SPHENIXParams
from swift_subtask_dev_tpu.subgrid.black_holes import (EagleBlackHoles,
                                                       seed_from_fof)
from swift_subtask_dev_tpu.ics import uniform_box_ic


def _setup(bh_model):
    ic = uniform_box_ic(n=6, jitter=0.08, seed=5)
    # h_max under edge/gamma (27-stencil coverage)
    p = SPHENIXParams(h_max=0.18)
    grid = CellGrid(box=(1.0, 1.0, 1.0), cdim=(3, 3, 3), K=64)
    eng = MultiEngine(grid, p, EngineConfig(dt_max=5e-4), 0.0, 1.0,
                      bh_model=bh_model)
    eng.load_gas(ic["pos"], ic["m"], ic["v"], ic["u"],
                 np.minimum(ic["h"], 0.18))
    return eng, ic


def _totals(eng):
    out = {}
    for name, sp in eng.state.items():
        mask = np.asarray(sp["mask"]) > 0
        out[name] = float(np.asarray(sp["m"])[mask].sum())
    return out


def test_bh_swallows_and_conserves_mass():
    # huge subgrid/dynamical deficit -> immediate swallowing
    bhm = EagleBlackHoles(G=1.0, c_light=100.0, boost_alpha=1e6,
                          edd_pref=1e9, delta_u=1e9, n_heat=1e9)
    eng, ic = _setup(bhm)
    m_gas = float(np.sum(ic["m"]))
    eng.load_bh(np.array([[0.5, 0.5, 0.5]]), np.array([0.01]),
                np.zeros((1, 3)), h=np.array([0.15]),
                m_subgrid=np.array([0.05]))
    eng.init_particles()
    n_sw = 0
    for _ in range(6):
        diag = eng.step()
        n_sw += int(diag["n_swallowed"])
    assert n_sw > 0, "no gas swallowed despite a large mass deficit"
    tot = _totals(eng)
    np.testing.assert_allclose(tot["gas"] + tot["bh"], m_gas + 0.01,
                               rtol=1e-5)
    # the dynamical mass moved toward the subgrid mass
    bh = eng.state["bh"]
    mask = np.asarray(bh["mask"]) > 0
    assert float(np.asarray(bh["m"])[mask][0]) > 0.01
    # gas count dropped by exactly the swallowed number
    n_gas = int((np.asarray(eng.state["gas"]["mask"]) > 0).sum())
    assert n_gas == len(ic["pos"]) - n_sw


def test_bh_bondi_growth_and_agn_heating():
    # no swallowing (subgrid == dynamical), strong Bondi + cheap AGN
    bhm = EagleBlackHoles(G=1.0, c_light=10.0, boost_alpha=1e4,
                          edd_pref=1e9, eps_r=0.1, eps_f=0.15,
                          delta_u=0.5, n_heat=0.1)
    eng, ic = _setup(bhm)
    eng.load_bh(np.array([[0.5, 0.5, 0.5]]), np.array([0.02]),
                np.zeros((1, 3)), h=np.array([0.15]))
    eng.init_particles()
    bh0 = float(np.asarray(eng.state["bh"]["m_subgrid"]).max())
    u0 = float(np.asarray(eng.state["gas"]["u_full"]).sum())
    n_agn = 0
    for _ in range(8):
        diag = eng.step()
        n_agn += int(diag["n_agn"])
    bh1 = float(np.asarray(eng.state["bh"]["m_subgrid"]).max())
    assert bh1 > bh0, "no Bondi growth"
    assert n_agn > 0, "AGN never fired"
    u1 = float(np.asarray(eng.state["gas"]["u_full"]).sum())
    assert u1 > u0, "AGN heating did not raise the gas energy"
    mdot = np.asarray(eng.state["bh"]["mdot"])
    assert np.isfinite(mdot).all()


def test_seed_from_fof():
    bhm = EagleBlackHoles(seed_mass=1e-3, seed_halo_mass=5.0)
    cat = {"group_mass": np.array([10.0, 1.0]),
           "group_com": np.array([[0.2, 0.2, 0.2], [0.8, 0.8, 0.8]])}
    rng = np.random.default_rng(0)
    gas_pos = rng.uniform(0, 1, (100, 3))
    gas_rho = rng.uniform(0.5, 2.0, 100)
    seeds, n = seed_from_fof(cat, gas_pos, gas_rho, bhm)
    assert n == 1 and seeds.shape == (1, 3)
    # near the massive group's centre
    assert np.linalg.norm(seeds[0] - [0.2, 0.2, 0.2]) < 0.5
    # an existing BH suppresses re-seeding
    seeds2, n2 = seed_from_fof(cat, gas_pos, gas_rho, bhm,
                               existing_bh_pos=seeds, min_dist=0.3)
    assert n2 == 0
