"""Multi-species engine: gas+DM co-evolution (SmallCosmoVolume config).

Checks: (1) gas-only MultiEngine reproduces the single-species Engine
step-for-step; (2) a uniform comoving gas+DM box stays static (cosmological
fixed point); (3) joint gravity sources both species.
"""

import numpy as np
import jax.numpy as jnp

from swift_subtask_dev_tpu.engine import Engine, EngineConfig
from swift_subtask_dev_tpu.engine_multi import MultiEngine
from swift_subtask_dev_tpu.grid import CellGrid
from swift_subtask_dev_tpu.models.cosmology import Cosmology
from swift_subtask_dev_tpu.models.gravity import GravityParams, GravitySolver
from swift_subtask_dev_tpu.models.sph.sphenix import SPHENIXParams
from swift_subtask_dev_tpu.ics import uniform_box_ic, bcc_lattice
from swift_subtask_dev_tpu.utils.units import COSMO_UNITS


def test_gas_only_multi_matches_single():
    ic = uniform_box_ic(n=6, jitter=0.1, seed=2)
    P = SPHENIXParams(h_max=0.4)
    grid = CellGrid(box=(1.0, 1.0, 1.0), cdim=(3, 3, 3), K=48)
    cfg = EngineConfig(dt_max=5e-4)

    e1 = Engine(grid, P, cfg, 0.0, 1.0)
    e1.load_particles(ic["pos"], ic["m"], ic["v"], ic["u"], ic["h"])
    e1.init_particles()

    e2 = MultiEngine(grid, P, cfg, 0.0, 1.0)
    e2.load_gas(ic["pos"], ic["m"], ic["v"], ic["u"], ic["h"])
    e2.init_particles()

    for _ in range(3):
        e1.step()
        e2.step()

    for k in ("off", "v_full", "u_full", "h", "rho", "time_bin"):
        a = np.asarray(e1.state[k])
        b = np.asarray(e2.state["gas"][k])
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7, err_msg=k)


def test_gas_dm_cosmo_uniform_static():
    cosmo = Cosmology(Omega_cdm=0.75, Omega_b=0.25, Omega_lambda=0.0,
                      h=0.7, a_begin=0.5, a_end=1.0,
                      phys_const=COSMO_UNITS.constants())
    ic = uniform_box_ic(n=6, u0=1e-8)
    dm_pos = bcc_lattice((6, 6, 6), (1.0, 1.0, 1.0))
    n_dm = len(dm_pos)
    # offset DM off the gas lattice
    dm_pos = np.mod(dm_pos + 0.031, 1.0)

    P = SPHENIXParams(h_max=0.3)
    grid = CellGrid(box=(1.0, 1.0, 1.0), cdim=(3, 3, 3), K=128)
    gp = GravityParams(G=1.0, eps=5e-3, mesh_N=32)
    solver = GravitySolver(gp, grid)

    def gfn(species):
        return solver.accelerations(species)

    cfg = EngineConfig(dt_max=1e30, with_self_gravity=True,
                       p2p_reach=solver.pm.r_cut, eta_grav=gp.eta)
    eng = MultiEngine(grid, P, cfg, 0.0, 0.0, gravity_fn=gfn,
                      eps_soft=gp.eps, cosmology=cosmo)
    eng.load_gas(ic["pos"], ic["m"], ic["v"], ic["u"], ic["h"])
    eng.load_dm(dm_pos, np.full(n_dm, 3.0 / n_dm, np.float32),
                np.zeros((n_dm, 3), np.float32))
    eng.init_particles()
    for _ in range(4):
        eng.step()

    a_now = cosmo.a_of_ti(eng.timeline.ti_current)
    assert a_now > 0.5

    H_L = float(cosmo.H(a_now)) * 1.0
    for sp in ("gas", "dm"):
        m = np.asarray(eng.state[sp]["mask"]) > 0
        v = np.asarray(eng.state[sp]["v_full"])[m]
        assert np.abs(v).max() < 2e-2 * H_L, \
            f"{sp} peculiar velocities grew: {np.abs(v).max()} vs {H_L}"


def test_joint_gravity_pulls_dm_to_gas():
    """A massive gas blob must accelerate nearby DM (cross-species force)."""
    P = SPHENIXParams(h_max=0.3)
    grid = CellGrid(box=(1.0, 1.0, 1.0), cdim=(3, 3, 3), K=64)
    gp = GravityParams(G=1.0, eps=1e-3, mesh_N=32)
    solver = GravitySolver(gp, grid)

    def gfn(species):
        return solver.accelerations(species)

    cfg = EngineConfig(dt_max=1e-4, with_self_gravity=True,
                       p2p_reach=solver.pm.r_cut, eta_grav=gp.eta)
    eng = MultiEngine(grid, P, cfg, 0.0, 1.0, gravity_fn=gfn,
                      eps_soft=gp.eps)
    # a tight gas clump at the centre
    rng = np.random.default_rng(5)
    n_gas = 64
    gas_pos = 0.5 + 0.02 * rng.standard_normal((n_gas, 3))
    eng.load_gas(gas_pos, np.full(n_gas, 1.0 / n_gas, np.float32),
                 np.zeros((n_gas, 3), np.float32),
                 np.full(n_gas, 1e-6, np.float32),
                 np.full(n_gas, 0.05, np.float32))
    # one DM particle off-centre
    eng.load_dm(np.asarray([[0.62, 0.5, 0.5]]),
                np.asarray([1e-8], np.float32),
                np.zeros((1, 3), np.float32))
    eng.init_particles()

    acc = np.asarray(eng.state["dm"]["a_grav"])
    mask = np.asarray(eng.state["dm"]["mask"]) > 0
    a_dm = acc[mask][0]
    assert a_dm[0] < -0.1, f"DM not pulled toward gas clump: {a_dm}"
    assert abs(a_dm[1]) < 0.3 * abs(a_dm[0])
    assert abs(a_dm[2]) < 0.3 * abs(a_dm[0])
