"""Cooling + entropy floor (reference src/cooling/const_lambda,
src/entropy_floor/EAGLE).  SubgridTests-style unit checks: du/dt vs the
analytic rate, floor limiting, and energy decay in a real engine run.
"""

import numpy as np
import jax.numpy as jnp

from swift_subtask_dev_tpu.engine import Engine, EngineConfig
from swift_subtask_dev_tpu.grid import CellGrid
from swift_subtask_dev_tpu.models.sph.sphenix import (CosmoFactors,
                                                      SPHENIXParams)
from swift_subtask_dev_tpu.ics import uniform_box_ic
from swift_subtask_dev_tpu.subgrid.cooling import (ConstDuCooling,
                                                   ConstLambdaCooling,
                                                   make_cooling_fn)
from swift_subtask_dev_tpu.subgrid.entropy_floor import EagleEntropyFloor
from swift_subtask_dev_tpu.utils.units import UnitSystem


def _state(u=1.0, rho=2.0, u_dt=0.0, n=8):
    return {
        "u_full": jnp.full((n,), u, jnp.float32),
        "rho": jnp.full((n,), rho, jnp.float32),
        "u_dt": jnp.full((n,), u_dt, jnp.float32),
    }


def test_const_lambda_rate():
    """du/dt = -Lambda n_H^2 / rho with n_H = X_H rho / m_p
    (const_lambda/cooling.h:46-66), checked in plain internal units."""
    model = ConstLambdaCooling(coeff=3.0 * 0.7 ** 2)
    rho = jnp.asarray([2.0], jnp.float32)
    du = model.du_dt_physical(rho, jnp.asarray([1.0], jnp.float32))
    expect = -3.0 * (0.7 * 2.0) ** 2 / 2.0
    np.testing.assert_allclose(np.asarray(du), expect, rtol=1e-6)


def test_cgs_conversion_roundtrip():
    """Internal-unit Lambda reproduces the cgs du/dt in cgs units."""
    us = UnitSystem(UnitMass_in_cgs=1.989e43, UnitLength_in_cgs=3.0857e24,
                    UnitVelocity_in_cgs=1e5)
    pc = us.constants()
    lam_cgs = 1e-22  # erg cm^3 / s
    model = ConstLambdaCooling.from_cgs(lam_cgs, us, pc,
                                        hydrogen_mass_fraction=0.75)
    rho_cgs = 1e-25  # g/cm^3
    rho_int = rho_cgs * us.from_cgs("density")
    du_int = float(model.du_dt_physical(jnp.float32(rho_int),
                                        jnp.float32(1.0)))
    # analytic cgs: -lam * (X rho/mp)^2 / rho
    mp = 1.67262192369e-24
    du_cgs = -lam_cgs * (0.75 * rho_cgs / mp) ** 2 / rho_cgs
    # convert the internal specific-energy rate back to cgs and compare
    rate_to_cgs = (us.to_cgs("energy") / us.UnitMass_in_cgs
                   / us.UnitTime_in_cgs)
    np.testing.assert_allclose(du_int * rate_to_cgs, du_cgs, rtol=1e-5)


def test_floor_limits_cooling():
    """total du/dt is clipped so u cannot cross the floor in 1.5 dt
    (cooling_cool_part, const_lambda/cooling.h:131)."""
    floor = EagleEntropyFloor(jeans_density_threshold=1.0,
                              jeans_pressure_norm=2.0 / 3.0,  # u_floor = 1
                              jeans_gamma_eff=1.0,
                              rho_crit_baryon_0=0.0)
    # at rho=1: P = 2/3 -> u_floor = P/((gamma-1) rho) = 1
    fn = make_cooling_fn(ConstDuCooling(cooling_rate=100.0), floor=floor)
    s = _state(u=1.5, rho=1.0)
    out = fn(s, CosmoFactors.no_cosmo(), jnp.float32(0.1))
    u_after_15 = 1.5 + float(out["u_dt"][0]) * 0.15
    np.testing.assert_allclose(u_after_15, 1.0, rtol=1e-5)


def test_zero_dt_is_noop():
    fn = make_cooling_fn(ConstDuCooling(cooling_rate=10.0))
    s = _state(u=1.0, u_dt=0.25)
    out = fn(s, CosmoFactors.no_cosmo(), jnp.float32(0.0))
    np.testing.assert_allclose(np.asarray(out["u_dt"]), 0.25)


def test_engine_run_cools():
    """A uniform box with const-du cooling loses internal energy at the
    imposed rate (engine integration; cooling rewrites u_dt pre-kick2)."""
    ic = uniform_box_ic(n=6, jitter=0.0, u0=1.0)
    P = SPHENIXParams(h_max=0.4)
    grid = CellGrid(box=(1.0, 1.0, 1.0), cdim=(3, 3, 3), K=48)
    rate = 5.0
    fn = make_cooling_fn(ConstDuCooling(cooling_rate=rate))
    eng = Engine(grid, P, EngineConfig(dt_max=2e-3), 0.0, 1.0,
                 cooling_fn=fn)
    eng.load_particles(ic["pos"], ic["m"], ic["v"], ic["u"], ic["h"])
    eng.init_particles()
    mask = np.asarray(eng.state["mask"]) > 0
    u0 = np.asarray(eng.state["u_full"])[mask].mean()
    t0 = eng.time
    for _ in range(6):
        eng.step()
    dt = eng.time - t0
    u1 = np.asarray(eng.state["u_full"])[mask].mean()
    np.testing.assert_allclose(u1, u0 - rate * dt, rtol=0.05)
