"""Subgrid model variants: GEAR/QLA star formation, GEAR pressure floor,
GEAR continuous feedback, EAGLE kinetic feedback, QLA cooling, EAGLE
tracers, Default black holes.

References: star_formation/GEAR + QLA, pressure_floor/GEAR,
feedback/GEAR + EAGLE_kinetic, cooling/QLA, tracers/EAGLE,
black_holes/Default.
"""

import numpy as np
import jax.numpy as jnp

from swift_subtask_dev_tpu.engine import CosmoFactors, EngineConfig
from swift_subtask_dev_tpu.engine_multi import MultiEngine
from swift_subtask_dev_tpu.grid import CellGrid
from swift_subtask_dev_tpu.models.sph.sphenix import SPHENIXParams
from swift_subtask_dev_tpu.ics import uniform_box_ic


def _no_cosmo():
    return CosmoFactors.no_cosmo()


# --------------------------------------------------------------------------
# star formation variants
# --------------------------------------------------------------------------

def _sf_state(rho=10.0, u=0.01, div_v=-1.0, h=0.05, n=16):
    return {
        "rho": jnp.full((n,), rho, jnp.float32),
        "u": jnp.full((n,), u, jnp.float32),
        "div_v": jnp.full((n,), div_v, jnp.float32),
        "h": jnp.full((n,), h, jnp.float32),
        "m": jnp.full((n,), 1.0, jnp.float32),
        "pressure": jnp.full((n,), 1.0, jnp.float32),
        "pid": jnp.arange(n, dtype=jnp.int32),
    }


def test_gear_sf_gates():
    """GEAR eligibility: collapsing + T ceiling + density + Jeans
    (star_formation/GEAR/star_formation.h:59-107)."""
    from swift_subtask_dev_tpu.subgrid.star_formation_variants import \
        GEARStarFormation

    sf = GEARStarFormation(efficiency=1.0, u_max=1.0,
                           density_threshold=1.0, jeans_coef=1e-4,
                           kernel_gamma=1.8, G=1.0)
    cosmo = _no_cosmo()
    active = jnp.ones((16,), bool)
    dt = jnp.full((16,), 1e3, jnp.float32)  # huge dt -> prob ~ 1

    conv, sfr = sf.conversion_mask(_sf_state(), cosmo, dt, 0, 0, None,
                                   active)
    assert bool(conv.all()), "dense cold collapsing gas must convert"
    assert float(sfr.min()) > 0

    # expanding gas never converts
    conv, _ = sf.conversion_mask(_sf_state(div_v=+1.0), cosmo, dt, 0, 0,
                                 None, active)
    assert not bool(conv.any())
    # too hot
    conv, _ = sf.conversion_mask(_sf_state(u=10.0), cosmo, dt, 0, 0,
                                 None, active)
    assert not bool(conv.any())
    # below the density threshold
    conv, _ = sf.conversion_mask(_sf_state(rho=0.1), cosmo, dt, 0, 0,
                                 None, active)
    assert not bool(conv.any())
    # Jeans criterion: huge jeans_coef pushes the criterion above rho
    sf2 = GEARStarFormation(efficiency=1.0, u_max=1.0,
                            density_threshold=1.0, jeans_coef=1e8,
                            kernel_gamma=1.8, G=1.0)
    conv, _ = sf2.conversion_mask(_sf_state(), cosmo, dt, 0, 0, None,
                                  active)
    assert not bool(conv.any())


def test_gear_sf_probability_scaling():
    """prob = 1 - exp(-eff dt / t_ff): tiny dt -> (almost) none convert."""
    from swift_subtask_dev_tpu.subgrid.star_formation_variants import \
        GEARStarFormation

    sf = GEARStarFormation(efficiency=1e-6, u_max=1.0,
                           density_threshold=1.0, jeans_coef=1e-4,
                           kernel_gamma=1.8, G=1.0)
    n = 512
    s = _sf_state(n=n)
    dt = jnp.full((n,), 1e-6, jnp.float32)
    conv, _ = sf.conversion_mask(s, _no_cosmo(), dt, 0, 0, None,
                                 jnp.ones((n,), bool))
    # prob ~ eff/t_ff*dt ~ 1e-12 x sqrt(32*10/(3pi)) -> ~0 conversions
    assert int(conv.sum()) == 0


def test_qla_sf_over_density():
    from swift_subtask_dev_tpu.subgrid.star_formation_variants import \
        QLAStarFormation

    sf = QLAStarFormation(over_density=100.0, rho_crit_baryon_0=0.05)
    n = 8
    dt = jnp.full((n,), 1e-3, jnp.float32)
    active = jnp.ones((n,), bool)
    conv, sfr = sf.conversion_mask(_sf_state(rho=10.0, n=n), _no_cosmo(),
                                   dt, 0, 0, None, active)
    assert bool(conv.all()), "rho=10 > 100*0.05=5: immediate conversion"
    conv, _ = sf.conversion_mask(_sf_state(rho=1.0, n=n), _no_cosmo(),
                                 dt, 0, 0, None, active)
    assert not bool(conv.any())


# --------------------------------------------------------------------------
# GEAR pressure floor
# --------------------------------------------------------------------------

def test_pressure_floor_formula():
    """Floor = gamma_k^2 h^2 rho * (4 G N^{2/3}/pi) a^-1 a^(3g-3) rho/g
    (pressure_floor/GEAR/pressure_floor.h:76-84)."""
    from swift_subtask_dev_tpu.subgrid.pressure_floor import \
        GEARPressureFloor

    import math
    G, n_j, kg = 2.0, 10.0, 1.8
    pf = GEARPressureFloor(n_jeans=n_j,
                           constants=4.0 / math.pi * G * n_j ** (2 / 3),
                           kernel_gamma2=kg * kg, hydro_gamma=5 / 3)
    cosmo = _no_cosmo()
    rho, h = jnp.float32(3.0), jnp.float32(0.1)
    got = float(pf.comoving_floor(rho, h, cosmo))
    want = (kg ** 2 * 0.1 ** 2 * 3.0 * (4 / math.pi * G * n_j ** (2 / 3))
            * 3.0 / (5 / 3))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_pressure_floor_in_engine():
    """A binding floor raises the ghost-finalised pressure (and the
    soundspeed from it) for every active particle."""
    import math
    from swift_subtask_dev_tpu.engine import Engine
    from swift_subtask_dev_tpu.subgrid.pressure_floor import \
        GEARPressureFloor

    ic = uniform_box_ic(n=8, jitter=0.05, seed=3)
    P = SPHENIXParams(h_max=0.3)
    grid = CellGrid(box=(1.0, 1.0, 1.0), cdim=(4, 4, 4), K=32)
    # enormous Jeans factor -> floor binds everywhere
    pf = GEARPressureFloor(
        n_jeans=1e6, constants=4.0 / math.pi * 1.0 * (1e6) ** (2 / 3),
        kernel_gamma2=float(P.kernel.gamma) ** 2, hydro_gamma=5 / 3)
    eng = Engine(grid, P, EngineConfig(dt_max=1e-4, pressure_floor=pf),
                 0.0, 1.0)
    eng.load_particles(ic["pos"], ic["m"], ic["v"], ic["u"], ic["h"])
    eng.init_particles()
    eng.step()
    s = eng.state
    mask = np.asarray(s["mask"]) > 0
    floor = np.asarray(pf.comoving_floor(
        jnp.asarray(s["rho"]), jnp.asarray(s["h"]), _no_cosmo()))
    assert (np.asarray(s["pressure"])[mask]
            >= floor[mask] * (1 - 1e-5)).all()
    # soundspeed re-derived from the floored pressure
    cs = np.asarray(s["soundspeed"])[mask]
    cs_want = np.sqrt(5 / 3 * floor[mask]
                      / np.maximum(np.asarray(s["rho"])[mask], 1e-30))
    np.testing.assert_allclose(cs, cs_want, rtol=1e-4)


# --------------------------------------------------------------------------
# feedback variants
# --------------------------------------------------------------------------

def _multi_with_star(feedback, m_star=1.0):
    ic = uniform_box_ic(n=8, jitter=0.05, seed=7)
    P = SPHENIXParams(h_max=0.3)
    grid = CellGrid(box=(1.0, 1.0, 1.0), cdim=(4, 4, 4), K=32)
    eng = MultiEngine(grid, P, EngineConfig(dt_max=1e-4), 0.0, 1.0,
                      feedback=feedback)
    eng.load_gas(ic["pos"], ic["m"], ic["v"], ic["u"], ic["h"])
    eng.load_stars(np.asarray([[0.5, 0.5, 0.5]]),
                   np.asarray([m_star], np.float32),
                   np.zeros((1, 3), np.float32),
                   h=np.asarray([0.08], np.float32))
    st = eng.state["stars"]
    eng.state["stars"] = {**st, "birth_time": st["birth_time"]
                          + 1e-12 * (np.asarray(st["mask"]) > 0)}
    eng.init_particles()
    return eng


def test_gear_feedback_conserves_energy():
    """Continuous deposition: sum_i m_i du_i == E_star exactly
    (feedback/GEAR kernel-weighted shares sum to one)."""
    from swift_subtask_dev_tpu.subgrid.feedback import GEARFeedback

    E = 7.5
    fb = GEARFeedback(e_per_mass=E, snii_delay=0.0)  # m_star = 1
    eng = _multi_with_star(fb)
    eng_ref = _multi_with_star(GEARFeedback(e_per_mass=0.0,
                                            snii_delay=0.0))
    diag = eng.step()
    eng_ref.step()
    g1, gr = eng.state["gas"], eng_ref.state["gas"]
    du = np.asarray(g1["u_full"]) - np.asarray(gr["u_full"])
    m = np.asarray(g1["m"])
    dE = float((m * du)[np.asarray(g1["mask"]) > 0].sum())
    np.testing.assert_allclose(dE, E, rtol=1e-4)
    assert int(diag["n_heated"]) > 4, "deposition spans the kernel"
    st = eng.state["stars"]
    sm = np.asarray(st["mask"]) > 0
    assert (np.asarray(st["fb_done"])[sm] == 1.0).all()


def test_kinetic_feedback_paired_kicks():
    """Exactly two gas particles get kicked, in opposite directions with
    equal-and-opposite momentum carrying the event energy
    (feedback/EAGLE_kinetic/feedback_iact.h:128-190)."""
    from swift_subtask_dev_tpu.subgrid.feedback import EagleKineticFeedback

    E = 0.5
    fb = EagleKineticFeedback(e_per_mass=E, snii_delay=0.0)
    eng_fb = _multi_with_star(fb)
    eng_ref = _multi_with_star(EagleKineticFeedback(e_per_mass=0.0,
                                                    snii_delay=0.0))
    eng_fb.step()
    eng_ref.step()
    g, gr = eng_fb.state["gas"], eng_ref.state["gas"]
    dv = np.asarray(g["v_full"]) - np.asarray(gr["v_full"])
    m = np.asarray(g["m"])
    kicked = (np.abs(dv).sum(-1) > 0) & (np.asarray(g["mask"]) > 0)
    assert int(kicked.sum()) == 2, "one pair event -> two particles"
    dp = (m[..., None] * dv)[kicked]
    # momentum conservation: the pair's momenta cancel exactly
    np.testing.assert_allclose(dp.sum(0), 0.0, atol=1e-6 * np.abs(
        dp).max())
    # energy: sum p^2/2m == E
    Ekick = float((0.5 * (dp ** 2).sum(-1) / m[kicked]).sum())
    np.testing.assert_allclose(Ekick, E, rtol=1e-4)
    st = eng_fb.state["stars"]
    sm = np.asarray(st["mask"]) > 0
    assert (np.asarray(st["fb_done"])[sm] == 1.0).all()


# --------------------------------------------------------------------------
# QLA cooling: metal-free tables
# --------------------------------------------------------------------------

def test_qla_cooling_ignores_metallicity():
    from swift_subtask_dev_tpu.subgrid.eagle_cooling import EagleCooling
    from swift_subtask_dev_tpu.utils.params import Params
    from swift_subtask_dev_tpu.utils.units import UnitSystem

    params = Params({"QLACooling": {"H_mass_fraction": 0.752}})
    units = UnitSystem()  # CGS base units
    model = EagleCooling.from_params(params, units, units.constants(),
                                     section="QLACooling",
                                     metal_free=True)
    rho = jnp.float32(1e-24)
    u = jnp.float32(1e12)
    r0 = float(model.du_dt_internal(rho, u, 0.0, jnp.float32(0.0)))
    r1 = float(model.du_dt_internal(rho, u, 0.0, jnp.float32(0.1)))
    assert r0 == r1, "QLA tables must not scale with Z"
    # while the EAGLE flavour does cool faster with metals
    eagle = EagleCooling.from_params(params, units, units.constants())
    e0 = float(eagle.du_dt_internal(rho, u, 0.0, jnp.float32(0.0)))
    e1 = float(eagle.du_dt_internal(rho, u, 0.0, jnp.float32(0.1)))
    assert e1 < e0, "metal-line cooling strengthens with Z"


# --------------------------------------------------------------------------
# EAGLE tracers
# --------------------------------------------------------------------------

def test_tracers_track_max_temperature():
    from swift_subtask_dev_tpu.subgrid.tracers import EagleTracers

    tr = EagleTracers(T_from_u=1.0)
    n = 4
    gas = {"u_full": jnp.asarray([1e5, 2e5, 5e4, 3e5], jnp.float32),
           "mask": jnp.ones((n,), jnp.float32),
           **tr.init_fields((n,))}
    cosmo = _no_cosmo()
    upd = tr.update(gas, cosmo)
    assert (np.asarray(upd["T_max"]) > 0).all()
    assert (np.asarray(upd["a_Tmax"]) == cosmo.a).all()
    # cooling down must NOT lower the record
    gas2 = {**gas, **upd, "u_full": gas["u_full"] * 0.1}
    upd2 = tr.update(gas2, cosmo)
    np.testing.assert_allclose(np.asarray(upd2["T_max"]),
                               np.asarray(upd["T_max"]))
    # AGN stamp
    agn = jnp.asarray([True, False, False, False])
    upd3 = tr.update(gas2, cosmo, agn_heated=agn)
    got = np.asarray(upd3["last_AGN_a"])
    assert got[0] == cosmo.a and (got[1:] == 0).all()


def test_tracers_in_multi_engine():
    from swift_subtask_dev_tpu.subgrid.tracers import EagleTracers

    ic = uniform_box_ic(n=8, jitter=0.05, seed=11)
    P = SPHENIXParams(h_max=0.3)
    grid = CellGrid(box=(1.0, 1.0, 1.0), cdim=(4, 4, 4), K=32)
    eng = MultiEngine(grid, P, EngineConfig(dt_max=1e-4), 0.0, 1.0,
                      tracers=EagleTracers(T_from_u=1.0))
    eng.load_gas(ic["pos"], ic["m"], ic["v"], ic["u"], ic["h"])
    eng.init_particles()
    eng.step()
    g = eng.state["gas"]
    mask = np.asarray(g["mask"]) > 0
    assert (np.asarray(g["T_max"])[mask] > 0).all()


# --------------------------------------------------------------------------
# Default (passive) black holes
# --------------------------------------------------------------------------

def test_default_bh_is_passive():
    from swift_subtask_dev_tpu.subgrid.black_holes import DefaultBlackHoles

    ic = uniform_box_ic(n=8, jitter=0.05, seed=5)
    P = SPHENIXParams(h_max=0.3)
    grid = CellGrid(box=(1.0, 1.0, 1.0), cdim=(4, 4, 4), K=32)
    eng = MultiEngine(grid, P, EngineConfig(dt_max=1e-4), 0.0, 1.0,
                      bh_model=DefaultBlackHoles())
    eng.load_gas(ic["pos"], ic["m"], ic["v"], ic["u"], ic["h"])
    eng.load_bh(np.asarray([[0.5, 0.5, 0.5]]),
                np.asarray([2.0], np.float32),
                np.zeros((1, 3), np.float32),
                h=np.asarray([0.08], np.float32))
    n_gas0 = int((np.asarray(eng.state["gas"]["mask"]) > 0).sum())
    eng.init_particles()
    u0 = np.asarray(eng.state["gas"]["u_full"]).copy()
    diag = eng.step()
    bh = eng.state["bh"]
    bm = np.asarray(bh["mask"]) > 0
    # no accretion, no swallowing, no AGN heating
    np.testing.assert_allclose(np.asarray(bh["m"])[bm], 2.0)
    assert int((np.asarray(eng.state["gas"]["mask"]) > 0).sum()) == n_gas0
    assert int(diag["n_agn"]) == 0 and int(diag["n_swallowed"]) == 0
    # but the density pass ran
    assert float(np.asarray(bh["rho_gas"])[bm][0]) > 0


# --------------------------------------------------------------------------
# GEAR chemistry
# --------------------------------------------------------------------------

def test_gear_chemistry_initial_metallicity():
    from swift_subtask_dev_tpu.subgrid.chemistry import GearChemistry

    chem = GearChemistry(initial_metallicity=0.02)
    Z, ef = chem.particle_arrays(5)
    np.testing.assert_allclose(Z, 0.02)
    # fractions are consistent: H + He + metals == 1, metals == Z
    np.testing.assert_allclose(ef.sum(axis=1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(ef[:, 2:].sum(axis=1), 0.02, rtol=1e-5)


def test_gear_chemistry_reads_ics_when_negative():
    from swift_subtask_dev_tpu.subgrid.chemistry import GearChemistry

    chem = GearChemistry(initial_metallicity=-1.0)
    ic = {"MetalMassFractions": np.asarray(
        [[0.001, 0.003], [0.002, 0.004]], np.float32)}
    Z, ef = chem.particle_arrays(2, ic)
    np.testing.assert_allclose(Z, [0.003, 0.004])
