"""SPIN_JET black holes: GR formula oracles, mode decision, spin
evolution, engine-level jet kicks.

References: src/black_holes/SPIN_JET/black_holes_spin.h (formulas),
black_holes.h:845-976 (spin update), :1185-1248 (jet launching).
"""

import numpy as np
import jax.numpy as jnp

from swift_subtask_dev_tpu.engine import CosmoFactors, EngineConfig
from swift_subtask_dev_tpu.engine_multi import MultiEngine
from swift_subtask_dev_tpu.grid import CellGrid
from swift_subtask_dev_tpu.models.sph.sphenix import SPHENIXParams
from swift_subtask_dev_tpu.ics import uniform_box_ic
from swift_subtask_dev_tpu.subgrid.spin_jet import (
    SpinJetBlackHoles, eps_nt, eps_sd, final_spin_merger, r_isco)


# --------------------------------------------------------------------------
# GR formula oracles (Bardeen 1972 / Novikov-Thorne known values)
# --------------------------------------------------------------------------

def test_r_isco_known_values():
    # Schwarzschild: r_isco = 6 r_G
    np.testing.assert_allclose(float(r_isco(jnp.float32(1e-6))), 6.0,
                               rtol=1e-3)
    # extreme prograde Kerr: r_isco -> 1
    assert float(r_isco(jnp.float32(0.998))) < 1.31
    # extreme retrograde: r_isco -> 9
    np.testing.assert_allclose(float(r_isco(jnp.float32(-0.998))), 9.0,
                               rtol=0.01)


def test_eps_nt_known_values():
    # Schwarzschild: 1 - sqrt(8/9) = 0.0572
    np.testing.assert_allclose(float(eps_nt(jnp.float32(1e-6))), 0.0572,
                               rtol=1e-2)
    # a = 0.998: ~0.32 (Thorne 1974 limit region)
    e = float(eps_nt(jnp.float32(0.998)))
    assert 0.28 < e < 0.37
    # monotonic in a
    a = jnp.linspace(-0.9, 0.9, 10)
    assert bool(jnp.all(jnp.diff(eps_nt(a)) > 0))


def test_eps_sd_suppressed_at_high_mdot():
    """Slim-disc efficiency drops with accretion rate (photon
    trapping, Madau et al. 2014)."""
    a = jnp.float32(0.5)
    e1 = float(eps_sd(a, jnp.float32(1.0)))
    e10 = float(eps_sd(a, jnp.float32(10.0)))
    assert e10 < e1


# --------------------------------------------------------------------------
# modes + efficiencies + spinup
# --------------------------------------------------------------------------

def _model(**kw):
    base = dict(G=1.0, c_light=10.0, eps_f=0.1, eps_f_jet=1.0,
                edd_pref=1.0, delta_u=1e20, n_heat=1.0,
                seed_spin=0.3, m_solar=1.0, alpha_acc=0.2,
                mdot_crit_ADAF=0.008, beta_acc=1.0 / 1.4,
                edd_crit_thick=0.0065, v_0_ADAF=0.5,
                omega_0_ADAF=0.3, xi_TD=19.0, v_jet=5.0, n_jet=2.0)
    base.update(kw)
    return SpinJetBlackHoles(**base)


def test_mode_decision():
    m = _model()
    a = jnp.full((4,), 0.3, jnp.float32)
    f_edd = jnp.asarray([1e-4, 0.05, 50.0, 0.5], jnp.float32)
    thick, thin, slim = m._modes(a, f_edd)
    assert bool(thick[0]) and not bool(thin[0]) and not bool(slim[0])
    assert bool(thin[1])
    assert bool(slim[2]), "far super-Eddington -> slim disc"
    # with slim discs disabled everything above the ADAF cut is thin
    m2 = _model(include_slim_disk=False)
    _, thin2, slim2 = m2._modes(a, f_edd)
    assert bool(thin2[2]) and not bool(slim2[2])


def test_jet_efficiency_grows_with_spin_and_thickness():
    m = _model()
    a = jnp.asarray([0.1, 0.5, 0.9], jnp.float32)
    thick_aspect = jnp.full((3,), 0.3, jnp.float32)
    eff = m.jet_efficiency(a, thick_aspect, jnp.zeros((3,), bool))
    assert bool(jnp.all(jnp.diff(eff) > 0)), "jet eff rises with spin"
    thin_aspect = jnp.full((3,), 1e-3, jnp.float32)
    eff_thin = m.jet_efficiency(a, thin_aspect, jnp.ones((3,), bool))
    assert bool(jnp.all(eff_thin < eff)), "thin discs make weak jets"


def test_spinup_equilibrium():
    """The GRMHD thick-disc fit spins down fast holes (jet extraction)
    and spins up slow ones — an equilibrium spin below a=1
    (Narayan et al. 2021 fits, da_dln_mbh_0:807)."""
    m = _model()
    thick = jnp.ones((1,), bool)
    thin = jnp.zeros((1,), bool)
    slim = jnp.zeros((1,), bool)
    lo = float(m.spinup_rate(jnp.float32([0.02]), jnp.float32([1e-4]),
                             jnp.float32([0.0]), jnp.float32([0.01]),
                             thick, thin, slim)[0])
    hi = float(m.spinup_rate(jnp.float32([0.9]), jnp.float32([1e-4]),
                             jnp.float32([0.5]), jnp.float32([0.01]),
                             thick, thin, slim)[0])
    assert lo > 0 and hi < 0
    # thin-disc accretion spins up towards a=1 (no jet spindown term)
    up = float(m.spinup_rate(jnp.float32([0.5]), jnp.float32([0.1]),
                             jnp.float32([0.0]), jnp.float32([0.08]),
                             ~thick, ~thin ^ thin, slim)[0])
    assert up > 0


def test_final_spin_merger():
    # equal-mass aligned a=0.7 merger -> remnant near ~0.9
    af = float(final_spin_merger(0.7, 0.7, 1.0, 1.0, 1.0, 1.0))
    assert 0.8 < af < 1.0
    # anti-aligned spins partially cancel
    af2 = float(final_spin_merger(0.7, 0.7, 1.0, -1.0, 1.0, -1.0))
    assert af2 < af
    # non-spinning equal-mass merger: orbital momentum gives ~0.686
    af3 = float(final_spin_merger(1e-3, 1e-3, 1.0, 0.0, 0.0, 0.0))
    np.testing.assert_allclose(af3, 0.686, atol=0.03)


# --------------------------------------------------------------------------
# the accrete() update on synthetic neighbour sums
# --------------------------------------------------------------------------

def _bh_state(n=1, spin=0.3, spin_dir=(1.0, 0.0, 0.0), m=1.0):
    z = jnp.zeros((n,), jnp.float32)
    d = jnp.tile(jnp.asarray(spin_dir, jnp.float32), (n, 1))
    return {"mask": jnp.ones((n,), jnp.float32),
            "m": jnp.full((n,), m, jnp.float32),
            "m_subgrid": jnp.full((n,), m, jnp.float32),
            "v_full": jnp.zeros((n, 3), jnp.float32),
            "h": jnp.full((n,), 0.1, jnp.float32),
            "spin": jnp.full((n,), spin, jnp.float32),
            "spin_dir": d, "jet_reservoir": z,
            "energy_reservoir": z, "acc_mode": z, "jet_eff": z,
            "rad_eff": z, "f_edd": z, "v_jet_last": z, "mdot": z,
            "rho_gas": z, "ngb_mass": z, "swallow_prob": z}


def _dens(n=1, rho=10.0, L=(0.0, 0.0, 1.0)):
    o = jnp.full((n,), rho, jnp.float32)
    return {"rho": o * 1e-3, "ngb_mass": o,
            "mom0": jnp.zeros((n,), jnp.float32),
            "mom1": jnp.zeros((n,), jnp.float32),
            "mom2": jnp.zeros((n,), jnp.float32),
            "cs_w": o * 1e-3 * 0.1, "wcount": o,
            "L0": jnp.full((n,), L[0], jnp.float32),
            "L1": jnp.full((n,), L[1], jnp.float32),
            "L2": jnp.full((n,), L[2], jnp.float32)}


def test_accrete_aligns_direction_and_fills_reservoirs():
    m = _model()
    bh = _bh_state(spin=0.3, spin_dir=(1.0, 0.0, 0.0))
    cosmo = CosmoFactors.no_cosmo()
    out = m.accrete(bh, _dens(L=(0.0, 0.0, 1.0)), cosmo,
                    jnp.float32(1e-3))
    assert float(out["mdot"][0]) > 0
    # direction tilts from x-hat towards the gas angular momentum z-hat
    assert float(out["spin_dir"][0, 2]) > 0
    assert float(out["spin_dir"][0, 0]) < 1.0
    np.testing.assert_allclose(
        float(jnp.sum(out["spin_dir"][0] ** 2)), 1.0, rtol=1e-5)
    # reservoirs fill; subgrid mass grows; spin stays in bounds
    assert float(out["jet_reservoir"][0]) > 0
    assert float(out["energy_reservoir"][0]) > 0
    assert float(out["m_subgrid"][0]) > float(bh["m_subgrid"][0])
    assert 0.01 <= abs(float(out["spin"][0])) <= 0.998
    # swallow probability emitted for the subgrid-mass deficit
    assert float(out["swallow_prob"][0]) > 0


def test_accrete_counter_alignment():
    """Gas momentum anti-parallel to a weakly-spinning hole with a
    heavy warp triggers retrograde accretion (King et al. 2005)."""
    m = _model()
    bh = _bh_state(spin=0.3, spin_dir=(0.0, 0.0, 1.0), m=1e-4)
    # tiny BH mass -> tiny j_BH -> warp momentum dominates
    out = m.accrete(bh, _dens(L=(0.0, 0.0, -1.0)), CosmoFactors.no_cosmo(),
                    jnp.float32(1e-6))
    assert float(out["spin"][0]) < 0, "retrograde branch taken"


# --------------------------------------------------------------------------
# engine-level: jets kick a pair along the spin axis
# --------------------------------------------------------------------------

def _jet_engine(model, charge):
    ic = uniform_box_ic(n=8, jitter=0.05, seed=9)
    P = SPHENIXParams(h_max=0.3)
    grid = CellGrid(box=(1.0, 1.0, 1.0), cdim=(4, 4, 4), K=32)
    eng = MultiEngine(grid, P, EngineConfig(dt_max=1e-5), 0.0, 1.0,
                      bh_model=model)
    eng.load_gas(ic["pos"], ic["m"], ic["v"], ic["u"], ic["h"])
    eng.load_bh(np.asarray([[0.5, 0.5, 0.5]]),
                np.asarray([2.0], np.float32),
                np.zeros((1, 3), np.float32),
                h=np.asarray([0.12], np.float32))
    # pre-charge the jet reservoir well past one event's worth
    bh = eng.state["bh"]
    bm = np.asarray(bh["mask"]) > 0
    resv = np.zeros(bm.shape, np.float32)
    resv[bm] = charge
    eng.state["bh"] = {**bh, "jet_reservoir": jnp.asarray(resv)}
    eng.init_particles()
    return eng


def test_jet_kicks_pair_along_spin_axis():
    m = _model(v_jet=5.0, include_jets=True)
    eng = _jet_engine(m, 1e4)
    eng_ref = _jet_engine(_model(include_jets=False), 1e4)
    bm = np.asarray(eng.state["bh"]["mask"]) > 0
    eng.step()
    eng_ref.step()
    g = eng.state["gas"]
    dv = np.asarray(g["v_full"]) \
        - np.asarray(eng_ref.state["gas"]["v_full"])
    kicked = (np.abs(dv).sum(-1) > 1e-8) & (np.asarray(g["mask"]) > 0)
    assert int(kicked.sum()) == 2, "one jet event kicks one pair"
    dvk = dv[kicked]
    # kicks are along +/- the spin axis (z-hat at seed) at ~v_jet
    cosz = dvk[:, 2] / np.linalg.norm(dvk, axis=1)
    assert np.allclose(np.abs(cosz), 1.0, atol=1e-5)
    assert cosz.prod() < 0, "bipolar: opposite hemispheres"
    np.testing.assert_allclose(np.linalg.norm(dvk, axis=1), 5.0,
                               rtol=1e-4)
    # reservoir paid for the event
    assert float(np.asarray(eng.state["bh"]["jet_reservoir"])[bm][0]) \
        < 1e4


def test_spin_jet_snapshot_fields():
    from swift_subtask_dev_tpu.io.snapshot import gas_state_to_fields
    grid = CellGrid(box=(1.0, 1.0, 1.0), cdim=(4, 4, 4), K=32)
    P = SPHENIXParams(h_max=0.3)
    m = _model()
    eng = MultiEngine(grid, P, EngineConfig(dt_max=1e-5), 0.0, 1.0,
                      bh_model=m)
    ic = uniform_box_ic(n=8, jitter=0.05, seed=9)
    eng.load_gas(ic["pos"], ic["m"], ic["v"], ic["u"], ic["h"])
    eng.load_bh(np.asarray([[0.5, 0.5, 0.5]]),
                np.asarray([2.0], np.float32),
                np.zeros((1, 3), np.float32))
    f = gas_state_to_fields(grid, eng.state["bh"])
    for name in ("Spins", "AngularMomentumDirections",
                 "JetEfficiencies", "AccretionModes", "JetReservoir"):
        assert name in f
    np.testing.assert_allclose(f["Spins"], 0.3)
