"""Planetary scheme + multi-material EOS (reference src/hydro/Planetary,
src/equation_of_state/planetary): Tillotson regions and material-id
dispatch, a mixed-material engine run, and the CLI surface with
MaterialIDs ICs."""

import numpy as np
import jax.numpy as jnp

from swift_subtask_dev_tpu.engine import Engine, EngineConfig
from swift_subtask_dev_tpu.grid import CellGrid
from swift_subtask_dev_tpu.ics import uniform_box_ic
from swift_subtask_dev_tpu.models.sph.planetary import PlanetaryParams
from swift_subtask_dev_tpu.models.sph.planetary_eos import (
    ID_IDG_DEF, ID_TIL_IRON, ID_TIL_WATER, PlanetaryEOS, _TIL_SI)


def _til_scalar_P(rho, u, mat):
    """Independent scalar Tillotson evaluation (tillotson.h:182) used as
    the oracle for the vectorized/branchless version."""
    (rho_0, a, b, A, B, u_0, u_iv, u_cv, alpha, beta,
     eta_min, eta_zero, P_min) = _TIL_SI[mat]
    eta = rho / rho_0
    mu = eta - 1.0
    nu = 1.0 / eta - 1.0
    w = u / (u_0 * eta * eta) + 1.0
    P_c = (a + b / w) * rho * u + A * mu + B * mu * mu
    if eta < eta_zero:
        P_c = 0.0
    elif eta < eta_min:
        P_c *= (eta - eta_zero) / (eta_min - eta_zero)
    P_e = a * rho * u + (b * rho * u / w
                         + A * mu * np.exp(-beta * nu)) \
        * np.exp(-alpha * nu * nu)
    if (eta > 1.0) or (u < u_iv):
        P = P_c
    elif (eta < 1.0) and (u > u_cv):
        P = P_e
    else:
        P = ((u - u_iv) * P_e + (u_cv - u) * P_c) / (u_cv - u_iv)
    return max(P, P_min)


def test_tillotson_regions_match_scalar_oracle():
    eos = PlanetaryEOS(materials=(ID_TIL_IRON, ID_TIL_WATER))
    # cold/condensed, expanded/hot, hybrid states for iron; water taper
    states = [
        (ID_TIL_IRON, 7800.0, 1.0e6),    # cold (u < u_iv)
        (ID_TIL_IRON, 9000.0, 5.0e6),    # condensed (eta > 1)
        (ID_TIL_IRON, 5000.0, 2.0e7),    # expanded & hot (u > u_cv)
        (ID_TIL_IRON, 6000.0, 5.0e6),    # hybrid (u_iv < u < u_cv, eta<1)
        (ID_TIL_WATER, 998.0, 1.0e5),    # water at reference density
        (ID_TIL_WATER, 890.0, 1.0e5),    # inside the eta taper band
        (ID_TIL_WATER, 850.0, 1.0e5),    # below eta_zero -> P_c = 0 branch
    ]
    mid = jnp.asarray([s[0] for s in states], jnp.int32)
    rho = jnp.asarray([s[1] for s in states], jnp.float32)
    u = jnp.asarray([s[2] for s in states], jnp.float32)
    got = np.asarray(eos.pressure_from_internal_energy(rho, u, mid))
    want = np.array([_til_scalar_P(r, uu, m) for m, r, uu in states])
    np.testing.assert_allclose(got, want, rtol=2e-5)

    # soundspeed floor: cs >= sqrt(A/rho_0) everywhere
    cs = np.asarray(eos.soundspeed_from_internal_energy(rho, u, mid))
    for i, (m, _, _) in enumerate(states):
        A, rho_0 = _TIL_SI[m][3], _TIL_SI[m][0]
        assert cs[i] >= np.sqrt(A / rho_0) * 0.999
    assert np.all(np.isfinite(cs))


def test_material_dispatch_mixes_families():
    eos = PlanetaryEOS(materials=(ID_IDG_DEF, ID_TIL_IRON), gamma=1.4)
    rho = jnp.asarray([1.2, 7800.0], jnp.float32)
    u = jnp.asarray([2.0e5, 1.0e6], jnp.float32)
    mid = jnp.asarray([ID_IDG_DEF, ID_TIL_IRON], jnp.int32)
    P = np.asarray(eos.pressure_from_internal_energy(rho, u, mid))
    np.testing.assert_allclose(P[0], 0.4 * 1.2 * 2.0e5, rtol=1e-6)
    np.testing.assert_allclose(P[1], _til_scalar_P(7800.0, 1.0e6,
                                                   ID_TIL_IRON), rtol=2e-5)

    # unit conversion mirrors convert_units_Til: evaluating in a scaled
    # unit system returns the same physical pressure
    rho_to_si, u_to_si = 1e3, 1e4
    eos2 = PlanetaryEOS(materials=(ID_TIL_IRON,), rho_to_si=rho_to_si,
                        u_to_si=u_to_si,
                        P_from_si=1.0 / (rho_to_si * u_to_si))
    P2 = np.asarray(eos2.pressure_from_internal_energy(
        jnp.asarray([7800.0 / rho_to_si], jnp.float32),
        jnp.asarray([1.0e6 / u_to_si], jnp.float32),
        jnp.asarray([ID_TIL_IRON], jnp.int32)))
    np.testing.assert_allclose(P2[0] * rho_to_si * u_to_si,
                               _til_scalar_P(7800.0, 1.0e6, ID_TIL_IRON),
                               rtol=2e-4)

    # table-backed families are not shipped -> explicit error
    try:
        PlanetaryEOS(materials=(200,))
        assert False, "HM80 must raise"
    except ValueError:
        pass


def test_planetary_engine_mixed_materials_conserves():
    """Half ideal-gas, half Tillotson water at matched pressure: the
    engine must step a mixed-material box, conserve energy, and carry
    mat_id through rebuckets."""
    ic = uniform_box_ic(n=6, jitter=0.05, seed=11)
    n = len(ic["pos"])
    eos = PlanetaryEOS(materials=(ID_IDG_DEF, ID_TIL_WATER))
    p = PlanetaryParams(h_max=0.4, eos=eos)
    # scale to water-like density (box stays 1 m^3; SI units).  The
    # Tillotson bulk modulus A turns percent-level SPH density noise into
    # large pressures, so the kick dt must be small for a tight energy
    # budget.
    m = np.asarray(ic["m"]) * 998.0
    u = np.full(n, 1.0e3, np.float32)  # cold branch for water
    mat = np.where(np.arange(n) % 2 == 0, ID_IDG_DEF,
                   ID_TIL_WATER).astype(np.int32)

    grid = CellGrid(box=(1.0, 1.0, 1.0), cdim=(3, 3, 3), K=48)
    eng = Engine(grid, p, EngineConfig(dt_max=1e-7), 0.0, 1.0)
    eng.load_particles(ic["pos"], m, ic["v"], u, ic["h"],
                       extra_fields={"mat_id": mat})
    eng.init_particles()
    s = eng.state
    mask = np.asarray(s["mask"]) > 0
    assert sorted(np.asarray(s["mat_id"])[mask].tolist()) \
        == sorted(mat.tolist())
    # both EOS families produced sane thermodynamics
    P0 = np.asarray(s["pressure"])[mask]
    assert np.all(np.isfinite(P0)) and np.all(P0 >= 0)

    def total_energy():
        st = eng.state
        mm = np.asarray(st["m"])[mask]
        v = np.asarray(st["v_full"])[mask]
        uu = np.asarray(st["u_full"])[mask]
        return float((0.5 * mm * (v ** 2).sum(-1) + mm * uu).sum())

    e0 = total_energy()
    for _ in range(4):
        eng.step()
    e1 = total_energy()
    assert abs(e1 - e0) / abs(e0) < 2e-4, (e0, e1)
    st = eng.state
    m2 = np.asarray(st["mask"]) > 0
    assert sorted(np.asarray(st["mat_id"])[m2].tolist()) \
        == sorted(mat.tolist())
    assert np.all(np.isfinite(np.asarray(st["u_full"])[m2]))


def test_planetary_cli_end_to_end(tmp_path):
    import subprocess
    import sys

    from swift_subtask_dev_tpu.io.snapshot import (PTYPE_GAS,
                                                   write_snapshot)

    ic = uniform_box_ic(n=8, jitter=0.1, seed=2)
    n = len(ic["pos"])
    mat = np.where(np.arange(n) % 2 == 0, ID_IDG_DEF,
                   ID_TIL_WATER).astype(np.int32)
    parts = {PTYPE_GAS: {
        "Coordinates": ic["pos"], "Velocities": ic["v"],
        "Masses": np.asarray(ic["m"]) * 998.0,
        "InternalEnergies": np.full(n, 1.0e3, np.float32),
        "SmoothingLengths": ic["h"],
        "ParticleIDs": np.arange(n), "MaterialIDs": mat}}
    icf = tmp_path / "ic.hdf5"
    write_snapshot(str(icf), ic["box"], 0.0, parts)
    param = tmp_path / "p.yml"
    param.write_text(f"""
InternalUnitSystem:
  UnitMass_in_cgs: 1e3
  UnitLength_in_cgs: 1e2
  UnitVelocity_in_cgs: 1e2
TimeIntegration:
  time_begin: 0.0
  time_end: 4e-6
  dt_max: 2e-6
InitialConditions:
  file_name: {icf}
SPH:
  resolution_eta: 1.2348
  CFL_condition: 0.1
  scheme: planetary
EoS:
  planetary_use_idg_def: 1
  planetary_use_Til_water: 1
Snapshots:
  basename: {tmp_path / 'snap'}
Statistics:
  delta_time: 1e-5
  basename: {tmp_path / 'stats'}
""")
    r = subprocess.run(
        [sys.executable, "-m", "swift_subtask_dev_tpu.cli", str(param),
         "--hydro", "--cpu", "-n", "2", "--backend", "xla"],
        capture_output=True, text=True, timeout=1200)
    assert r.returncode == 0, r.stderr + r.stdout
    assert (tmp_path / "snap_0000.hdf5").exists()
