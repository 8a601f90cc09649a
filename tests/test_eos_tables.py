"""HM80/SESAME table readers: write tiny tables in the reference's
shipped file formats (hm80.h:75-134, sesame.h:330-439), load them, and
match interpolation at sample points against direct evaluation."""

import numpy as np
import pytest

from swift_subtask_dev_tpu.models.sph import eos_tables as et
from swift_subtask_dev_tpu.models.sph import planetary_eos as pe


def _write_hm80(path, lr0=-2.0, lr1=3.0, nr=8, lu0=8.0, lu1=14.0, nu=10,
                fn=None):
    """Emit the HM80 text format: 5 header lines, date, axis line,
    nr*nu pressures (Pa), nr*nu temperatures (ignored)."""
    if fn is None:
        # a smooth positive P(rho, u) so bilinear-in-log is testable
        def fn(log_rho, log_u):
            return np.exp(1.0 + 0.7 * log_rho + 0.3 * log_u)
    lrho = np.linspace(lr0, lr1, nr)
    lu = np.linspace(lu0, lu1, nu)
    P = fn(lrho[:, None], lu[None, :])
    with open(path, "w") as f:
        for i in range(5):
            f.write(f"# header line {i}\n")
        f.write("20201003\n")
        f.write(f"{lr0} {lr1} {nr} {lu0} {lu1} {nu}\n")
        for row in P:
            f.write(" ".join(f"{v:.8e}" for v in row) + "\n")
        for row in P:   # temperature block, same shape, ignored
            f.write(" ".join("300.0" for _ in row) + "\n")
    return lrho, lu, P


def _write_sesame(path, nr=6, nT=5):
    """Emit the SESAME text format: 12 header lines, date, num_rho num_T
    (INCLUDING the dropped rho=0/T=0 entries), density axis, temperature
    axis, then T-major rows of 'u P c s'."""
    rho = np.concatenate([[0.0], np.geomspace(1.0, 1e4, nr)])
    T = np.concatenate([[0.0], np.geomspace(100.0, 1e5, nT)])
    # u rows monotonically increasing in T, varying with rho
    u = 1e4 * (T[None, 1:] / 100.0) ** 1.2 * (1 + 0.1 * np.log10(
        np.maximum(rho[1:, None], 1e-10)))
    P = 1e5 * (rho[1:, None] / 10.0) * (T[None, 1:] / 100.0) ** 0.8
    c = np.sqrt(np.maximum(P, 1e3) / np.maximum(rho[1:, None], 1e-3))
    s = 1e3 + 0.0 * P
    with open(path, "w") as f:
        for i in range(12):
            f.write(f"# header {i}\n")
        f.write("20220714\n")
        f.write(f"{nr + 1} {nT + 1}\n")
        f.write(" ".join(f"{v:.8e}" for v in rho) + "\n")
        f.write(" ".join(f"{v:.8e}" for v in T) + "\n")
        # T-major with rho fastest, INCLUDING T=0 row and rho=0 column
        for iT in range(nT + 1):
            for ir in range(nr + 1):
                if iT == 0 or ir == 0:
                    f.write("0 0 0 0\n")
                else:
                    f.write(f"{u[ir-1, iT-1]:.8e} {P[ir-1, iT-1]:.8e} "
                            f"{c[ir-1, iT-1]:.8e} {s[ir-1, iT-1]:.8e}\n")
    return rho[1:], u, P, c


def test_hm80_roundtrip(tmp_path):
    path = str(tmp_path / "HM80_test.txt")
    lrho, lu, P = _write_hm80(path)
    tab = et.load_hm80(path, bulk_mod=0.0, P_min_for_c_min=1e3)
    assert tab.num_rho == len(lrho) and tab.num_u == len(lu)
    # interior points: bilinear in (log rho, log u) on log P is EXACT for
    # the log-linear test function
    rho_s = np.exp([-1.3, 0.4, 2.1])
    u_s = np.exp([9.2, 11.0, 13.1])
    got = np.asarray(et.hm80_pressure(np.float32(rho_s),
                                      np.float32(u_s), tab))
    want = np.exp(1.0 + 0.7 * np.log(rho_s) + 0.3 * np.log(u_s))
    np.testing.assert_allclose(got, want, rtol=2e-4)
    # u <= 0 -> P = 0 (hm80.h:231)
    assert float(et.hm80_pressure(np.float32(1.0), np.float32(0.0),
                                  tab)) == 0.0
    # grid knots reproduce the table exactly
    got_k = float(et.hm80_pressure(np.float32(np.exp(lrho[3])),
                                   np.float32(np.exp(lu[4])), tab))
    np.testing.assert_allclose(got_k, P[3, 4], rtol=2e-4)


def test_hm80_soundspeed_branches(tmp_path):
    path = str(tmp_path / "HM80_test.txt")
    _write_hm80(path)
    # condensed branch: c = sqrt(K/rho) (hm80.h:287)
    ice = et.load_hm80(path, bulk_mod=2.0e9)
    np.testing.assert_allclose(
        float(et.hm80_soundspeed(np.float32(1e3), np.float32(1e10), ice)),
        np.sqrt(2.0e9 / 1e3), rtol=1e-5)
    # ideal-gas branch with pressure floor (HHe, hm80.h:291-297)
    hhe = et.load_hm80(path, bulk_mod=0.0, P_min_for_c_min=1e3)
    rho, u = 0.5, np.exp(10.0)
    P = float(et.hm80_pressure(np.float32(rho), np.float32(u), hhe))
    np.testing.assert_allclose(
        float(et.hm80_soundspeed(np.float32(rho), np.float32(u), hhe)),
        np.sqrt(5 / 3 * max(P, 1e3) / rho), rtol=1e-5)


def test_hm80_unit_conversion(tmp_path):
    path = str(tmp_path / "HM80_test.txt")
    _write_hm80(path)
    si = et.load_hm80(path)
    # internal units: 1000 kg = 1 mass unit, 1 m = 1 length unit
    rho_to_si, u_to_si = 1000.0, 1.0
    internal = si.in_internal(rho_to_si, u_to_si,
                              1.0 / (rho_to_si * u_to_si))
    rho_si, u_si = 5.0, np.exp(11.0)
    P_si = float(et.hm80_pressure(np.float32(rho_si), np.float32(u_si), si))
    P_int = float(et.hm80_pressure(np.float32(rho_si / rho_to_si),
                                   np.float32(u_si / u_to_si), internal))
    np.testing.assert_allclose(P_int, P_si / (rho_to_si * u_to_si),
                               rtol=2e-4)


def test_sesame_roundtrip(tmp_path):
    path = str(tmp_path / "SESAME_test.txt")
    rho_ax, u_tab, P_tab, c_tab = _write_sesame(path)
    tab = et.load_sesame(path)
    lr = np.asarray(tab.log_rho)
    assert lr.shape == (len(rho_ax),)
    np.testing.assert_allclose(np.exp(lr), rho_ax, rtol=1e-6)
    # table knots reproduce P and c exactly
    for ir, iT in ((1, 1), (3, 2), (4, 3)):
        got = float(et.sesame_pressure(
            np.float32(rho_ax[ir]), np.float32(u_tab[ir, iT]), tab))
        np.testing.assert_allclose(got, P_tab[ir, iT], rtol=2e-4)
        gc = float(et.sesame_soundspeed(
            np.float32(rho_ax[ir]), np.float32(u_tab[ir, iT]), tab))
        np.testing.assert_allclose(gc, c_tab[ir, iT], rtol=2e-4)
    # interior point: between knots the value must land between the
    # bracketing table values (monotone test table)
    ir, iT = 2, 2
    rho_m = np.sqrt(rho_ax[ir] * rho_ax[ir + 1])
    u_m = np.sqrt(u_tab[ir, iT] * u_tab[ir, iT + 1])
    got = float(et.sesame_pressure(np.float32(rho_m), np.float32(u_m), tab))
    lo = P_tab[ir:ir + 2, iT:iT + 2].min()
    hi = P_tab[ir:ir + 2, iT:iT + 2].max()
    assert lo <= got <= hi
    # u <= 0 -> P = 0 (sesame.h:485)
    assert float(et.sesame_pressure(np.float32(10.0), np.float32(0.0),
                                    tab)) == 0.0


def test_planetary_eos_table_dispatch(tmp_path):
    """PlanetaryEOS dispatches table materials next to Tillotson/ideal."""
    hp = str(tmp_path / "HM80_test.txt")
    _write_hm80(hp)
    sp = str(tmp_path / "SESAME_test.txt")
    rho_ax, u_tab, P_tab, _ = _write_sesame(sp)
    hm = et.load_hm80(hp, **et.HM80_DEFAULTS[200])
    se = et.load_sesame(sp)
    eos = pe.PlanetaryEOS(materials=(pe.ID_IDG_DEF, 200, 300),
                          hm80_tables=((200, hm),),
                          sesame_tables=((300, se),))
    rho = np.float32([1.0, 1.0, rho_ax[2]])
    u = np.float32([np.exp(10.0)] * 2 + [u_tab[2, 2]])
    mid = np.int32([0, 200, 300])
    P = np.asarray(eos.pressure_from_internal_energy(rho, u, mid))
    np.testing.assert_allclose(
        P[0], (5 / 3 - 1) * rho[0] * u[0], rtol=1e-5)
    np.testing.assert_allclose(
        P[1], float(et.hm80_pressure(rho[1], u[1], hm)), rtol=1e-5)
    np.testing.assert_allclose(P[2], P_tab[2, 2], rtol=2e-4)
    cs = np.asarray(eos.soundspeed_from_internal_energy(rho, u, mid))
    assert np.all(cs > 0)


def test_table_material_without_table_raises():
    with pytest.raises(ValueError):
        pe.PlanetaryEOS(materials=(200,))
    with pytest.raises(ValueError):
        pe.PlanetaryEOS(materials=(301,))


def test_hm80_cli_end_to_end(tmp_path):
    """Drive the full CLI with a real-format HM80 table material
    (EoS:planetary_use_HM80_HHe + table_file), mirroring the reference's
    eos_init flow."""
    import subprocess
    import sys

    from swift_subtask_dev_tpu.ics import uniform_box_ic
    from swift_subtask_dev_tpu.io.snapshot import PTYPE_GAS, write_snapshot

    table = tmp_path / "HM80_HHe.txt"
    _write_hm80(str(table))
    ic = uniform_box_ic(n=8, jitter=0.1, seed=2)
    n = len(ic["pos"])
    mat = np.where(np.arange(n) % 2 == 0, pe.ID_IDG_DEF, 200) \
        .astype(np.int32)
    parts = {PTYPE_GAS: {
        "Coordinates": ic["pos"], "Velocities": ic["v"],
        "Masses": np.asarray(ic["m"]),
        "InternalEnergies": np.full(n, np.exp(10.0), np.float32),
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
  planetary_use_HM80_HHe: 1
  planetary_HM80_HHe_table_file: {table}
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
