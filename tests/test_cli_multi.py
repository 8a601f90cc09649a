"""CLI-level gas+DM cosmological run (the SmallCosmoVolume configuration).

The reference's headline capability — engine policies
hydro | self_gravity | cosmology (engine.c:2245), launched as
`swift --hydro --self-gravity --cosmology params.yml`
(examples/SmallCosmoVolume/SmallCosmoVolume_hydro/run.sh) — end-to-end
through the MultiEngine: ICs with PartType0+1 in, snapshots with both
species + statistics out.
"""

import subprocess
import sys

import numpy as np

from swift_subtask_dev_tpu.io.snapshot import (
    write_snapshot, read_snapshot, PTYPE_GAS, PTYPE_DM)
from swift_subtask_dev_tpu.ics import uniform_box_ic

PARAMS = """
InternalUnitSystem:
  UnitMass_in_cgs: 1.98841e43
  UnitLength_in_cgs: 3.08567758e24
  UnitVelocity_in_cgs: 1e5

Cosmology:
  Omega_cdm: 0.26
  Omega_b: 0.049
  Omega_lambda: 0.691
  h: 0.67
  a_begin: 0.5
  a_end: 1.0

TimeIntegration:
  time_begin: 0.0
  time_end:   1.0
  dt_max:     0.01

InitialConditions:
  file_name: {ic}

SPH:
  resolution_eta: 1.2348
  CFL_condition:  0.1

Gravity:
  mesh_side_length: 32
  eta: 0.025
  comoving_baryon_softening: 0.1

LambdaCooling:
  lambda_nH2_cgs: 1e-30

Snapshots:
  basename: {out}
  delta_time: 1.02
  scale_factor_first: 0.5

Statistics:
  delta_time: 1.01
  basename: {stats}
"""


def test_cli_gas_dm_cosmological(tmp_path):
    L = 10.0  # Mpc
    ic = uniform_box_ic(n=8, jitter=0.05)
    n = len(ic["pos"])
    rng = np.random.default_rng(1)
    pos_dm = rng.uniform(0, 1, (n, 3)) * L
    # rho_crit0 = 3 H0^2 / (8 pi G); H0 = 67 km/s/Mpc, G = 43.02 internal
    rho_crit0 = 3.0 * 67.0 ** 2 / (8.0 * np.pi * 43.022)
    m_tot = rho_crit0 * L ** 3
    ic_path = str(tmp_path / "ic.hdf5")
    write_snapshot(ic_path, (L, L, L), 0.0, {
        PTYPE_GAS: {
            "Coordinates": ic["pos"] * L, "Velocities": ic["v"],
            "Masses": np.full(n, 0.049 * m_tot / n, np.float32),
            "InternalEnergies": np.full(n, 100.0, np.float32),
            "SmoothingLengths": ic["h"] * L,
            "ParticleIDs": np.arange(n, dtype=np.uint64)},
        PTYPE_DM: {
            "Coordinates": pos_dm,
            "Velocities": np.zeros((n, 3), np.float32),
            "Masses": np.full(n, 0.26 * m_tot / n, np.float32),
            "ParticleIDs": np.arange(n, 2 * n, dtype=np.uint64)},
    })
    param_path = tmp_path / "run.yml"
    param_path.write_text(PARAMS.format(
        ic=ic_path, out=str(tmp_path / "snap"),
        stats=str(tmp_path / "statistics")))

    r = subprocess.run(
        [sys.executable, "-m", "swift_subtask_dev_tpu.cli",
         str(param_path), "--hydro", "--self-gravity", "--cosmology",
         "--cooling", "--cpu", "-v", "-n", "6"],
        capture_output=True, text=True, timeout=1500, cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-3000:]

    snaps = sorted(tmp_path.glob("snap_*.hdf5"))
    assert snaps, "no snapshot written"
    hdr, parts, _ = read_snapshot(str(snaps[-1]))
    assert PTYPE_GAS in parts and PTYPE_DM in parts
    assert len(parts[PTYPE_GAS]["Coordinates"]) == n
    assert len(parts[PTYPE_DM]["Coordinates"]) == n
    rho = parts[PTYPE_GAS]["Densities"]
    assert np.isfinite(rho).all() and (rho > 0).all()
    assert np.isfinite(parts[PTYPE_DM]["Velocities"]).all()
    # snapshot header time is the scale factor
    assert 0.5 <= float(np.asarray(hdr["Time"])) <= 1.0
    # statistics rows were written on the a-cadence
    rows = (tmp_path / "statistics.txt").read_text().splitlines()
    assert len(rows) >= 2, rows
    vals = np.array([float(x) for x in rows[1].split()])
    assert np.isfinite(vals).all()
