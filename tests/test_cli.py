"""End-to-end CLI test: IC file -> run -> snapshot (swift.c main analog)."""

import subprocess
import sys

import numpy as np

from swift_subtask_dev_tpu.io.snapshot import (
    write_snapshot, read_snapshot, PTYPE_GAS)
from swift_subtask_dev_tpu.ics import uniform_box_ic


PARAMS = """
InternalUnitSystem:
  UnitMass_in_cgs: 1.0
  UnitLength_in_cgs: 1.0
  UnitVelocity_in_cgs: 1.0

TimeIntegration:
  time_begin: 0.0
  time_end:   0.002
  dt_max:     1e-3

InitialConditions:
  file_name: {ic}

SPH:
  resolution_eta: 1.2348
  CFL_condition:  0.1

Snapshots:
  basename: {out}

Statistics:
  delta_time: 1e-3
  basename: {stats}
"""


def test_cli_end_to_end(tmp_path):
    ic = uniform_box_ic(n=8, jitter=0.05)
    n = len(ic["pos"])
    ic_path = str(tmp_path / "ic.hdf5")
    write_snapshot(ic_path, ic["box"], 0.0, {PTYPE_GAS: {
        "Coordinates": ic["pos"],
        "Velocities": ic["v"],
        "Masses": ic["m"],
        "InternalEnergies": ic["u"],
        "SmoothingLengths": ic["h"],
        "ParticleIDs": np.arange(n, dtype=np.uint64),
    }})
    param_path = tmp_path / "run.yml"
    param_path.write_text(PARAMS.format(
        ic=ic_path, out=str(tmp_path / "snap"),
        stats=str(tmp_path / "statistics")))

    r = subprocess.run(
        [sys.executable, "-m", "swift_subtask_dev_tpu.cli",
         str(param_path), "--hydro", "--cpu", "--backend", "xla", "-v",
         "-n", "3"],
        capture_output=True, text=True, timeout=900, cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-3000:]

    snaps = sorted(tmp_path.glob("snap_*.hdf5"))
    assert snaps, "no snapshot written"
    hdr, parts, _ = read_snapshot(str(snaps[-1]))
    assert hdr["NumPart_Total"][0] == n
    rho = parts[PTYPE_GAS]["Densities"]
    assert np.isfinite(rho).all() and (rho > 0).all()
    # density of a near-uniform unit box with M=1 is ~1
    assert abs(np.median(rho) - 1.0) < 0.1
    assert (tmp_path / "used_parameters.yml").exists()
