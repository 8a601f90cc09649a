"""Output lists + per-field snapshot selection (output_list.c,
output_options.c analogs) through the CLI surface."""

import subprocess
import sys

import h5py
import numpy as np

from swift_subtask_dev_tpu.io.output_options import (
    OutputList, apply_selection, read_output_list, read_select_output)
from swift_subtask_dev_tpu.io.snapshot import write_snapshot, PTYPE_GAS
from swift_subtask_dev_tpu.ics import uniform_box_ic

PARAMS = """
InternalUnitSystem:
  UnitMass_in_cgs: 1.0
  UnitLength_in_cgs: 1.0
  UnitVelocity_in_cgs: 1.0
TimeIntegration:
  time_begin: 0.0
  time_end:   0.004
  dt_max:     1e-3
InitialConditions:
  file_name: {ic}
SPH:
  resolution_eta: 1.2348
  CFL_condition:  0.1
Snapshots:
  basename: {out}
  delta_time: 1.0
  output_list_on: 1
  output_list: {olist}
  select_output_on: 1
  select_output: {sel}
Statistics:
  delta_time: 1.0
  basename: {stats}
"""


def test_output_list_parsing(tmp_path):
    p = tmp_path / "list.txt"
    p.write_text("# Redshift\n3.0\n1.0\n0.0\n")
    kind, times = read_output_list(str(p))
    assert kind == "scale_factor"
    assert np.allclose(times, [0.25, 0.5, 1.0])
    ol = OutputList([0.1, 0.2, 0.3])
    ol.advance_past(0.15)
    assert ol.next_time() == 0.2


def test_select_output_filtering(tmp_path):
    p = tmp_path / "sel.yml"
    p.write_text("Default:\n  Densities_PartType0: off\n"
                 "  Masses_PartType0: off\n"        # compulsory: ignored
                 "  InternalEnergies_PartType0: on\n")
    sel = read_select_output(str(p))
    parts = {0: {"Coordinates": np.zeros((4, 3)), "Masses": np.ones(4),
                 "ParticleIDs": np.arange(4), "Densities": np.ones(4),
                 "InternalEnergies": np.ones(4)}}
    out = apply_selection(parts, sel)
    assert "Densities" not in out[0]
    assert "Masses" in out[0]            # compulsory survives 'off'
    assert "InternalEnergies" in out[0]


def test_cli_output_list_and_selection(tmp_path):
    ic = uniform_box_ic(n=8, jitter=0.05, seed=2)
    n = len(ic["m"])
    icf = tmp_path / "ic.hdf5"
    write_snapshot(str(icf), ic["box"], 0.0,
                   {PTYPE_GAS: {"Coordinates": ic["pos"],
                                "Velocities": ic["v"],
                                "Masses": ic["m"],
                                "InternalEnergies": ic["u"],
                                "SmoothingLengths": ic["h"],
                                "Densities": np.ones(n),
                                "ParticleIDs": np.arange(n)}})
    (tmp_path / "list.txt").write_text("# Time\n0.0015\n")
    (tmp_path / "sel.yml").write_text(
        "Default:\n  Densities_PartType0: off\n")
    pf = tmp_path / "p.yml"
    pf.write_text(PARAMS.format(ic=icf, out=tmp_path / "snap",
                                olist=tmp_path / "list.txt",
                                sel=tmp_path / "sel.yml",
                                stats=tmp_path / "stats"))
    r = subprocess.run(
        [sys.executable, "-m", "swift_subtask_dev_tpu.cli", str(pf),
         "--hydro", "--cpu", "--backend", "xla"],
        capture_output=True, text=True, timeout=500)
    assert r.returncode == 0, r.stderr[-2000:]
    # snapshot 0 was triggered by the listed time 0.0015
    with h5py.File(tmp_path / "snap_0000.hdf5") as f:
        assert abs(f["Header"].attrs["Time"] - 0.002) < 1.1e-3
        assert "Densities" not in f["PartType0"]
        assert "Masses" in f["PartType0"]
