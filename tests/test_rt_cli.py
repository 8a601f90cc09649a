"""CLI --radiation: GEAR M1 RT subcycled inside the engine step.

The reference's StromgrenSphere examples run `swift --hydro --radiation`
with one star particle as the photon source (examples/RadiativeTransferTests;
engine policy engine_policy_rt, swift.c --radiation).  Here: a uniform gas
box with a central star, a few steps, then assert the gas nearest the star
ionized and the snapshot carries the RT fields (rt_io.h).
"""

import subprocess
import sys

import numpy as np

from swift_subtask_dev_tpu.io.snapshot import (PTYPE_GAS, PTYPE_STARS,
                                               read_snapshot,
                                               write_snapshot)


def _uniform_gas(n, box=1.0):
    g = (np.arange(n) + 0.5) / n * box
    pos = np.stack(np.meshgrid(g, g, g, indexing="ij"), -1).reshape(-1, 3)
    N = len(pos)
    return {
        "Coordinates": pos,
        "Velocities": np.zeros((N, 3), np.float32),
        "Masses": np.full(N, (box ** 3) / N, np.float32),
        "InternalEnergies": np.full(N, 1e-4, np.float32),
        "SmoothingLengths": np.full(N, 1.3 * box / n, np.float32),
        "ParticleIDs": np.arange(N, dtype=np.uint64),
    }


def test_cli_radiation_stromgren(tmp_path):
    ic = str(tmp_path / "ic.hdf5")
    gas = _uniform_gas(10)
    star = {
        "Coordinates": np.array([[0.5, 0.5, 0.5]]),
        "Velocities": np.zeros((1, 3), np.float32),
        "Masses": np.array([1.0], np.float32),
        "ParticleIDs": np.array([999999], np.uint64),
    }
    write_snapshot(ic, (1.0, 1.0, 1.0), 0.0,
                   {PTYPE_GAS: gas, PTYPE_STARS: star})
    (tmp_path / "rt.yml").write_text(f"""
InternalUnitSystem:
  UnitMass_in_cgs: 1.0
  UnitLength_in_cgs: 1.0
  UnitVelocity_in_cgs: 1.0
TimeIntegration:
  time_begin: 0.0
  time_end:   0.02
  dt_max:     2.5e-3
  max_nr_rt_subcycles: 4
InitialConditions:
  file_name: {ic}
SPH:
  resolution_eta: 1.2348
  CFL_condition: 0.2
GEARRT:
  photon_groups: 1
  reduced_speed_of_light: 5.0
  CFL_condition: 0.9
  group_cross_sections: [50.0]
  group_photon_energies: [1.0]
  star_luminosities: [20.0]
  case_B_recombination: 0.01
  proton_mass: 1.0
  source_radius: 0.12
Snapshots:
  basename: {tmp_path / 'snap'}
  delta_time: 0.02
""")
    r = subprocess.run(
        [sys.executable, "-m", "swift_subtask_dev_tpu.cli",
         str(tmp_path / "rt.yml"), "--hydro", "--radiation", "--cpu",
         "--backend", "xla"],
        capture_output=True, text=True, timeout=1500, cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-3000:]
    snaps = sorted(tmp_path.glob("snap_*.hdf5"))
    assert snaps
    _, parts, _ = read_snapshot(str(snaps[-1]))
    g = parts[PTYPE_GAS]
    assert "PhotonEnergiesGroup1" in g and "MassFractionHI" in g
    pos = np.asarray(g["Coordinates"])
    rr = np.linalg.norm(pos - 0.5, axis=1)
    x = np.asarray(g["MassFractionHI"])
    E = np.asarray(g["PhotonEnergiesGroup1"])
    near, far = rr < 0.15, rr > 0.45
    # photons reached the core and ionized it; the edge stayed neutral
    assert E[near].mean() > 10.0 * max(E[far].mean(), 1e-12)
    assert x[near].mean() < 0.5, f"core x_HI={x[near].mean():.3f}"
    assert x[far].mean() > 0.9, f"edge x_HI={x[far].mean():.3f}"
    # injected energy is bounded by L*t (absorption only removes)
    V = np.asarray(g["Masses"]) / np.asarray(g["Densities"])
    E_tot = float((E * V).sum())
    assert E_tot <= 20.0 * 0.02 * 1.001


def test_cli_radiation_sphm1(tmp_path):
    """--radiation with an SPHM1RT: section drives the SPH-operator
    scheme through the same engine hook (the runtime analog of
    configure --with-rt=SPHM1RT_1)."""
    ic = str(tmp_path / "ic.hdf5")
    gas = _uniform_gas(10)
    star = {
        "Coordinates": np.array([[0.5, 0.5, 0.5]]),
        "Velocities": np.zeros((1, 3), np.float32),
        "Masses": np.array([1.0], np.float32),
        "ParticleIDs": np.array([999999], np.uint64),
    }
    write_snapshot(ic, (1.0, 1.0, 1.0), 0.0,
                   {PTYPE_GAS: gas, PTYPE_STARS: star})
    (tmp_path / "rt.yml").write_text(f"""
InternalUnitSystem:
  UnitMass_in_cgs: 1.0
  UnitLength_in_cgs: 1.0
  UnitVelocity_in_cgs: 1.0
TimeIntegration:
  time_begin: 0.0
  time_end:   0.01
  dt_max:     2.5e-3
  max_nr_rt_subcycles: 4
InitialConditions:
  file_name: {ic}
SPH:
  resolution_eta: 1.2348
  CFL_condition: 0.2
SPHM1RT:
  photon_groups: 1
  reduced_speed_of_light: 5.0
  group_cross_sections: [50.0]
  group_photon_energies: [1.0]
  star_luminosities: [20.0]
  proton_mass: 1.0
  source_radius: 0.12
Snapshots:
  basename: {tmp_path / 'snap'}
  delta_time: 0.01
""")
    r = subprocess.run(
        [sys.executable, "-m", "swift_subtask_dev_tpu.cli",
         str(tmp_path / "rt.yml"), "--hydro", "--radiation", "--cpu",
         "--backend", "xla"],
        capture_output=True, text=True, timeout=1500, cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-3000:]
    snaps = sorted(tmp_path.glob("snap_*.hdf5"))
    _, parts, _ = read_snapshot(str(snaps[-1]))
    g = parts[PTYPE_GAS]
    E = np.asarray(g["PhotonEnergiesGroup1"])
    pos = np.asarray(g["Coordinates"])
    rr = np.linalg.norm(pos - 0.5, axis=1)
    # photons injected and still near the source at t = 0.01 (front
    # radius c_red*t = 0.05)
    assert E.sum() > 0
    assert E[rr < 0.2].sum() > 100.0 * max(E[rr > 0.4].sum(), 1e-12)
