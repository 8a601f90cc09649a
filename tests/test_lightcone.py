"""Lightcone crossing detection (src/lightcone/ core behavior).

Static particles at known comoving radii from the observer must be
recorded exactly once, at the step where the shrinking lightcone radius
sweeps past them, with chi(a_cross) matching their radius.
"""

import dataclasses

import h5py
import numpy as np

from swift_subtask_dev_tpu.engine import DMEngine, EngineConfig
from swift_subtask_dev_tpu.grid import CellGrid
from swift_subtask_dev_tpu.io.lightcone import (LightconeParams,
                                                LightconeWriter,
                                                comoving_distance)
from swift_subtask_dev_tpu.models.cosmology import Cosmology
from swift_subtask_dev_tpu.utils.units import COSMO_UNITS
from swift_subtask_dev_tpu.utils import timeline as tl


def test_lightcone_crossings(tmp_path):
    const = COSMO_UNITS.constants()
    # a toy speed of light so the cone radius sweeps ~0.4 box over the run
    const = dataclasses.replace(const, const_speed_light_c=30.0)
    a0, a1 = 0.25, 1.0
    cosmo = Cosmology(Omega_cdm=1.0, Omega_b=0.0, Omega_lambda=0.0,
                      h=0.7, a_begin=a0, a_end=a1, phys_const=const)

    chi0 = comoving_distance(cosmo, 0)
    chi1 = comoving_distance(cosmo, tl.MAX_NR_TIMESTEPS)
    assert chi1 == 0.0
    assert 0.2 < chi0 < 0.5

    obs = (0.5, 0.5, 0.5)
    radii = np.array([0.05, 0.12, 0.2, 0.3])
    offsets = [(r, 0.0, 0.0) for r in radii]
    # one particle beyond chi(a0) ~ 0.429 (off-axis: |r| = 0.469, still
    # inside the half-box so the minimum image keeps that distance)
    offsets.append((0.3, 0.3, 0.2))
    radii = np.array([np.linalg.norm(o) for o in offsets])
    n = len(offsets)
    pos = np.mod(np.asarray(obs)[None, :] + np.asarray(offsets), 1.0)
    m = np.full(n, 1e-12, np.float32)               # self-gravity ~ none

    grid = CellGrid(box=(1.0, 1.0, 1.0), cdim=(4, 4, 4), K=16)
    H0 = float(cosmo.H(1.0))
    t_span = 2.0 / (3.0 * H0) * (a1 ** 1.5 - a0 ** 1.5)
    cfg = EngineConfig(dt_max=float(t_span / 64))
    eng = DMEngine(grid, cfg, 0.0, 0.0,
                   gravity_fn=lambda s: (0.0 * s["a_grav"], None),
                   eps_soft=1e-3, cosmology=cosmo)
    eng.load_dm(pos, m, np.zeros((n, 3), np.float32))
    eng.init_particles()

    lc = LightconeWriter(LightconeParams(observer_position=obs), cosmo,
                         grid)
    steps = 0
    while eng.timeline.ti_current < tl.MAX_NR_TIMESTEPS and steps < 200:
        ti_old = eng.timeline.ti_current
        eng.step()
        lc.after_step(eng.state, ti_old, eng.timeline.ti_current)
        steps += 1

    path = lc.flush(str(tmp_path / "lc.hdf5"))
    with h5py.File(path) as f:
        pid = np.asarray(f["PartTypeAll/ParticleIDs"])
        a_cross = np.asarray(f["PartTypeAll/ScaleFactorCrossing"])
        coords = np.asarray(f["PartTypeAll/Coordinates"])

    # radii inside the sweep recorded exactly once; 0.6 never
    want = radii[radii < chi0]
    assert len(pid) == len(want)
    assert len(np.unique(pid)) == len(pid)

    # chi at the recorded crossing step matches the particle radius to
    # one step's radius sweep
    for k in range(len(pid)):
        r_k = np.linalg.norm(coords[k] - np.asarray(obs))
        # invert chi at the recorded scale factor
        la = np.log(a_cross[k])
        ti = int(round((la - cosmo.log_a_begin)
                       / (cosmo.log_a_end - cosmo.log_a_begin)
                       * tl.MAX_NR_TIMESTEPS))
        chi_k = comoving_distance(cosmo, ti)
        assert abs(chi_k - r_k) < 0.02, (r_k, chi_k)


def test_lightcone_shell_maps(tmp_path):
    """Crossings accumulate into the HEALPix shell maps with the map
    mass equal to the recorded particle mass (lightcone_map.c)."""
    const = dataclasses.replace(COSMO_UNITS.constants(),
                                const_speed_light_c=30.0)
    cosmo = Cosmology(Omega_cdm=1.0, Omega_b=0.0, Omega_lambda=0.0,
                      h=0.7, a_begin=0.25, a_end=1.0, phys_const=const)
    obs = (0.5, 0.5, 0.5)
    rng = np.random.default_rng(4)
    n = 64
    pos = np.mod(np.asarray(obs) + rng.uniform(-0.3, 0.3, (n, 3)), 1.0)
    m = np.full(n, 2.0, np.float32)

    grid = CellGrid(box=(1.0, 1.0, 1.0), cdim=(4, 4, 4), K=16)
    H0 = float(cosmo.H(1.0))
    t_span = 2.0 / (3.0 * H0) * (1.0 - 0.25 ** 1.5)
    eng = DMEngine(grid, EngineConfig(dt_max=float(t_span / 64)),
                   0.0, 0.0,
                   gravity_fn=lambda s: (0.0 * s["a_grav"], None),
                   eps_soft=1e-3, cosmology=cosmo)
    eng.load_dm(pos, m, np.zeros((n, 3), np.float32))
    eng.init_particles()

    chi0 = comoving_distance(cosmo, 0)
    lc = LightconeWriter(
        LightconeParams(observer_position=obs, nside=2,
                        shell_edges=(0.0, chi0 / 2, 1.5 * chi0)),
        cosmo, grid)
    steps = 0
    while eng.timeline.ti_current < tl.MAX_NR_TIMESTEPS and steps < 200:
        ti_old = eng.timeline.ti_current
        eng.step()
        lc.after_step(eng.state, ti_old, eng.timeline.ti_current)
        steps += 1
    path = lc.flush(str(tmp_path / "lc_maps.hdf5"))
    with h5py.File(path) as f:
        masses = np.asarray(f["PartTypeAll/Masses"])
        maps = np.asarray(f["ShellMaps/TotalMass"])
        assert int(f["ShellMaps"].attrs["Nside"]) == 2
    assert len(masses) > 0
    np.testing.assert_allclose(maps.sum(), masses.sum(), rtol=1e-6)
