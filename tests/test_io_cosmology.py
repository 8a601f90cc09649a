"""Snapshot I/O round-trip + cosmology table tests.

Ports of testSelectOutput/testCosmology from the reference suite.
"""

import numpy as np
import pytest

from swift_subtask_dev_tpu.io.snapshot import (
    write_snapshot, read_snapshot, PTYPE_GAS, PTYPE_DM)
from swift_subtask_dev_tpu.models.cosmology import Cosmology
from swift_subtask_dev_tpu.utils.units import COSMO_UNITS
from swift_subtask_dev_tpu.utils import timeline as tl


def test_snapshot_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    n_gas, n_dm = 100, 50
    parts = {
        PTYPE_GAS: {
            "Coordinates": rng.uniform(0, 2, (n_gas, 3)),
            "Velocities": rng.normal(0, 1, (n_gas, 3)).astype(np.float32),
            "Masses": rng.uniform(1, 2, n_gas).astype(np.float32),
            "InternalEnergies": rng.uniform(0.5, 1, n_gas).astype(np.float32),
            "SmoothingLengths": np.full(n_gas, 0.1, np.float32),
            "ParticleIDs": np.arange(n_gas, dtype=np.uint64),
        },
        PTYPE_DM: {
            "Coordinates": rng.uniform(0, 2, (n_dm, 3)),
            "Velocities": rng.normal(0, 1, (n_dm, 3)).astype(np.float32),
            "Masses": np.full(n_dm, 3.0, np.float32),
            "ParticleIDs": np.arange(n_dm, dtype=np.uint64) + 1000,
        },
    }
    path = str(tmp_path / "snap_0000.hdf5")
    write_snapshot(path, (2.0, 2.0, 2.0), 0.25, parts, units=COSMO_UNITS)
    hdr, got, units = read_snapshot(path)
    assert hdr["NumPart_Total"][0] == n_gas
    assert hdr["NumPart_Total"][1] == n_dm
    assert np.isclose(hdr["Time"], 0.25)
    np.testing.assert_allclose(got[PTYPE_GAS]["Coordinates"],
                               parts[PTYPE_GAS]["Coordinates"])
    np.testing.assert_allclose(got[PTYPE_DM]["Masses"], 3.0)
    assert np.isclose(units.UnitMass_in_cgs, COSMO_UNITS.UnitMass_in_cgs)


# --- cosmology ---------------------------------------------------------------

def eds_cosmology():
    """Einstein-de Sitter: Omega_m=1 — everything analytic."""
    return Cosmology(Omega_cdm=0.75, Omega_b=0.25, Omega_lambda=0.0,
                     h=0.7, a_begin=0.02, a_end=1.0,
                     phys_const=COSMO_UNITS.constants())


def test_eds_expansion():
    c = eds_cosmology()
    # H(a) = H0 a^-3/2 for EdS
    for a in (0.02, 0.1, 0.5, 1.0):
        assert np.isclose(float(c.E(a)), a ** -1.5, rtol=1e-12)
    # cosmic time: t(a) = 2/(3 H0) a^{3/2}; table measures from a_begin
    t_half = c.time_of_ti(tl.MAX_NR_TIMESTEPS)  # at a_end=1
    expect = 2.0 / (3 * c.H0) * (1.0 - 0.02 ** 1.5)
    assert np.isclose(t_half, expect, rtol=1e-5)


def test_eds_drift_kick_factors():
    c = eds_cosmology()
    # analytic: drift = int dt/a^2 = int da/(a^3 H) = int da /(H0 a^{1.5})
    #         = (2/H0)(a1^-0.5 - a2^-0.5)... careful sign
    ti0 = 0
    ti1 = tl.MAX_NR_TIMESTEPS // 2
    a0, a1 = c.a_of_ti(ti0), c.a_of_ti(ti1)
    drift = c.drift_factor(ti0, ti1)
    expect_drift = (2.0 / c.H0) * (a0 ** -0.5 - a1 ** -0.5)
    assert np.isclose(drift, expect_drift, rtol=1e-4)
    # grav kick: int da/(a^2 H) = (2/(3...)): int H0^-1 a^-0.5 da
    kick = c.grav_kick_factor(ti0, ti1)
    expect_kick = (2.0 / c.H0) * (a1 ** 0.5 - a0 ** 0.5)
    assert np.isclose(kick, expect_kick, rtol=1e-4)


def test_lcdm_sanity():
    c = Cosmology(Omega_cdm=0.2589, Omega_b=0.0486, Omega_lambda=0.693,
                  h=0.6774, a_begin=0.0078125, a_end=1.0,
                  phys_const=COSMO_UNITS.constants())
    # age of universe ~ 13.8 Gyr; internal time unit is Mpc/(km/s)=977.8 Gyr
    age = c.time_of_ti(tl.MAX_NR_TIMESTEPS) \
        / COSMO_UNITS.constants().const_year / 1e9
    assert 13.0 < age < 14.5, f"age {age} Gyr"
    # factors positive and ordered
    m = tl.MAX_NR_TIMESTEPS
    assert c.drift_factor(0, m // 2) > 0
    assert c.grav_kick_factor(m // 2, m) > 0
    f = c.factors_at(m)
    assert np.isclose(float(f.a), 1.0, rtol=1e-6)
