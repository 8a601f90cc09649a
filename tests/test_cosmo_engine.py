"""Cosmological (comoving) engine smoke: uniform EdS gas stays comoving.

In comoving coordinates a uniform gas with zero peculiar velocity is a
fixed point of the equations: comoving density and positions constant,
peculiar velocities ~0, comoving internal energy constant under adiabatic
expansion (the expansion cooling is absorbed by the a-factors — reference
hydro convention, hydro.h cosmology terms).
"""

import numpy as np

from swift_subtask_dev_tpu.engine import Engine, EngineConfig
from swift_subtask_dev_tpu.grid import CellGrid
from swift_subtask_dev_tpu.models.cosmology import Cosmology
from swift_subtask_dev_tpu.models.sph.sphenix import SPHENIXParams
from swift_subtask_dev_tpu.ics import uniform_box_ic
from swift_subtask_dev_tpu.utils.units import COSMO_UNITS


def test_comoving_uniform_box():
    cosmo = Cosmology(Omega_cdm=0.75, Omega_b=0.25, Omega_lambda=0.0,
                      h=0.7, a_begin=0.5, a_end=1.0,
                      phys_const=COSMO_UNITS.constants())
    ic = uniform_box_ic(n=6, u0=1e-8)  # cold gas, unit box (comoving)
    P = SPHENIXParams(h_max=0.3)
    grid = CellGrid(box=(1.0, 1.0, 1.0), cdim=(3, 3, 3), K=48)
    eng = Engine(grid, P, EngineConfig(dt_max=1e30), 0.0, 0.0,
                 cosmology=cosmo)
    eng.load_particles(ic["pos"], ic["m"], ic["v"], ic["u"], ic["h"])
    eng.init_particles()

    rho0 = np.asarray(eng.state["rho"]).copy()
    mask = np.asarray(eng.state["mask"]) > 0
    for _ in range(5):
        eng.step()
    a_now = cosmo.a_of_ti(eng.timeline.ti_current)
    assert 0.5 < a_now <= 1.0
    assert eng.timeline.ti_current > 0, "timeline did not advance"

    s = eng.state
    v = np.asarray(s["v_full"])[mask]
    rho1 = np.asarray(s["rho"])[mask]
    # comoving density unchanged; peculiar velocities stay negligible
    # vs the Hubble velocity scale H*L ~ 100 km/s
    vmax = np.abs(v).max()
    H_L = float(cosmo.H(a_now)) * 1.0
    assert vmax < 1e-2 * H_L, f"peculiar velocities grew: {vmax} vs H*L={H_L}"
    np.testing.assert_allclose(rho1, rho0[mask], rtol=5e-3)


def test_cosmo_tables_feed_tables():
    """StepTables built from cosmology integrals are finite and ordered."""
    cosmo = Cosmology(Omega_cdm=0.26, Omega_b=0.05, Omega_lambda=0.69,
                      h=0.68, a_begin=0.1, a_end=1.0,
                      phys_const=COSMO_UNITS.constants())
    ic = uniform_box_ic(n=4)
    P = SPHENIXParams(h_max=0.4)
    grid = CellGrid(box=(1.0, 1.0, 1.0), cdim=(3, 3, 3), K=24)
    eng = Engine(grid, P, EngineConfig(dt_max=1e30), 0.0, 0.0,
                 cosmology=cosmo)
    T = eng._tables()
    k1 = np.asarray(T.dt_kick1)
    assert np.isfinite(k1).all()
    # bins small enough to underflow the f64 tables never occur in practice
    # (dt_min guards); realistic bins are strictly positive and ordered
    assert (k1[25:] > 0).all()
    assert (np.diff(k1[25:]) >= -1e-12).all()
    assert (np.diff(k1[25:45]) > 0).all()
    assert float(T.time_base_inv) > 0


def test_neutrino_background():
    """Massive + massless neutrino background (cosmology.c:456-620):
    Omega_nu(a=1) matches the canonical Sum(m)/93.14 eV relation, the
    massless N_ur term is the 7/8 (T_nu/T_gamma)^4 ratio, and the massive
    density turns matter-like (a^-3) at late times."""
    from swift_subtask_dev_tpu.models.cosmology import Cosmology
    from swift_subtask_dev_tpu.utils.units import COSMO_UNITS
    h = 0.67
    Og = 2.47e-5 / h ** 2
    c = Cosmology(Omega_cdm=0.26, Omega_b=0.05, Omega_lambda=0.69, h=h,
                  a_begin=0.02, a_end=1.0, Omega_g=Og,
                  M_nu_eV=(0.06,), N_ur=2.0,
                  phys_const=COSMO_UNITS.constants())
    # canonical Omega_nu h^2 = m / 93.14 eV (to the known ~1% accuracy)
    assert abs(c.Omega_nu_0 * h ** 2 / (0.06 / 93.14) - 1) < 0.01
    # massless term
    assert abs(c.Omega_ur / (2.0 * 7 / 8 * 0.71599 ** 4 * Og) - 1) < 1e-12
    # late-time matter-like scaling: Omega_nu(a)/a^4 ~ a^-3 -> Omega_nu ~ a
    r = c.Omega_nu(1.0) / c.Omega_nu(0.5)
    assert abs(r - 2.0) < 0.05
    # E(a) increases when neutrinos are added (denser early universe)
    c0 = Cosmology(Omega_cdm=0.26, Omega_b=0.05, Omega_lambda=0.69, h=h,
                   a_begin=0.02, a_end=1.0,
                   phys_const=COSMO_UNITS.constants())
    assert c.E(0.02) > c0.E(0.02)
