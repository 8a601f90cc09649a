"""Unit tests for units, params, timeline, RNG, kernels, EOS.

Mirrors the reference's testKernel, testTimeline, testParser, testRandom
(tests/Makefile.am:27-52).
"""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from swift_subtask_dev_tpu.utils import Params, UnitSystem, timeline, prng
from swift_subtask_dev_tpu.models.sph import kernels, eos
from swift_subtask_dev_tpu.models.sph.kernels import (
    CUBIC_SPLINE, QUINTIC_SPLINE, WENDLAND_C2, WENDLAND_C6, KERNELS)


# --- units -------------------------------------------------------------------

def test_units_cosmo():
    u = UnitSystem(UnitMass_in_cgs=1.98841e43, UnitLength_in_cgs=3.08567758e24,
                   UnitVelocity_in_cgs=1e5)
    # Time unit = L/V = Mpc / (km/s) ≈ 9.78e11 yr in seconds
    assert np.isclose(u.UnitTime_in_cgs, 3.08567758e19)
    c = u.constants()
    # G in these units is the standard 43.007 (1e10 Msun, Mpc, km/s)
    assert np.isclose(c.const_newton_G, 43.00917, rtol=1e-4)
    # c in km/s
    assert np.isclose(c.const_speed_light_c, 299792.458, rtol=1e-9)


def test_units_conversion_roundtrip():
    a = UnitSystem(1e10, 1e5, 1e3)
    b = UnitSystem()
    f = b.convert_from(a, "energy")
    # 1 internal-a energy in cgs:
    assert np.isclose(f, a.to_cgs("energy"))


# --- params ------------------------------------------------------------------

def test_params_roundtrip(tmp_path):
    text = """
TimeIntegration:
  time_begin: 0.
  time_end:   0.2
  dt_max:     1e-2
SPH:
  resolution_eta: 1.2348
"""
    p = Params.from_string(text, overrides=["SPH:CFL_condition:0.1"])
    assert p.get_float("TimeIntegration", "time_end") == 0.2
    assert p.get_float("SPH", "CFL_condition") == 0.1
    assert p.opt_float("SPH", "h_tolerance", 1e-4) == 1e-4
    used = p.used_params()
    assert "TimeIntegration" in used and "time_end" in used["TimeIntegration"]
    unused = p.unused_params()
    assert "dt_max" in unused["TimeIntegration"]


# --- timeline ----------------------------------------------------------------

def test_timeline_bins():
    assert timeline.get_integer_timestep(0) == 0
    assert timeline.get_integer_timestep(1) == 4
    assert timeline.get_integer_timestep(56) == 2 ** 57
    assert timeline.get_time_bin(4) == 1
    assert timeline.get_time_bin(2 ** 57) == 56
    # round trip for every bin
    for b in range(1, 57):
        assert timeline.get_time_bin(timeline.get_integer_timestep(b)) == b


def test_timeline_time_end():
    # particle in bin 3 (dti=16): ends at multiples of 16
    assert timeline.get_integer_time_end(17, 3) == 32
    assert timeline.get_integer_time_end(32, 3) == 32
    assert timeline.get_integer_time_begin(17, 3) == 16


def test_make_integer_timestep_alignment():
    tb_inv = timeline.MAX_NR_TIMESTEPS / 1.0  # time span 1.0
    # A large dt rounds down to a power-of-two bin
    dti = timeline.make_integer_timestep(1e-10, 40, 0, tb_inv)
    assert dti & (dti - 1) == 0  # power of 2
    # increase capped at 2x current, and requires alignment
    cur_bin = 5
    ti = timeline.get_integer_timestep(cur_bin)  # just finished a bin-5 step
    dti2 = timeline.make_integer_timestep(1.0, cur_bin, ti, tb_inv)
    assert dti2 <= 2 * timeline.get_integer_timestep(cur_bin)


def test_ti_end_min_from_bins():
    tl = timeline.Timeline(0.0, 1.0)
    counts = np.zeros(57, dtype=int)
    counts[3] = 10
    counts[5] = 2
    got = tl.ti_end_min_from_bins(counts, ti=0)
    assert got == timeline.get_integer_timestep(3)


def test_active_mask():
    tl = timeline.Timeline(0.0, 1.0)
    tl.ti_current = timeline.get_integer_timestep(3)  # 16
    m = tl.active_bins_mask()
    assert m[1] and m[2] and m[3]
    assert not m[4] and not m[5]


# --- RNG ---------------------------------------------------------------------

def test_prng_deterministic():
    ids = jnp.arange(100, dtype=jnp.int32)
    u1 = prng.unit_interval(ids, 123456789, prng.RandomNumberType.STAR_FORMATION)
    u2 = prng.unit_interval(ids, 123456789, prng.RandomNumberType.STAR_FORMATION)
    u3 = prng.unit_interval(ids, 123456790, prng.RandomNumberType.STAR_FORMATION)
    assert np.allclose(u1, u2)
    assert not np.allclose(u1, u3)
    assert (np.asarray(u1) >= 0).all() and (np.asarray(u1) < 1).all()


# --- kernels -----------------------------------------------------------------

def kernel_norm_numeric(kern, n=20000):
    """3D volume integral of W: must be 1."""
    r = np.linspace(0, kern.gamma, n)
    w, _ = kern.deval(jnp.asarray(r, jnp.float32))
    w = np.asarray(w)
    return np.trapezoid(4 * np.pi * r ** 2 * w, r)


@pytest.mark.parametrize("name", list(KERNELS))
def test_kernel_normalisation(name):
    k = KERNELS[name]
    assert np.isclose(kernel_norm_numeric(k), 1.0, atol=2e-3)


def test_cubic_spline_values():
    k = CUBIC_SPLINE
    # W(0) = kernel_root = c * 0.5 / gamma^3
    w0, dw0 = k.deval(jnp.asarray([0.0], jnp.float32))
    expect = 16.0 / math.pi * 0.5 / k.gamma ** 3
    assert np.isclose(w0[0], expect, rtol=1e-6)
    assert np.isclose(k.root, expect, rtol=1e-6)
    # zero outside support
    w, dw = k.deval(jnp.asarray([k.gamma * 1.01, 5.0], jnp.float32))
    assert (np.asarray(w) == 0).all() and (np.asarray(dw) == 0).all()


@pytest.mark.parametrize("name", list(KERNELS))
def test_kernel_derivative_consistency(name):
    """dw/du matches finite differences of w."""
    k = KERNELS[name]
    u = np.linspace(0.01, k.gamma * 0.99, 500).astype(np.float32)
    du = 1e-3
    w_p, _ = k.deval(jnp.asarray(u + du))
    w_m, _ = k.deval(jnp.asarray(u - du))
    _, dw = k.deval(jnp.asarray(u))
    fd = (np.asarray(w_p) - np.asarray(w_m)) / (2 * du)
    # Skip points adjacent to branch boundaries where FD straddles branches
    mask = np.ones_like(u, dtype=bool)
    for i in range(1, k.ivals + 1):
        edge = k.gamma * i / k.ivals
        mask &= np.abs(u - edge) > 2 * du
    assert np.allclose(np.asarray(dw)[mask], fd[mask], atol=2e-2)


def test_kernel_root_and_norm():
    # N_ngb for eta=1.2348 with cubic spline ≈ 48 (SWIFT documentation value)
    eta = 1.2348
    n_ngb = eta ** 3 * CUBIC_SPLINE.norm
    assert 47.0 < n_ngb < 49.0


# --- EOS ---------------------------------------------------------------------

def test_eos_ideal_gas():
    g = eos.IdealGas(5.0 / 3.0)
    rho, u = jnp.float32(2.0), jnp.float32(3.0)
    P = g.pressure_from_internal_energy(rho, u)
    assert np.isclose(P, (5 / 3 - 1) * 2 * 3)
    assert np.isclose(g.internal_energy_from_pressure(rho, P), u)
    A = g.entropy_from_internal_energy(rho, u)
    assert np.isclose(g.internal_energy_from_entropy(rho, A), u, rtol=1e-6)
    cs = g.soundspeed_from_pressure(rho, P)
    assert np.isclose(cs, np.sqrt(5 / 3 * P / rho), rtol=1e-6)
