"""Primordial H/He network cooling (the Grackle-mode analog).

Reference: src/cooling/grackle/cooling.c:772 (cooling_cool_part driving
solve_chemistry).  Gates: CIE ionization structure at the textbook
temperatures, the primordial cooling-curve shape (H-excitation peak,
bremsstrahlung asymptote), cooling-time consistency, Compton coupling to
the CMB at high z, and the engine-hook contract.
"""

import jax.numpy as jnp
import numpy as np

from swift_subtask_dev_tpu.subgrid import primordial as pr

MODEL = pr.PrimordialCooling()


def test_cie_hydrogen_half_ionization():
    """CIE H is half-ionized near T ~ 1.5e4 K and fully ionized by 1e5
    (KWH96 fig. 1)."""
    T = jnp.asarray(np.geomspace(8e3, 3e5, 200), jnp.float32)
    xHII, _, _ = pr.equilibrium(MODEL, T, jnp.ones_like(T))
    x = np.asarray(xHII)
    Th = np.asarray(T)[np.argmin(np.abs(x - 0.5))]
    assert 1.2e4 < Th < 2.2e4, f"H half-ionization at {Th:.3g} K"
    assert x[-1] > 0.999
    assert x[0] < 0.05


def test_cie_helium_ladder():
    """HeII dominates around 5e4-1e5 K; HeIII takes over above ~1e5."""
    yHe = MODEL.yHe
    T = jnp.asarray([5e4, 8e4, 1e6], jnp.float32)
    _, xHeII, xHeIII = pr.equilibrium(MODEL, T, jnp.ones_like(T))
    assert float(xHeII[0]) > 0.5 * yHe          # HeII zone
    assert float(xHeIII[2]) > 0.95 * yHe        # fully doubly-ionized
    assert float(xHeIII[0]) < 0.1 * yHe


def test_cooling_curve_shape():
    """Primordial CIE Lambda/nH^2: excitation peak at ~1e5 K of order
    1e-22 erg cm^3/s, a dip near 2-3e5, and the sqrt(T) free-free
    asymptote above 1e7 (KWH96 fig. 1 / any published primordial
    curve)."""
    T = jnp.asarray(np.geomspace(1e4, 1e8, 400), jnp.float32)
    lam = np.asarray(pr.cie_cooling_rate(MODEL, T, jnp.ones_like(T)))
    Ta = np.asarray(T)
    # global peak: H collisional excitation right at the CIE ionization
    # transition (log T ~ 4.3, Lambda ~ 1e-22 — SD93 zero-metal curve)
    ipk = np.argmax(lam)
    Tpk = Ta[ipk]
    assert 1.4e4 < Tpk < 3.5e4, f"peak at {Tpk:.3g} K"
    assert 5e-23 < lam[ipk] < 5e-22
    # the He excitation/ionization shoulder near 8e4 K
    i_he = np.argmin(np.abs(Ta - 8.4e4))
    i_dip = np.argmin(np.abs(Ta - 4.5e4))
    assert lam[i_he] > 1.3 * lam[i_dip]
    # neutral gas below the excitation threshold barely cools
    assert lam[0] < 1e-2 * lam[ipk]
    # free-free minimum near 1e6 then the ~sqrt(T) rise
    l7 = lam[np.argmin(np.abs(Ta - 1e7))]
    l8 = lam[np.argmin(np.abs(Ta - 1e8))]
    assert 2.2 < l8 / l7 < 4.0
    # magnitude vs the ff formula at 1e8 K (fully ionized primordial)
    ne = 1.0 + 2.0 * MODEL.yHe
    ni = 1.0 + 4.0 * MODEL.yHe
    gff = 1.1 + 0.34 * np.exp(-((5.5 - 8.0) ** 2) / 3.0)
    lam_ff = 1.42e-27 * gff * np.sqrt(1e8) * ne * ni
    assert 0.7 < l8 / lam_ff < 1.4


def test_network_cools_to_equilibrium():
    """Hot ionized gas at nH=1 cools; species relax toward CIE."""
    u0 = pr.K_B * 1e6 / ((pr.GAMMA - 1) * 0.6 * pr.M_H)  # ~1e6 K
    yHe = MODEL.yHe
    u, xHII, xHeII, xHeIII = pr.solve(
        MODEL, jnp.float32(u0), jnp.float32(1.0),
        jnp.float32(0.1 * yHe), jnp.float32(0.9 * yHe),
        jnp.float32(1.0), jnp.float32(3.15e13), 0.0, n_substeps=400)
    assert float(u) < u0                        # it cooled
    T = pr.temperature_of(u, xHII, xHeII, xHeIII, yHe)
    xe_eq = pr.equilibrium(MODEL, T, jnp.float32(1.0))[0]
    assert abs(float(xHII) - float(xe_eq)) < 0.05


def test_cooling_time_bremsstrahlung():
    """t_cool at 1e8 K, nH=1: (3/2) n_tot k T / Lambda_ff — the network
    must agree with its own ff asymptote to ~30%."""
    T0 = 1e8
    yHe = MODEL.yHe
    ne = 1.0 + 2.0 * yHe
    ni = 1.0 + 4.0 * yHe
    n_tot = 1.0 + yHe + ne
    gff = 1.1 + 0.34 * np.exp(-((5.5 - 8.0) ** 2) / 3.0)
    lam = 1.42e-27 * gff * np.sqrt(T0) * ne * ni
    t_ff = 1.5 * n_tot * pr.K_B * T0 / lam
    mu = (1 + 4 * yHe) / n_tot
    u0 = pr.K_B * T0 / ((pr.GAMMA - 1) * mu * pr.M_H)
    dt = 0.02 * t_ff
    u, *_ = pr.solve(MODEL, jnp.float32(u0), jnp.float32(1.0),
                     jnp.float32(0.0), jnp.float32(yHe),
                     jnp.float32(1.0), jnp.float32(dt), 0.0,
                     n_substeps=64)
    t_meas = dt / (1.0 - float(u) / u0)
    assert 0.7 < t_meas / t_ff < 1.4, (t_meas, t_ff)


def test_compton_heats_cold_gas_at_high_z():
    """Below T_CMB(z) the Compton term HEATS (rate sign flips)."""
    rate_cold = float(pr.compton_rate(jnp.float32(5.0),
                                      jnp.float32(1.0), 9.0))
    rate_hot = float(pr.compton_rate(jnp.float32(1e4),
                                     jnp.float32(1.0), 9.0))
    assert rate_cold > 0 and rate_hot < 0
    # exact magnitude of the formula
    expect = -5.65e-36 * 10.0 ** 4 * (1e4 - 2.7255 * 10.0)
    assert abs(rate_hot - expect) / abs(expect) < 1e-5


def test_engine_hook_contract():
    """The cooling_fn rewrites u_dt and the species tiles, honours
    dt<=0, and the u_dt it writes reproduces the network's du."""
    from swift_subtask_dev_tpu.models.sph.sphenix import CosmoFactors

    model = pr.PrimordialCooling(rho_to_cgs=1e-23, u_to_cgs=1e10,
                                 time_to_cgs=3.15e13)
    fn = pr.make_primordial_cooling_fn(model)
    shape = (2, 4)
    T0 = 1e6
    mu = 0.6
    u_cgs = pr.K_B * T0 / ((pr.GAMMA - 1) * mu * pr.M_H)
    s = {"u_full": jnp.full(shape, u_cgs / 1e10, jnp.float32),
         "rho": jnp.full(shape, model.X_H * pr.M_H / 1e-23, jnp.float32),
         "u_dt": jnp.zeros(shape, jnp.float32),
         **pr.initial_fractions(model, shape)}
    s["xHII"] = jnp.ones(shape, jnp.float32)
    s["xHeIII"] = jnp.full(shape, model.yHe, jnp.float32)
    cosmo = CosmoFactors.no_cosmo()
    out = fn(s, cosmo, jnp.float32(1e-3))
    assert set(out) == {"u_dt", "xHII", "xHeII", "xHeIII"}
    assert float(out["u_dt"].max()) < 0.0       # hot ionized gas cools
    out0 = fn(s, cosmo, jnp.float32(0.0))
    np.testing.assert_array_equal(np.asarray(out0["u_dt"]), 0.0)
    np.testing.assert_array_equal(np.asarray(out0["xHII"]),
                                  np.asarray(s["xHII"]))


def test_cli_grackle_cooling(tmp_path):
    """CLI end-to-end with the GrackleCooling: section — the species
    tiles ride the state, the run completes, and hot gas loses energy."""
    import subprocess
    import sys

    from swift_subtask_dev_tpu.io.snapshot import (PTYPE_GAS,
                                                   write_snapshot)
    from swift_subtask_dev_tpu.ics import uniform_box_ic

    ic = uniform_box_ic(n=8, jitter=0.05)
    n = len(ic["pos"])
    # galactic-style units so cgs densities/temperatures are sane
    ic_path = str(tmp_path / "ic.hdf5")
    write_snapshot(ic_path, ic["box"], 0.0, {PTYPE_GAS: {
        "Coordinates": ic["pos"], "Velocities": ic["v"],
        "Masses": ic["m"], "InternalEnergies": ic["u"] * 100.0,
        "SmoothingLengths": ic["h"],
        "ParticleIDs": np.arange(n, dtype=np.uint64)}})
    params = f"""
InternalUnitSystem:
  UnitMass_in_cgs: 1.988e43
  UnitLength_in_cgs: 3.086e21
  UnitVelocity_in_cgs: 1e5

TimeIntegration:
  time_begin: 0.0
  time_end:   0.002
  dt_max:     1e-3

InitialConditions:
  file_name: {ic_path}

SPH:
  resolution_eta: 1.2348
  CFL_condition:  0.1

GrackleCooling:
  HydrogenFractionByMass: 0.76
  n_substeps: 8

Snapshots:
  basename: {tmp_path / 'snap'}

Statistics:
  delta_time: 1e-3
  basename: {tmp_path / 'statistics'}
"""
    p = tmp_path / "run.yml"
    p.write_text(params)
    r = subprocess.run(
        [sys.executable, "-m", "swift_subtask_dev_tpu.cli", str(p),
         "--hydro", "--cooling", "--cpu", "--backend", "xla", "-n", "2"],
        capture_output=True, text=True, timeout=900, cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-3000:]
