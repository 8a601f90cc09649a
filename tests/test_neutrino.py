"""Neutrino delta-f particles (neutrino/Default, fermi_dirac.c).

The delta-f gate: unperturbed thermal neutrinos carry ~zero weight, so
the weighted mesh deposit's P(k) is shot-noise-suppressed by orders of
magnitude against weighting them fully (the background-only load)."""

import numpy as np
import jax.numpy as jnp

from swift_subtask_dev_tpu.subgrid.neutrino import (NeutrinoModel,
                                                    _FD_X, _FD_CDF)
from swift_subtask_dev_tpu.utils import Params, UnitSystem


def _model():
    units = UnitSystem(1.98841e43, 3.08567758e24, 1e5, 1.0, 1.0)
    params = Params.from_string("Neutrino:\n  m_nu_eV: 0.3")
    return NeutrinoModel.from_params(params, units)


def test_fermi_dirac_sampling_statistics():
    m = _model()
    pid = jnp.arange(20000, dtype=jnp.int32)
    y = np.asarray(m.sample_y(pid))
    # FD momentum moments: <y> = 3.1514 (7 pi^4/180 zeta3...)
    assert abs(y.mean() - 3.151) < 0.05, y.mean()
    assert (y > 0).all() and y.max() < 25.0


def test_weights_vanish_unperturbed_and_grow_perturbed():
    m = _model()
    pid = np.arange(500, dtype=np.int32)
    a = 0.5
    v = m.thermal_velocities(pid, a)
    y0 = m.sample_y(jnp.asarray(pid))
    mask = jnp.ones(len(pid), jnp.float32)
    w0 = np.asarray(m.weights(jnp.asarray(v, jnp.float32), mask, y0, a))
    assert np.abs(w0).max() < 1e-4, "unperturbed weights must vanish"
    # gravitational slowing (momentum decrease) -> positive... the sign
    # convention: slower than sampled -> f̄(cur) > f̄(0) -> w < 0;
    # faster -> w in (0, 1)
    w_fast = np.asarray(m.weights(jnp.asarray(v * 1.3, jnp.float32),
                                  mask, y0, a))
    assert (w_fast > 0).all() and (w_fast < 1).all()
    w_slow = np.asarray(m.weights(jnp.asarray(v * 0.7, jnp.float32),
                                  mask, y0, a))
    assert (w_slow < 0).all()


def test_delta_f_suppresses_shot_noise_pk():
    from swift_subtask_dev_tpu.ops.pm_gravity import PMMeshParams
    from swift_subtask_dev_tpu.ops.power_spectrum import power_spectrum

    m = _model()
    rng = np.random.default_rng(2)
    n = 20000
    pos = rng.uniform(0, 1, (n, 3))
    pid = np.arange(n, dtype=np.int32)
    a = 0.5
    v = m.thermal_velocities(pid, a)
    y0 = m.sample_y(jnp.asarray(pid))
    w = np.asarray(m.weights(jnp.asarray(v, jnp.float32),
                             jnp.ones(n, jnp.float32), y0, a))
    pm = PMMeshParams(N=32, box=(1.0, 1.0, 1.0))
    mass = np.ones(n, np.float32)
    _, P_bg, _ = power_spectrum(pm, jnp.asarray(pos), jnp.asarray(mass),
                                subtract_shot_noise=False)
    # weighted contrast: deposit w*m on top of the mean background
    _, P_df, _ = power_spectrum(pm, jnp.asarray(pos),
                                jnp.asarray(mass * (1.0 + w)),
                                subtract_shot_noise=False)
    # identical up to the ~0 weights: the perturbation field carries no
    # extra power; the REAL comparison is the weighted-perturbation
    # field delta_f = sum w_i m_i vs the full shot noise
    from swift_subtask_dev_tpu.ops.pm_gravity import cic_deposit
    g_full = np.asarray(cic_deposit(pm, jnp.asarray(pos),
                                    jnp.asarray(mass)))
    g_w = np.asarray(cic_deposit(pm, jnp.asarray(pos),
                                 jnp.asarray(mass * w)))
    # the delta-f field's variance is suppressed by orders of magnitude
    var_full = np.var(g_full)
    var_w = np.var(g_w)
    assert var_w < 1e-6 * var_full, (var_w, var_full)


def test_multi_engine_runs_with_neutrinos():
    from swift_subtask_dev_tpu.engine import EngineConfig
    from swift_subtask_dev_tpu.engine_multi import MultiEngine
    from swift_subtask_dev_tpu.grid import CellGrid
    from swift_subtask_dev_tpu.models.gravity import (GravityParams,
                                                      GravitySolver)
    from swift_subtask_dev_tpu.models.sph.sphenix import SPHENIXParams

    m = _model()
    rng = np.random.default_rng(4)
    n = 300
    pos_dm = rng.uniform(0, 1, (n, 3))
    pos_nu = rng.uniform(0, 1, (n, 3))
    gp = GravityParams(G=1.0, eps=0.02, mesh_N=24)
    grid = CellGrid(box=(1.0, 1.0, 1.0), cdim=(3, 3, 3), K=80)
    solver = GravitySolver(gp, grid)
    cfg = EngineConfig(dt_max=1e-4, p2p_reach=solver.pm.r_cut,
                       eta_grav=gp.eta, eps_soft=gp.eps)
    eng = MultiEngine(grid, SPHENIXParams(), cfg, 0.0, 1.0,
                      gravity_fn=solver.short_range_accelerations,
                      eps_soft=gp.eps,
                      mesh_fn=solver.mesh_accelerations,
                      mesh_dt_scale=solver.pm.r_s, nu_model=m)
    eng.load_dm(pos_dm, np.full(n, 1.0 / n, np.float32),
                np.zeros((n, 3), np.float32))
    eng.load_nu(pos_nu, np.full(n, 0.05 / n, np.float32))
    eng.init_particles()
    for _ in range(3):
        eng.step()
    nu = eng.state["nu"]
    mask = np.asarray(nu["mask"]) > 0
    assert mask.sum() == n
    # neutrinos received a mesh kick but no short-range acceleration
    assert np.abs(np.asarray(nu["a_grav_mesh"])[mask]).max() > 0
    assert np.abs(np.asarray(nu["a_grav"])[mask]).max() == 0.0
    assert np.isfinite(np.asarray(nu["v_full"])[mask]).all()
