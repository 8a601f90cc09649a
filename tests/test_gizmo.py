"""Gizmo MFM/MFV: geometry, gradient exactness, oracle match, engine
conservation.

The linear-field test is the defining property of the matrix gradients
(hydro_gradients_gizmo.h): with B = E^-1 the least-squares gradient of a
linear function is exact regardless of particle disorder — SPH gradients
are not.  The oracle tests mirror the reference's test27cells strategy.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from swift_subtask_dev_tpu.engine import Engine, EngineConfig
from swift_subtask_dev_tpu.grid import CellGrid
from swift_subtask_dev_tpu.grid.cellgrid import bucket_fields, \
    global_positions
from swift_subtask_dev_tpu.models.sph import gizmo, sphenix
from swift_subtask_dev_tpu.models.sph.gizmo import GizmoMFMParams
from swift_subtask_dev_tpu.models.sph.gizmo_mfv import GizmoMFVParams
from swift_subtask_dev_tpu.ics import uniform_box_ic
from swift_subtask_dev_tpu.ops import bruteforce, stencil

COSMO = sphenix.CosmoFactors.no_cosmo()


def _bucketed_state(ic, p, grid, extra_fields=None):
    n = len(ic["pos"])
    fields = {
        "m": jnp.asarray(ic["m"]), "v": jnp.asarray(ic["v"]),
        "h": jnp.asarray(ic["h"]), "u": jnp.asarray(ic["u"]),
        "pid": jnp.arange(n, dtype=jnp.int32),
    }
    if extra_fields:
        fields.update({k: jnp.asarray(v, jnp.float32)
                       for k, v in extra_fields.items()})
    out, mask, off, n_over = bucket_fields(grid, jnp.asarray(ic["pos"]),
                                           fields)
    assert int(n_over) == 0
    s = {"mask": mask, "off": off, **out,
         "v_sig": jnp.zeros_like(mask),
         "alpha_visc": jnp.zeros_like(mask),
         "alpha_visc_max_ngb": jnp.zeros_like(mask),
         "time_bin": jnp.zeros(mask.shape, jnp.int32)}
    return s


def _flatten(grid, s, extra=()):
    """Unbucket to (N,) arrays sorted by pid."""
    mask = np.asarray(s["mask"]).reshape(-1) > 0
    pid = np.asarray(s["pid"]).reshape(-1)[mask]
    order = np.argsort(pid)
    pos = global_positions(grid, np.asarray(s["off"])).reshape(-1, 3)[mask]

    def flat(src):
        a = np.asarray(src)
        return a.reshape((-1,) + a.shape[2:])[mask][order]

    return pos[order], flat, mask, order


def test_gizmo_volume_and_geometry():
    """Volumes partition the box; lattice geometry is well conditioned."""
    ic = uniform_box_ic(n=6, jitter=0.08, seed=3)
    p = GizmoMFMParams(h_max=0.4)
    grid = CellGrid(box=(1.0, 1.0, 1.0), cdim=(3, 3, 3), K=48)
    s = _bucketed_state(ic, p, grid)
    dens = stencil.density_loop(grid, s, p)
    full = gizmo.end_density(p, {**s, **dens}, COSMO)
    mask = np.asarray(s["mask"]) > 0
    V = np.asarray(full["gvol"])[mask]
    ok = np.asarray(full["geom_ok"])[mask]
    assert (ok == 1.0).all()
    # sum of volumes ~ box volume (eqn 1 normalisation; not exact — the
    # kernel partition of unity holds to a few percent on a jittered box)
    assert abs(V.sum() - 1.0) < 0.05, V.sum()
    # rho = m / V scatters with the unconverged IC h, but the mean must
    # sit on the lattice density
    rho = np.asarray(full["rho"])[mask]
    np.testing.assert_allclose(rho, 1.0, rtol=0.25)
    assert abs(rho.mean() - 1.0) < 0.03, rho.mean()


def test_gizmo_gradients_exact_for_linear_fields():
    ic = uniform_box_ic(n=8, jitter=0.2, seed=5)
    p = GizmoMFMParams(h_max=0.3)
    grid = CellGrid(box=(1.0, 1.0, 1.0), cdim=(4, 4, 4), K=48)
    s = _bucketed_state(ic, p, grid)
    dens = stencil.density_loop(grid, s, p)
    s = gizmo.end_density(p, {**s, **dens}, COSMO)

    # linear primitive fields over the *global* positions
    pos = global_positions(grid, np.asarray(s["off"]))
    gP = np.array([0.5, 0.25, -0.125], np.float32)
    gvx = np.array([0.0, 0.3, 0.0], np.float32)
    P_lin = 1.0 + pos @ gP
    vx_lin = pos @ gvx
    v = np.zeros(pos.shape + (), np.float32)
    s = {**s,
         "pressure": jnp.asarray(P_lin, jnp.float32),
         "soundspeed": jnp.ones_like(s["m"]),
         "fv0": jnp.asarray(vx_lin, jnp.float32),
         "fv1": jnp.zeros_like(s["m"]),
         "fv2": jnp.zeros_like(s["m"]),
         "v": jnp.stack([jnp.asarray(vx_lin, jnp.float32),
                         jnp.zeros_like(s["m"]),
                         jnp.zeros_like(s["m"])], axis=-1)}
    grad = stencil.gradient_loop(grid, s, p, COSMO)

    posf, flat, _, _ = _flatten(grid, s)
    # interior particles only: the linear field is not periodic, so pairs
    # wrapping the box see a jump
    margin = 1.05 * p.kernel.gamma * float(np.max(ic["h"]))
    interior = ((posf > margin) & (posf < 1.0 - margin)).all(axis=1)
    assert interior.sum() > 20
    # pre-limiter, kernel-normalised gradients are EXACT for linear fields
    # (the defining property of the matrix gradients); h is uniform here
    norm = 1.0 / float(ic["h"][0]) ** 3
    for comp, want in (("gP0", 0.5), ("gP1", 0.25), ("gP2", -0.125),
                       ("gvx0", 0.0), ("gvx1", 0.3), ("gvx2", 0.0)):
        got = flat(grad[comp])[interior] * norm
        np.testing.assert_allclose(got, want, atol=5e-3,
                                   err_msg=comp)
    # the full end_gradient (norm + cell limiter) may conservatively
    # shrink slopes but must stay in [0, slope] and keep direction
    s_g = {**s, **{k: jnp.asarray(v) for k, v in grad.items()}}
    eg = gizmo.end_gradient(s_g)
    gP0 = flat(eg["gP0"])[interior]
    assert (gP0 > 0.2).all() and (gP0 < 0.51).all(), (gP0.min(), gP0.max())
    # limiter values bracket the field
    rho_f = flat(s["rho"])[interior]
    lim_max = flat(grad["lim_rho_max"])[interior]
    lim_min = -flat(grad["lim_rho_nmin"])[interior]
    assert (lim_max >= lim_min).all()
    assert (lim_max > 0.5 * rho_f).all()


@pytest.mark.parametrize("params_cls", [GizmoMFMParams, GizmoMFVParams])
def test_gizmo_force_loop_matches_bruteforce(params_cls):
    ic = uniform_box_ic(n=6, jitter=0.15, seed=7)
    p = params_cls(h_max=0.4)
    grid = CellGrid(box=(1.0, 1.0, 1.0), cdim=(3, 3, 3), K=48)
    n = len(ic["pos"])
    rng = np.random.default_rng(1)
    v = np.asarray(0.1 * rng.standard_normal((n, 3)), np.float32)
    ic = {**ic, "v": v}
    dx3 = 1.0 / n
    extra = {
        "gvol": (dx3 * (1.0 + 0.2 * rng.random(n))).astype(np.float32),
        "geom_ok": np.ones(n, np.float32),
        "fv0": v[:, 0], "fv1": v[:, 1], "fv2": v[:, 2],
        "rho": np.asarray(1.0 + 0.1 * rng.random(n), np.float32),
        "pressure": np.asarray(0.5 + 0.1 * rng.random(n), np.float32),
        "soundspeed": np.asarray(0.9 + 0.1 * rng.random(n), np.float32),
        "f_gradh": np.ones(n, np.float32),
        "balsara": np.zeros(n, np.float32),
        "alpha_visc": np.zeros(n, np.float32),
        "alpha_diff": np.zeros(n, np.float32),
    }
    # plausible B matrices: near the isotropic-lattice value with noise
    for k in ("B00", "B11", "B22"):
        extra[k] = np.asarray(30.0 + 5.0 * rng.random(n), np.float32)
    for k in ("B01", "B02", "B12"):
        extra[k] = np.asarray(2.0 * rng.standard_normal(n), np.float32)
    for k in gizmo.GRAD_KEYS:
        extra[k] = np.asarray(0.1 * rng.standard_normal(n), np.float32)

    s = _bucketed_state(ic, p, grid, extra_fields=extra)
    got = stencil.force_loop(grid, s, p, COSMO)

    posf, flat, _, _ = _flatten(grid, s)
    ex = {k: jnp.asarray(flat(s[k])) for k in gizmo.FORCE_J_EXTRA}
    ref = bruteforce.force_bruteforce(
        p, jnp.asarray(posf),
        jnp.asarray(flat(s["h"])), jnp.asarray(flat(s["m"])),
        jnp.asarray(flat(s["v"])), jnp.asarray(flat(s["rho"])),
        jnp.asarray(flat(s["pressure"])),
        jnp.asarray(flat(s["soundspeed"])),
        jnp.asarray(flat(s["f_gradh"])), jnp.asarray(flat(s["balsara"])),
        jnp.asarray(flat(s["alpha_visc"])),
        jnp.asarray(flat(s["alpha_diff"])),
        jnp.asarray(flat(s["u"])),
        jnp.zeros(int(np.asarray(s["mask"]).sum()), jnp.float32),
        COSMO, box=(1.0, 1.0, 1.0), extra=ex)
    np.testing.assert_allclose(flat(got["a_hydro"]),
                               np.asarray(ref["a_hydro"]),
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(flat(got["u_dt"]), np.asarray(ref["u_dt"]),
                               rtol=2e-3, atol=2e-4)
    if "m_dt" in got:
        np.testing.assert_allclose(flat(got["m_dt"]),
                                   np.asarray(ref["m_dt"]),
                                   rtol=2e-3, atol=2e-5)


@pytest.mark.parametrize("params_cls,solver", [
    (GizmoMFMParams, "exact"), (GizmoMFMParams, "trrs"),
    (GizmoMFVParams, "hllc")])
def test_gizmo_engine_conserves(params_cls, solver):
    """Perturbed uniform box: total (kinetic + thermal) energy, momentum
    and — for MFV — mass stay put over steps."""
    ic = uniform_box_ic(n=6, jitter=0.1, seed=11)
    p = params_cls(h_max=0.4, riemann_solver=solver)
    grid = CellGrid(box=(1.0, 1.0, 1.0), cdim=(3, 3, 3), K=48)
    eng = Engine(grid, p, EngineConfig(dt_max=5e-4), 0.0, 1.0)
    eng.load_particles(ic["pos"], ic["m"], ic["v"], ic["u"], ic["h"])
    eng.init_particles()

    def totals():
        s = eng.state
        mask = np.asarray(s["mask"]) > 0
        m = np.asarray(s["m"])[mask]
        v = np.asarray(s["v_full"])[mask]
        u = np.asarray(s["u_full"])[mask]
        return (float(m.sum()),
                float((0.5 * m * (v ** 2).sum(-1) + m * u).sum()),
                (m[:, None] * v).sum(0))

    m0, e0, p0 = totals()
    for _ in range(6):
        eng.step()
    m1, e1, p1 = totals()
    assert abs(e1 - e0) / abs(e0) < 2e-4, (e0, e1)
    assert abs(m1 - m0) / m0 < 1e-5, (m0, m1)
    assert np.abs(p1 - p0).max() < 1e-5 * m0, (p0, p1)


def test_gizmo_mfm_pressure_wave_reacts():
    """A central overpressure drives outflow — the flux actually moves
    momentum (guards against a silently-zero face construction)."""
    ic = uniform_box_ic(n=6, jitter=0.05, seed=4)
    pos = ic["pos"]
    r2 = ((pos - 0.5) ** 2).sum(-1)
    u = np.where(r2 < 0.04, 4.0, 1.0).astype(np.float32)
    p = GizmoMFMParams(h_max=0.4)
    grid = CellGrid(box=(1.0, 1.0, 1.0), cdim=(3, 3, 3), K=48)
    eng = Engine(grid, p, EngineConfig(dt_max=5e-4), 0.0, 1.0)
    eng.load_particles(pos, ic["m"], ic["v"], u, ic["h"])
    eng.init_particles()
    for _ in range(5):
        eng.step()
    s = eng.state
    mask = np.asarray(s["mask"]) > 0
    v = np.asarray(s["v_full"])[mask]
    gp = global_positions(grid, np.asarray(s["off"]))
    gp = gp.reshape(-1, 3)[mask.reshape(-1)]
    rad = gp - 0.5
    rn = np.linalg.norm(rad, axis=1)
    shell = (rn > 0.15) & (rn < 0.35)
    vr = (v[shell] * rad[shell]).sum(-1) / rn[shell]
    assert vr.mean() > 1e-4, vr.mean()
