"""Shadowswift 1D moving-mesh scheme (src/hydro/Shadowswift,
voronoi1d_algorithm.h): exact tessellation, Sod shock against the exact
Riemann solution, exact conservation, and the moving-mesh headline
property — Galilean invariance of a uniformly boosted flow."""

import numpy as np
import jax.numpy as jnp

from swift_subtask_dev_tpu.models.moving_mesh import (
    ShadowswiftParams, mm_init, mm_run, mm_step, mm_timestep, voronoi1d)
from swift_subtask_dev_tpu.validation import sod_solution


def test_voronoi1d_exact_partition():
    rng = np.random.default_rng(3)
    x = jnp.asarray(np.sort(rng.uniform(0, 1, 64)), jnp.float32)
    order, volume, centroid, xs = voronoi1d(x, 1.0)
    # cell volumes tile the box exactly
    np.testing.assert_allclose(float(volume.sum()), 1.0, rtol=1e-5)
    # every centroid lies inside its cell
    gap_r = np.mod(np.roll(xs, -1) - xs, 1.0)
    gap_l = np.roll(gap_r, 1)
    c = np.asarray(centroid)
    assert (c >= np.asarray(xs) - gap_l / 2 - 1e-6).all()
    assert (c <= np.asarray(xs) + gap_r / 2 + 1e-6).all()


def test_sod_shock_matches_exact():
    p = ShadowswiftParams(gamma=1.4, box=2.0, CFL=0.2)
    N = 400
    x = (np.arange(N) + 0.5) * 2.0 / N
    left = x < 1.0
    rho0 = np.where(left, 1.0, 0.125)
    P0 = np.where(left, 1.0, 0.1)
    x, Q = mm_init(p, x, rho0, np.zeros(N), P0)
    m0, p0, E0 = (float(Q[k].sum()) for k in ("m", "p", "E"))

    x, Q = mm_run(p, x, Q, t_end=0.2)

    order, volume, centroid, xs = voronoi1d(x, p.box)
    from swift_subtask_dev_tpu.models.moving_mesh import primitives
    rho, v, P = primitives(p, {k: Q[k][order] for k in Q}, volume)
    xs = np.asarray(xs)
    rho = np.asarray(rho)

    rho_ex, v_ex, P_ex = sod_solution(xs, 0.2, gamma=1.4, x0=1.0)
    # keep clear of the periodic seam (its own waves reach ~0.25 in)
    sel = (xs > 0.4) & (xs < 1.6)
    l1 = np.abs(rho[sel] - rho_ex[sel]).mean()
    assert l1 < 0.02, f"L1(rho)={l1}"
    # exact conservation (finite-volume pairwise fluxes)
    np.testing.assert_allclose(float(Q["m"].sum()), m0, rtol=1e-5)
    np.testing.assert_allclose(float(Q["E"].sum()), E0, rtol=1e-4)


def test_galilean_invariance_uniform_boost():
    """A uniform flow stays exactly uniform at ANY boost speed — the
    property Eulerian schemes lose and the moving mesh keeps."""
    p = ShadowswiftParams(gamma=5.0 / 3.0, box=1.0, CFL=0.3)
    N = 128
    rng = np.random.default_rng(11)
    x = np.sort(rng.uniform(0, 1, N))
    x, Q = mm_init(p, x, np.ones(N), np.full(N, 100.0), np.ones(N))
    for _ in range(10):
        dt = float(mm_timestep(p, x, Q))
        x, Q = mm_step(p, x, Q, jnp.float32(dt))
    order, volume, _, _ = voronoi1d(x, p.box)
    from swift_subtask_dev_tpu.models.moving_mesh import primitives
    rho, v, P = primitives(p, {k: Q[k][order] for k in Q}, volume)
    assert float(jnp.abs(rho - 1.0).max()) < 1e-3
    assert float(jnp.abs(v - 100.0).max()) < 1e-3
    assert float(jnp.abs(P - 1.0).max()) < 1e-2
