"""2D Shadowswift moving mesh: exact Voronoi + finite-volume fluxes.

Validation mirrors the reference's voronoi2d tests (testVoronoi2D.c):
lattice cells must be exact squares, random tessellations must tile the
box (areas sum + Monte-Carlo per-cell oracle), and the FV update must
conserve and reproduce the exact Riemann solution on a Sod tube.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from swift_subtask_dev_tpu.models.moving_mesh import (
    ShadowswiftParams, mm2d_init, mm2d_run, mm2d_step, voronoi2d)


def test_voronoi2d_lattice_exact():
    n = 8
    g = (np.arange(n) + 0.5) / n
    pos = np.stack(np.meshgrid(g, g, indexing="ij"), -1).reshape(-1, 2)
    vor = voronoi2d(jnp.asarray(pos, jnp.float32), 1.0, M=12)
    np.testing.assert_allclose(np.asarray(vor["volume"]),
                               1.0 / n ** 2, rtol=1e-4)
    assert bool(np.asarray(vor["complete"]).all())
    # each cell: exactly 4 faces of length 1/n
    fl = np.asarray(vor["face_len"])
    n_faces = (fl > 1e-6).sum(axis=1)
    np.testing.assert_array_equal(n_faces, 4)
    np.testing.assert_allclose(fl[fl > 1e-6], 1.0 / n, rtol=1e-4)
    # centroids = generators (centroidal tessellation)
    d = np.asarray(vor["centroid"]) - pos
    d -= np.round(d)
    assert np.abs(d).max() < 1e-5


def test_voronoi2d_random_tiles_box():
    rng = np.random.default_rng(5)
    N = 256
    pos = rng.uniform(0, 1, (N, 2)).astype(np.float32)
    vor = voronoi2d(jnp.asarray(pos), 1.0, M=32)
    assert bool(np.asarray(vor["complete"]).all())
    vols = np.asarray(vor["volume"])
    assert (vols > 0).all()
    np.testing.assert_allclose(vols.sum(), 1.0, rtol=1e-4)

    # Monte-Carlo oracle: nearest-generator area fractions
    samp = rng.uniform(0, 1, (200_000, 2)).astype(np.float32)
    d = samp[:, None, :] - pos[None, :, :]
    d -= np.round(d)
    owner = np.argmin((d ** 2).sum(-1), axis=1)
    mc = np.bincount(owner, minlength=N) / len(samp)
    # binomial noise ~ sqrt(p/n) ~ 1.4e-4; compare loosely
    assert np.abs(mc - vols).max() < 8e-4


def test_mm2d_conserves_and_stays_uniform():
    rng = np.random.default_rng(7)
    n = 10
    g = (np.arange(n) + 0.5) / n
    pos = np.stack(np.meshgrid(g, g, indexing="ij"), -1).reshape(-1, 2)
    pos = (pos + rng.uniform(-0.01, 0.01, pos.shape)) % 1.0
    p = ShadowswiftParams(box=1.0, CFL=0.2)
    N = len(pos)
    pos, Q = mm2d_init(p, pos, np.ones(N), np.zeros((N, 2)),
                       np.ones(N), M=16)
    m0, E0 = float(Q["m"].sum()), float(Q["E"].sum())
    p0 = np.asarray(Q["p"]).sum(0)
    pos, Q = mm2d_run(p, pos, Q, t_end=0.02, M=16)
    assert abs(float(Q["m"].sum()) - m0) < 1e-4 * m0
    assert abs(float(Q["E"].sum()) - E0) < 1e-4 * E0
    assert np.abs(np.asarray(Q["p"]).sum(0) - p0).max() < 1e-4 * E0
    # uniform state stays uniform (no spurious flux)
    vor = voronoi2d(pos, 1.0, M=16)
    rho = np.asarray(Q["m"] / vor["volume"])
    assert np.abs(rho - 1.0).max() < 5e-3


def test_mm2d_sod_matches_exact():
    """y-invariant Sod tube through the 2D mesh vs the exact solution."""
    from swift_subtask_dev_tpu.validation import riemann_exact

    # square cells: candidate sets must bound the cell in BOTH axes
    # (an 8:1 lattice puts all M nearest along x and the tessellation
    # is unbounded in y — caught by the `complete` certificate below)
    nx = ny = 48
    gx = (np.arange(nx) + 0.5) / nx
    gy = (np.arange(ny) + 0.5) / ny
    pos = np.stack(np.meshgrid(gx, gy, indexing="ij"), -1).reshape(-1, 2)
    rng = np.random.default_rng(3)
    pos[:, 1] = (pos[:, 1] + rng.uniform(-0.005, 0.005, len(pos))) % 1.0
    left = pos[:, 0] < 0.5
    rho = np.where(left, 1.0, 0.125)
    P = np.where(left, 1.0, 0.1)
    p = ShadowswiftParams(box=1.0, gamma=1.4, CFL=0.2)
    N = len(pos)
    assert bool(np.asarray(
        voronoi2d(jnp.asarray(pos, jnp.float32), 1.0,
                  M=16)["complete"]).all())
    pos, Q = mm2d_init(p, pos, rho, np.zeros((N, 2)), P, M=16)
    t_end = 0.1
    pos, Q = mm2d_run(p, pos, Q, t_end=t_end, M=16)

    vor = voronoi2d(pos, 1.0, M=16)
    rho_f = np.asarray(Q["m"] / vor["volume"])
    x = np.asarray(pos[:, 0])
    rho_ex = np.asarray(riemann_exact(
        1.0, 0.0, 1.0, 0.125, 0.0, 0.1, 1.4, x, t_end, x0=0.5)[0])
    # keep clear of the periodic seam at x=0/1 (its own Riemann waves
    # reach ~0.17 in by t=0.1) — same windowing as the 1D Sod gate
    sel = (x > 0.25) & (x < 0.78)
    l1 = np.mean(np.abs(rho_f[sel] - rho_ex[sel]))
    # first-order Godunov at 48 cells across the tube: measured ~0.038
    # (the 1D test reaches 0.02 at 400 cells — same convergence order)
    assert l1 < 0.05, l1
    # the shock plateau must exist: max density between the exact
    # post-shock value and the left state
    assert 0.2 < rho_f[sel].max() < 1.05
