"""3D Shadowswift moving mesh: exact Voronoi + finite-volume fluxes.

Validation mirrors the reference's testVoronoi3D.c: lattice cells must
be exact cubes, random tessellations must tile the box (volumes sum +
Monte-Carlo per-cell oracle), and the FV update must conserve and
reproduce the exact Riemann solution on a 3D Sod tube
(src/hydro/Shadowswift/voronoi3d_algorithm.h)."""

import numpy as np
import jax.numpy as jnp
import pytest

from swift_subtask_dev_tpu.models.moving_mesh import (
    ShadowswiftParams, mm3d_init, mm3d_run, mm3d_step, voronoi3d)


def _lattice(n):
    g = (np.arange(n) + 0.5) / n
    return np.stack(np.meshgrid(g, g, g, indexing="ij"),
                    -1).reshape(-1, 3)


def test_voronoi3d_lattice_exact():
    """Exact cubes on the maximally-degenerate cubic lattice (every
    corner vertex is 8-cospherical).  M=16 keeps the candidate set
    inside the shells whose degenerate ties resolve exactly; the
    completeness certificate legitimately cannot certify this M (it
    needs rj_max >= 2 r_far = sqrt(3)/n) — certification is covered on
    the jittered lattice below, where the degeneracy is broken."""
    n = 5
    pos = _lattice(n)
    vor = voronoi3d(jnp.asarray(pos, jnp.float32), 1.0, M=16)
    np.testing.assert_allclose(np.asarray(vor["volume"]),
                               1.0 / n ** 3, rtol=1e-3)
    # each cell: exactly 6 faces of area (1/n)^2
    fa = np.asarray(vor["face_area"])
    n_faces = (fa > 1e-8).sum(axis=1)
    np.testing.assert_array_equal(n_faces, 6)
    np.testing.assert_allclose(fa[fa > 1e-8], 1.0 / n ** 2, rtol=1e-3)
    # centroids = generators (centroidal tessellation)
    d = np.asarray(vor["centroid"]) - pos
    d -= np.round(d)
    assert np.abs(d).max() < 1e-4


def test_voronoi3d_jittered_lattice_certified():
    """Jitter breaks the cospherical ties: volumes tile the box AND
    every cell certifies complete at M=32."""
    n = 5
    rng = np.random.default_rng(11)
    pos = (_lattice(n) + rng.uniform(-0.02, 0.02, (n ** 3, 3))) % 1.0
    vor = voronoi3d(jnp.asarray(pos, jnp.float32), 1.0, M=32)
    assert bool(np.asarray(vor["complete"]).all())
    vols = np.asarray(vor["volume"])
    np.testing.assert_allclose(vols.sum(), 1.0, rtol=2e-3)
    assert vols.min() > 0.5 / n ** 3


def test_voronoi3d_irregular_tiles_box():
    """Strongly jittered lattice (20% of the spacing — the moving-mesh
    operating regime: centroid steering keeps generators glass-like,
    never Poisson): volumes tile the box, every cell certifies, and a
    Monte-Carlo nearest-generator oracle matches per-cell volumes.
    (Fully Poisson-random points have cell aspect ratios needing M ~
    O(100) candidates to certify in 3D — out of scope by design.)"""
    rng = np.random.default_rng(5)
    n = 6
    g = (np.arange(n) + 0.5) / n
    pos = np.stack(np.meshgrid(g, g, g, indexing="ij"),
                   -1).reshape(-1, 3)
    N = len(pos)
    pos = ((pos + rng.uniform(-0.03, 0.03, (N, 3))) % 1.0) \
        .astype(np.float32)
    vor = voronoi3d(jnp.asarray(pos), 1.0, M=32)
    assert bool(np.asarray(vor["complete"]).all())
    vols = np.asarray(vor["volume"])
    assert (vols > 0).all()
    np.testing.assert_allclose(vols.sum(), 1.0, rtol=2e-3)

    # Monte-Carlo oracle: nearest-generator volume fractions
    samp = rng.uniform(0, 1, (200_000, 3)).astype(np.float32)
    d = samp[:, None, :] - pos[None, :, :]
    d -= np.round(d)
    owner = np.argmin((d ** 2).sum(-1), axis=1)
    mc = np.bincount(owner, minlength=N) / len(samp)
    assert np.abs(mc - vols).max() < 1.5e-3


def test_mm3d_conserves_and_stays_uniform():
    """Uniform lattice: total m/p/E exactly conserved, state static."""
    pos = _lattice(5)
    N = len(pos)
    p = ShadowswiftParams(box=1.0, gamma=5.0 / 3.0, CFL=0.2)
    rho = np.ones(N)
    P = np.ones(N)
    pos_j, Q = mm3d_init(p, pos, rho, np.zeros((N, 3)), P, M=16)
    m0 = float(jnp.sum(Q["m"]))
    E0 = float(jnp.sum(Q["E"]))
    pos2, Q2 = pos_j, Q
    for _ in range(5):
        pos2, Q2 = mm3d_step(p, pos2, Q2, jnp.float32(1e-3), M=16)
    np.testing.assert_allclose(float(jnp.sum(Q2["m"])), m0, rtol=1e-6)
    np.testing.assert_allclose(float(jnp.sum(Q2["E"])), E0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(Q2["p"]).sum(0), 0.0, atol=1e-5)
    # uniform state is a fixed point
    np.testing.assert_allclose(np.asarray(Q2["m"]), np.asarray(Q["m"]),
                               rtol=1e-4)


@pytest.mark.slow
def test_mm3d_sod_matches_exact():
    """x-aligned Sod tube through the 3D moving mesh vs the exact
    Riemann solution (the HydroTests/SodShock_3D acceptance, on the
    moving-mesh scheme)."""
    from swift_subtask_dev_tpu.validation import riemann_exact

    # non-cubic box (1, 1/4, 1/4): cells stay CUBIC (1/32 each way) so
    # the fixed-M candidate sets bound and certify every cell — the
    # anisotropy lives in the box, not the cells
    box = (1.0, 0.25, 0.25)
    nx, ny, nz = 32, 8, 8
    gx = (np.arange(nx) + 0.5) / nx
    gy = (np.arange(ny) + 0.5) / ny * box[1]
    gz = (np.arange(nz) + 0.5) / nz * box[2]
    pos = np.stack(np.meshgrid(gx, gy, gz, indexing="ij"),
                   -1).reshape(-1, 3)
    rng = np.random.default_rng(3)
    for ax in (0, 1, 2):   # break every cospherical lattice degeneracy
        pos[:, ax] = (pos[:, ax] + rng.uniform(
            -0.003, 0.003, len(pos))) % box[ax]
    left = pos[:, 0] < 0.5
    rho = np.where(left, 1.0, 0.125)
    P = np.where(left, 1.0, 0.1)
    p = ShadowswiftParams(box=box, gamma=1.4, CFL=0.2)
    N = len(pos)
    assert bool(np.asarray(
        voronoi3d(jnp.asarray(pos, jnp.float32), box,
                  M=32)["complete"]).all())
    pos_j, Q = mm3d_init(p, pos, rho, np.zeros((N, 3)), P, M=32)
    t_end = 0.08
    pos_j, Q = mm3d_run(p, pos_j, Q, t_end=t_end, M=32)

    vor = voronoi3d(pos_j, box, M=32)
    rho_f = np.asarray(Q["m"] / jnp.maximum(vor["volume"], 1e-30))
    x = np.asarray(pos_j[:, 0])
    rho_ex = np.asarray(riemann_exact(
        1.0, 0.0, 1.0, 0.125, 0.0, 0.1, 1.4, x, t_end, x0=0.5)[0])
    sel = (x > 0.28) & (x < 0.75)
    l1 = np.mean(np.abs(rho_f[sel] - rho_ex[sel]))
    # first-order Godunov at 32 cells across the tube
    assert l1 < 0.08, l1
    assert 0.2 < rho_f[sel].max() < 1.05


def test_shadowswift_cli_end_to_end(tmp_path):
    """SPH:scheme: shadowswift runs the 3D moving-mesh driver from the
    CLI like any other scheme (scheme selection parity with the
    reference's --with-hydro=shadowswift configure flag)."""
    import subprocess
    import sys

    from swift_subtask_dev_tpu.io.snapshot import (PTYPE_GAS,
                                                   write_snapshot)

    n = 6
    pos = _lattice(n)
    rng = np.random.default_rng(2)
    pos = (pos + rng.uniform(-0.02, 0.02, pos.shape)) % 1.0
    N = len(pos)
    parts = {PTYPE_GAS: {
        "Coordinates": pos.astype(np.float32),
        "Velocities": np.zeros((N, 3), np.float32),
        "Masses": np.full(N, 1.0 / N, np.float32),
        "InternalEnergies": np.full(N, 1.0, np.float32),
        "SmoothingLengths": np.full(N, 1.0 / n, np.float32),
        "ParticleIDs": np.arange(N)}}
    icf = tmp_path / "ic.hdf5"
    write_snapshot(str(icf), (1.0, 1.0, 1.0), 0.0, parts)
    param = tmp_path / "p.yml"
    param.write_text(f"""
TimeIntegration:
  time_begin: 0.0
  time_end: 1e-3
  dt_max: 5e-4
InitialConditions:
  file_name: {icf}
SPH:
  scheme: shadowswift
  shadowswift_candidates: 24
  CFL_condition: 0.2
Snapshots:
  basename: {tmp_path / 'snap'}
  delta_time: 5e-4
""")
    r = subprocess.run(
        [sys.executable, "-m", "swift_subtask_dev_tpu.cli", str(param),
         "--hydro", "--cpu", "-n", "3"],
        capture_output=True, text=True, timeout=1200)
    assert r.returncode == 0, r.stderr + r.stdout
    assert (tmp_path / "snap_0000.hdf5").exists()
    import h5py
    with h5py.File(tmp_path / "snap_0000.hdf5") as f:
        vols = f["PartType0/Volumes"][:]
    np.testing.assert_allclose(vols.sum(), 1.0, rtol=5e-3)
