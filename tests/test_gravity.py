"""Gravity tests — the port of the reference's testFFT + testPotentialPair.

1. PM mesh alone: point-mass long-range potential must match the analytic
   smoothed profile -G m erf(r / 2 r_s) / r  (the Gadget split).
2. Split invariance: total P3M force must not depend on the mesh size /
   r_s choice (the defining property of the Ewald-type split).
3. Newtonian limit: a close pair far from boundaries feels -G m / r^2.
4. Momentum: forces sum to ~0.
"""

import numpy as np
import jax.numpy as jnp
from scipy.special import erf

from swift_subtask_dev_tpu.grid import CellGrid, bucket_fields
from swift_subtask_dev_tpu.ops.pm_gravity import (
    PMMeshParams, cic_deposit, cic_gather, long_range_potential,
    pm_accelerations)
from swift_subtask_dev_tpu.ops.p2p_gravity import p2p_accelerations

G = 1.0


def test_pm_single_mode_exact():
    """A single Fourier mode solves exactly: the rigorous solver check.

    For rho(x) = A cos(k x) (deposited directly on the mesh, no CIC), the
    smoothed Poisson solution is
    phi = -4 pi G A cos(k x) exp(-k^2 r_s^2) / k^2.
    The only deviation is the (known) CIC deconvolution we intentionally
    apply; for a mode on the grid that factor is sinc^-4(pi/N), ~1 + tiny.
    """
    N = 32
    L = 2.0
    pm = PMMeshParams(N=N, box=(L, L, L))
    x = (np.arange(N) + 0.0) * L / N
    k = 2 * np.pi / L  # fundamental mode
    A = 0.7
    # mass-per-cell grid for density A cos(kx): M = rho * cell_volume
    rho = A * np.cos(k * x)[:, None, None] * np.ones((1, N, N))
    M = rho * (L / N) ** 3
    phi = np.asarray(long_range_potential(pm, jnp.asarray(M, jnp.float32), G))
    expect = -4 * np.pi * G * A * np.cos(k * x) * np.exp(
        -k ** 2 * pm.r_s ** 2) / k ** 2
    # CIC deconvolution factor for this mode (we did not CIC-deposit)
    cic4 = (np.pi / N / np.sin(np.pi / N)) ** 4
    got = phi[:, 0, 0]
    np.testing.assert_allclose(got, expect * cic4, rtol=1e-4, atol=1e-6)


def test_cic_roundtrip():
    """CIC deposit conserves mass; gather of a linear field is exact."""
    pm = PMMeshParams(N=32, box=(1.0, 1.0, 1.0))
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.uniform(0, 1, (200, 3)), jnp.float32)
    m = jnp.asarray(rng.uniform(0.5, 2, 200), jnp.float32)
    grid = cic_deposit(pm, pos, m)
    assert np.isclose(float(grid.sum()), float(m.sum()), rtol=1e-5)
    # gather of a constant field returns the constant
    const = jnp.ones((32, 32, 32), jnp.float32) * 3.25
    vals = np.asarray(cic_gather(pm, const, pos))
    np.testing.assert_allclose(vals, 3.25, rtol=1e-6)


def test_p3m_split_invariance_and_newton():
    """Total (PM + P2P) force independent of r_s; Newtonian at small r."""
    rng = np.random.default_rng(5)
    n = 64
    pos = rng.uniform(0.3, 0.7, (n, 3)).astype(np.float32)  # clustered
    m = rng.uniform(0.5, 1.5, n).astype(np.float32)

    def total_accel(N_mesh):
        pm = PMMeshParams(N=N_mesh, box=(1.0, 1.0, 1.0))
        grid = CellGrid(box=(1.0, 1.0, 1.0), cdim=(3, 3, 3), K=n)
        assert min(grid.edge) >= pm.r_cut, "stencil must cover r_cut"
        f, mask, off, nov = bucket_fields(
            grid, jnp.asarray(pos), {"m": jnp.asarray(m)})
        assert int(nov) == 0
        sp = {"mask": mask, "off": off, "m": f["m"]}
        acc_pm, _ = pm_accelerations(pm, jnp.asarray(pos), jnp.asarray(m), G)
        [(acc_pp, pot)] = p2p_accelerations(
            grid, [sp], G, H_soft=1e-4, r_s=pm.r_s)
        # map the tiled P2P result back to particle order via masses? use
        # bucketing of particle index instead
        f2, mask2, _, _ = bucket_fields(
            grid, jnp.asarray(pos),
            {"idx": jnp.arange(n, dtype=jnp.int32)})
        valid = np.asarray(mask2).reshape(-1) > 0
        idx = np.asarray(f2["idx"]).reshape(-1)[valid]
        app = np.asarray(acc_pp).reshape(-1, 3)[valid]
        out = np.zeros((n, 3), np.float32)
        out[idx] = app
        return out + np.asarray(acc_pm)

    a32 = total_accel(32)
    a64 = total_accel(64)
    scale = np.abs(a64).max()
    err = np.abs(a32 - a64).max() / scale
    assert err < 0.02, f"split not invariant: {err:.3f}"

    # Newtonian pair check: two isolated particles
    pos2 = np.array([[0.45, 0.5, 0.5], [0.55, 0.5, 0.5]], np.float32)
    m2 = np.array([1.0, 1.0], np.float32)
    pm = PMMeshParams(N=64, box=(1.0, 1.0, 1.0))
    grid = CellGrid(box=(1.0, 1.0, 1.0), cdim=(3, 3, 3), K=8)
    f, mask, off, _ = bucket_fields(grid, jnp.asarray(pos2),
                                    {"m": jnp.asarray(m2),
                                     "idx": jnp.arange(2, dtype=jnp.int32)})
    sp = {"mask": mask, "off": off, "m": f["m"]}
    acc_pm, _ = pm_accelerations(pm, jnp.asarray(pos2), jnp.asarray(m2), G)
    [(acc_pp, _)] = p2p_accelerations(grid, [sp], G, H_soft=1e-4, r_s=pm.r_s)
    valid = np.asarray(mask).reshape(-1) > 0
    idx = np.asarray(f["idx"]).reshape(-1)[valid]
    app = np.asarray(acc_pp).reshape(-1, 3)[valid]
    tot = np.zeros((2, 3));  tot[idx] = app
    tot += np.asarray(acc_pm)
    # expected |a| = G m / r^2 = 1 / 0.01 = 100 along x (periodic images
    # contribute < 1%)
    assert np.isclose(tot[0, 0], 100.0, rtol=0.02), tot[0]
    assert np.isclose(tot[1, 0], -100.0, rtol=0.02), tot[1]
    # momentum conservation
    assert np.abs(tot.sum(0)).max() < 0.5


def test_softening_spline():
    """Softened force matches Newtonian outside H, stays finite inside."""
    from swift_subtask_dev_tpu.ops.p2p_gravity import softened_force_factor
    H = 0.1
    r = np.linspace(1e-4, 0.3, 100).astype(np.float32)
    F = np.asarray(softened_force_factor(jnp.asarray(r ** 2), H))
    newton = 1.0 / r ** 3
    out = r > H
    np.testing.assert_allclose(F[out], newton[out], rtol=1e-5)
    # inside: finite and approaching W(0)/H^3 = 14/H^3 hmm -> at r=0 F=14/H^3
    assert np.isfinite(F).all()
    assert F[0] < 15 / H ** 3
    # continuous at r = H
    iH = np.argmin(np.abs(r - H))
    assert abs(F[iH] - 1 / r[iH] ** 3) / (1 / r[iH] ** 3) < 0.05


def test_p2p_multi_softening_pairwise_max():
    """Per-species softenings: a pair interacts with max(H_i, H_j) —
    the reference's multi-softening rule (gravity_iact.h; Gravity:
    comoving_DM_softening vs comoving_baryon_softening)."""
    import numpy as np
    from swift_subtask_dev_tpu.grid.cellgrid import bucket_fields
    from swift_subtask_dev_tpu.ops.p2p_gravity import (
        p2p_accelerations, softened_force_factor)

    rng = np.random.default_rng(8)
    # central blob: every pair's stencil image IS the direct separation
    # (the untruncated all-pairs oracle can't span wrap-around images)
    grid = CellGrid(box=(1.0, 1.0, 1.0), cdim=(4, 4, 4), K=32)
    nA, nB = 40, 30
    posA = 0.3 + 0.4 * rng.uniform(0, 1, (nA, 3))
    posB = 0.3 + 0.4 * rng.uniform(0, 1, (nB, 3))
    mA = rng.uniform(0.5, 1.5, nA).astype(np.float32)
    mB = rng.uniform(0.5, 1.5, nB).astype(np.float32)

    def bucket(pos, m):
        out, mask, off, nov = bucket_fields(
            grid, jnp.asarray(pos), {"m": jnp.asarray(m)})
        assert int(nov) == 0
        return {"mask": mask, "off": off, **out}

    sA, sB = bucket(posA, mA), bucket(posB, mB)
    H_A, H_B = 0.06, 0.15   # baryon vs DM kernel sizes (= 3*eps)
    outs = p2p_accelerations(grid, [sA, sB], G=1.0, H_soft=[H_A, H_B],
                             r_s=0.0, periodic_truncation=False)

    # brute-force oracle with pairwise-max softening (all pairs are
    # within the 27-stencil on a 3^3 grid)
    from swift_subtask_dev_tpu.grid import global_positions
    box = np.asarray(grid.box)

    def brute(pos_i, pos_all, m_all, H_pair):
        acc = np.zeros((len(pos_i), 3))
        for k, (pos_j, m_j, Hp) in enumerate(zip(pos_all, m_all, H_pair)):
            d = pos_i[:, None, :] - pos_j[None, :, :]
            d -= box * np.round(d / box)
            r2 = (d ** 2).sum(-1)
            F = np.array(softened_force_factor(
                jnp.asarray(r2, jnp.float32), jnp.float32(Hp)))
            F[r2 == 0] = 0.0
            acc -= ((F * m_j[None, :])[:, :, None] * d).sum(axis=1)
        return acc

    for s, pos_i, H_i in ((sA, posA, H_A), (sB, posB, H_B)):
        mask = np.asarray(s["mask"]) > 0
        got_pos = global_positions(grid, np.asarray(s["off"]))[mask]
        got_acc = np.asarray(outs[0 if s is sA else 1][0])[mask]
        exp = brute(got_pos, [posA, posB], [mA, mB],
                    [max(H_i, H_A), max(H_i, H_B)])
        np.testing.assert_allclose(got_acc, exp, rtol=2e-3, atol=2e-3)
