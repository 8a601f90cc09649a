"""Riemann solvers (exact / HLLC / TRRS) vs the independent oracle —
the analog of the reference's testRiemannExact/HLLC/TRRS."""

import numpy as np
import jax.numpy as jnp
import pytest

from swift_subtask_dev_tpu.models import riemann
from swift_subtask_dev_tpu import validation

GAMMA = 5.0 / 3.0


def _flux_from_primitives(rho, v, P, n, gamma=GAMMA):
    """Conserved flux through a surface with normal n (lab frame, static
    interface) from the sampled half-state primitives."""
    vn = v @ n
    e = P / ((gamma - 1.0) * rho) + 0.5 * v @ v if rho > 0 else 0.0
    return np.array([
        rho * vn,
        rho * vn * v[0] + P * n[0],
        rho * vn * v[1] + P * n[1],
        rho * vn * v[2] + P * n[2],
        rho * vn * e + P * vn,
    ])


CASES = [
    # (rhoL, vL, PL, rhoR, vR, PR) along x — Toro's test battery
    (1.0, 0.0, 1.0, 0.125, 0.0, 0.1),        # Sod
    (1.0, -2.0, 0.4, 1.0, 2.0, 0.4),         # 123 (double rarefaction)
    (1.0, 0.0, 1000.0, 1.0, 0.0, 0.01),      # blast L
    (1.0, 0.0, 0.01, 1.0, 0.0, 100.0),       # blast R
    (5.99924, 19.5975, 460.894, 5.99242, -6.19633, 46.0950),  # collision
    (0.7, 0.2, 0.3, 0.9, -0.1, 0.8),
]


@pytest.mark.parametrize("case", CASES)
def test_exact_flux_matches_oracle(case):
    rhoL, vL, PL, rhoR, vR, PR = case
    # oracle: sample the exact solution at x/t = 0 and form the flux
    rho, v, P = validation.riemann_exact(
        rhoL, vL, PL, rhoR, vR, PR, GAMMA,
        np.array([0.0]), 1.0, x0=0.0)
    n = np.array([1.0, 0.0, 0.0])
    ref = _flux_from_primitives(float(rho[0]),
                                np.array([float(v[0]), 0.0, 0.0]),
                                float(P[0]), n)

    WL = tuple(jnp.float32(x) for x in (rhoL, vL, 0.0, 0.0, PL))
    WR = tuple(jnp.float32(x) for x in (rhoR, vR, 0.0, 0.0, PR))
    nj = tuple(jnp.float32(x) for x in n)
    vij = (jnp.float32(0.0),) * 3
    got = np.array([float(f) for f in
                    riemann.exact_flux(WL, WR, nj, vij, GAMMA)])
    scale = max(np.abs(ref).max(), 1e-3)
    np.testing.assert_allclose(got, ref, atol=2e-3 * scale, rtol=2e-3)


@pytest.mark.parametrize("solver", ["exact", "hllc", "trrs"])
def test_equal_states_give_advection_flux(solver):
    """WL == WR: every solver must return the trivial flux."""
    W = tuple(jnp.float32(x) for x in (0.8, 0.3, -0.2, 0.1, 1.7))
    n = tuple(jnp.float32(x) for x in
              (np.array([0.6, 0.64, 0.48]) / 1.0))
    vij = (jnp.float32(0.0),) * 3
    got = np.array([float(f) for f in
                    riemann.SOLVERS[solver](W, W, n, vij, GAMMA)])
    ref = _flux_from_primitives(0.8, np.array([0.3, -0.2, 0.1]), 1.7,
                                np.array([0.6, 0.64, 0.48]))
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=1e-4)


@pytest.mark.parametrize("solver", ["exact", "hllc", "trrs"])
def test_antisymmetry(solver):
    """F(WR, WL, -n) == -F(WL, WR, n): what makes the FV scheme
    conservative (testRiemannExact.c symmetry checks)."""
    rng = np.random.default_rng(3)
    for _ in range(5):
        WLv = [rng.uniform(0.2, 2), *rng.uniform(-1, 1, 3),
               rng.uniform(0.2, 2)]
        WRv = [rng.uniform(0.2, 2), *rng.uniform(-1, 1, 3),
               rng.uniform(0.2, 2)]
        nv = rng.normal(size=3)
        nv /= np.linalg.norm(nv)
        WL = tuple(jnp.float32(x) for x in WLv)
        WR = tuple(jnp.float32(x) for x in WRv)
        n = tuple(jnp.float32(x) for x in nv)
        mn = tuple(jnp.float32(-x) for x in nv)
        vij = (jnp.float32(0.0),) * 3
        a = np.array([float(f) for f in
                      riemann.SOLVERS[solver](WL, WR, n, vij, GAMMA)])
        b = np.array([float(f) for f in
                      riemann.SOLVERS[solver](WR, WL, mn, vij, GAMMA)])
        scale = max(np.abs(a).max(), 1e-3)
        np.testing.assert_allclose(a, -b, atol=5e-4 * scale, rtol=2e-3)


@pytest.mark.parametrize("solver", ["hllc", "trrs"])
def test_approximate_converges_to_exact_on_weak_jumps(solver):
    """All approximate solvers agree with the exact one in the weak-jump
    limit (strong rarefaction fans are where HLLC legitimately smears)."""
    WL = tuple(jnp.float32(x) for x in (1.0, 0.05, 0.0, 0.0, 1.0))
    WR = tuple(jnp.float32(x) for x in (0.98, 0.03, 0.01, 0.0, 0.97))
    n = (jnp.float32(1.0), jnp.float32(0.0), jnp.float32(0.0))
    vij = (jnp.float32(0.0),) * 3
    ex = np.array([float(f) for f in
                   riemann.exact_flux(WL, WR, n, vij, GAMMA)])
    ap = np.array([float(f) for f in
                   riemann.SOLVERS[solver](WL, WR, n, vij, GAMMA)])
    scale = np.abs(ex).max()
    assert np.abs(ap - ex).max() / scale < 2e-3, (solver, ex, ap)


def test_trrs_close_to_exact_on_sod():
    WL = tuple(jnp.float32(x) for x in (1.0, 0.0, 0.0, 0.0, 1.0))
    WR = tuple(jnp.float32(x) for x in (0.125, 0.0, 0.0, 0.0, 0.1))
    n = (jnp.float32(1.0), jnp.float32(0.0), jnp.float32(0.0))
    vij = (jnp.float32(0.0),) * 3
    ex = np.array([float(f) for f in
                   riemann.exact_flux(WL, WR, n, vij, GAMMA)])
    ap = np.array([float(f) for f in
                   riemann.trrs_flux(WL, WR, n, vij, GAMMA)])
    scale = np.abs(ex).max()
    assert np.abs(ap - ex).max() / scale < 0.05, (ex, ap)


def test_vacuum_generation():
    """Strong double rarefaction generating vacuum: finite fluxes,
    zero mass flux by symmetry."""
    WL = tuple(jnp.float32(x) for x in (1.0, -20.0, 0.0, 0.0, 0.4))
    WR = tuple(jnp.float32(x) for x in (1.0, 20.0, 0.0, 0.0, 0.4))
    n = (jnp.float32(1.0), jnp.float32(0.0), jnp.float32(0.0))
    vij = (jnp.float32(0.0),) * 3
    for solver in ("exact", "hllc", "trrs"):
        F = np.array([float(f) for f in
                      riemann.SOLVERS[solver](WL, WR, n, vij, GAMMA)])
        assert np.isfinite(F).all(), solver
        assert abs(F[0]) < 1e-4, (solver, F)
