"""Stencil engine vs brute-force O(N^2) — the port of test27cells.

The reference validates its production sorted pair loops against an in-binary
all-pairs evaluation with per-field tolerances (tests/test27cells.c:372,
tolerance_27_normal.dat).  Here the stencil engine must agree with the
brute-force oracle essentially to f32 roundoff, since both run the same
pairwise term functions — only the pair enumeration differs.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from swift_subtask_dev_tpu.grid import CellGrid, bucket_fields
from swift_subtask_dev_tpu.models.sph.sphenix import (
    SPHENIXParams, CosmoFactors)
from swift_subtask_dev_tpu.models.sph import sphenix
from swift_subtask_dev_tpu.ops import stencil, bruteforce

P = SPHENIXParams()
COSMO = CosmoFactors.no_cosmo()


def setup(n=600, seed=1, cdim=(4, 4, 4), K=32, h0=0.07):
    rng = np.random.default_rng(seed)
    box = (1.0, 1.0, 1.0)
    grid = CellGrid(box=box, cdim=cdim, K=K)
    pos = rng.uniform(0, 1, (n, 3)).astype(np.float64)
    h = (h0 * (1 + 0.2 * rng.uniform(-1, 1, n))).astype(np.float32)
    m = rng.uniform(1.0, 1.5, n).astype(np.float32)
    v = rng.normal(0, 0.3, (n, 3)).astype(np.float32)
    u = rng.uniform(0.5, 2.0, n).astype(np.float32)
    pid = np.arange(n, dtype=np.int32)
    return grid, pos, h, m, v, u, pid


def to_tiles(grid, pos, flat_fields):
    fields, mask, off, n_over = bucket_fields(
        grid, jnp.asarray(pos),
        {k: jnp.asarray(v) for k, v in flat_fields.items()})
    assert int(n_over) == 0
    return fields, mask, off


def gather_flat(tiled, mask, pid_tiled, n):
    """Extract per-particle values in pid order from (C,K,...) tiles."""
    valid = np.asarray(mask).reshape(-1) > 0
    ids = np.asarray(pid_tiled).reshape(-1)[valid]
    out = {}
    for k, v in tiled.items():
        flat = np.asarray(v).reshape((-1,) + v.shape[2:])[valid]
        o = np.empty_like(flat)
        o[ids] = flat
        out[k] = o
    return out


def run_stencil_chain(grid, pos, h, m, v, u, pid):
    n = len(pos)
    fields, mask, off = to_tiles(grid, pos, {
        "pid": pid, "h": h, "m": m, "v": v, "u": u})
    s = {"mask": mask, "off": off, **fields}

    dens = stencil.density_loop(grid, s, P)
    s.update(dens)
    s = sphenix.end_density(P, s, COSMO)
    s = sphenix.prepare_gradient(P, s, COSMO)
    s["alpha_visc"] = jnp.full_like(s["h"], P.viscosity_alpha) * mask
    s = sphenix.reset_gradient(s)
    grad = stencil.gradient_loop(grid, s, P, COSMO)
    s.update(grad)
    s = sphenix.end_gradient(s)
    s["alpha_diff"] = jnp.zeros_like(s["h"])
    s["div_v_prev"] = jnp.zeros_like(s["h"])
    s = sphenix.prepare_force(P, s, COSMO, dt_alpha=jnp.float32(0.0))
    s["a_hydro"] = jnp.zeros((grid.C, grid.K, 3), jnp.float32)
    s["u_dt"] = jnp.zeros_like(s["h"])
    s["h_dt"] = jnp.zeros_like(s["h"])
    force = stencil.force_loop(grid, s, P, COSMO)
    s.update(force)
    keys = ["rho", "rho_dh", "wcount", "wcount_dh", "div_v", "rot_v",
            "v_sig", "laplace_u", "alpha_visc_max_ngb", "f_gradh",
            "pressure", "soundspeed", "balsara", "a_hydro", "u_dt", "h_dt",
            "alpha_visc", "alpha_diff"]
    return gather_flat({k: s[k] for k in keys}, mask, fields["pid"], n)


def run_brute_chain(pos, h, m, v, u, box=(1.0, 1.0, 1.0)):
    pos = jnp.asarray(pos, jnp.float32)
    h = jnp.asarray(h)
    m = jnp.asarray(m)
    v = jnp.asarray(v)
    u = jnp.asarray(u)
    s = {"h": h, "m": m, "u": u}
    dens = bruteforce.density_bruteforce(P, pos, h, m, v, box)
    s.update(dens)
    s = sphenix.end_density(P, s, COSMO)
    s = sphenix.prepare_gradient(P, s, COSMO)
    s["alpha_visc"] = jnp.full_like(h, P.viscosity_alpha)
    s = sphenix.reset_gradient(s)
    grad = bruteforce.gradient_bruteforce(
        P, pos, h, m, v, u, s["rho"], s["soundspeed"], s["alpha_visc"],
        s["v_sig"], s["alpha_visc_max_ngb"], COSMO, box)
    s.update(grad)
    s = sphenix.end_gradient(s)
    s["alpha_diff"] = jnp.zeros_like(h)
    s["div_v_prev"] = jnp.zeros_like(h)
    s = sphenix.prepare_force(P, s, COSMO, dt_alpha=jnp.float32(0.0))
    force = bruteforce.force_bruteforce(
        P, pos, h, m, v, s["rho"], s["pressure"], s["soundspeed"],
        s["f_gradh"], s["balsara"], s["alpha_visc"], s["alpha_diff"], u,
        s["v_sig"], COSMO, box)
    s.update(force)
    return {k: np.asarray(v) for k, v in s.items()}


def test_stencil_matches_bruteforce():
    grid, pos, h, m, v, u, pid = setup()
    got = run_stencil_chain(grid, pos, h, m, v, u, pid)
    ref = run_brute_chain(pos, h, m, v, u)

    # Tolerances mirror tests/tolerance_27_normal.dat:密度 1e-5-ish, forces 1e-4
    def close(key, rtol, atol=1e-5):
        scale = np.maximum(np.abs(ref[key]), atol)
        err = np.abs(got[key] - ref[key]) / scale
        assert err.max() < rtol, f"{key}: max rel err {err.max():.2e}"

    close("rho", 2e-5)
    close("wcount", 2e-5)
    close("rho_dh", 1e-4, atol=1e-3)
    close("wcount_dh", 1e-4, atol=1e-3)
    close("div_v", 2e-4, atol=1e-2)
    close("rot_v", 2e-4, atol=1e-2)
    close("v_sig", 1e-5)
    close("laplace_u", 3e-3, atol=1e-2)  # cancellation-heavy f32 sum
    close("alpha_visc_max_ngb", 1e-6)
    close("pressure", 2e-5)
    close("a_hydro", 5e-4, atol=1e-1)
    close("u_dt", 5e-4, atol=1e-1)
    close("h_dt", 5e-4, atol=1e-2)


def test_no_nans_with_empty_cells():
    """Sparse particles (most cells empty) produce finite results."""
    grid, pos, h, m, v, u, pid = setup(n=40, cdim=(5, 5, 5), K=16)
    got = run_stencil_chain(grid, pos, h, m, v, u, pid)
    for k, val in got.items():
        assert np.isfinite(val).all(), f"{k} has non-finite entries"


def test_density_self_only():
    """A single isolated particle gets exactly the self contribution."""
    grid = CellGrid(box=(1.0, 1.0, 1.0), cdim=(4, 4, 4), K=8)
    pos = np.array([[0.5, 0.5, 0.5]])
    h = np.array([0.05], np.float32)
    m = np.array([2.0], np.float32)
    v = np.zeros((1, 3), np.float32)
    u = np.ones(1, np.float32)
    pid = np.array([0], np.int32)
    got = run_stencil_chain(grid, pos, h, m, v, u, pid)
    expect_rho = 2.0 * P.kernel.root / 0.05 ** 3
    np.testing.assert_allclose(got["rho"][0], expect_rho, rtol=1e-5)
