"""Smoothed chemistry (chemistry/EAGLE/chemistry_iact.h analog).

Two gates:
- A uniform metallicity field must smooth to itself EXACTLY (the
  kernel-weighted metal density equals Z * rho by construction), i.e.
  the normalisation — self term, h factors, rho division — is right.
- A random field must match the O(N^2) brute-force smoothing.
"""

import numpy as np
import jax.numpy as jnp

from swift_subtask_dev_tpu.grid import CellGrid, bucket_fields
from swift_subtask_dev_tpu.models.sph.sphenix import (
    SPHENIXParams, CosmoFactors)
from swift_subtask_dev_tpu.models.sph import sphenix
from swift_subtask_dev_tpu.ops import stencil

P = SPHENIXParams()
COSMO = CosmoFactors.no_cosmo()


def _setup(n=500, seed=7):
    rng = np.random.default_rng(seed)
    grid = CellGrid(box=(1.0, 1.0, 1.0), cdim=(4, 4, 4), K=32)
    pos = rng.uniform(0, 1, (n, 3)).astype(np.float64)
    h = (0.07 * (1 + 0.2 * rng.uniform(-1, 1, n))).astype(np.float32)
    m = rng.uniform(1.0, 1.5, n).astype(np.float32)
    Z = rng.uniform(0.0, 0.02, n).astype(np.float32)
    ef = rng.dirichlet(np.ones(9), n).astype(np.float32)
    pid = np.arange(n, dtype=np.int32)
    fields, mask, off, n_over = bucket_fields(
        grid, jnp.asarray(pos),
        {"pid": jnp.asarray(pid), "m": jnp.asarray(m),
         "h": jnp.asarray(h), "Z": jnp.asarray(Z),
         "elem_frac": jnp.asarray(ef),
         "v": jnp.zeros((n, 3), jnp.float32)})
    assert int(n_over) == 0
    s = {**fields, "mask": mask, "off": off}
    # a real SPH density for the normalisation
    dens = stencil.density_loop(grid, s, P, COSMO)
    s.update(dens)
    s = sphenix.end_density(P, s, COSMO)
    return grid, s, (pos, h, m, Z, ef, pid)


def _brute_smooth(pos, h, m, q, box=1.0):
    """O(N^2) reference: (sum_j m_j q_j W_ij) / (sum_j m_j W_ij)."""
    n = len(pos)
    d = pos[:, None, :] - pos[None, :, :]
    d -= box * np.round(d / box)
    r = np.sqrt((d ** 2).sum(-1)).astype(np.float32)
    u = r / h[:, None]
    w = np.array(P.kernel.deval(jnp.asarray(u))[0])
    w[u >= P.kernel.gamma] = 0.0
    num = (m[None, :, None] * q[None, :, :] * w[:, :, None]).sum(1)
    den = (m[None, :] * w).sum(1)
    return num / den[:, None]


def test_uniform_field_is_fixed_point():
    grid, s, (pos, h, m, Z, ef, pid) = _setup()
    Z0 = 0.0134
    s = {**s, "Z": jnp.full_like(s["Z"], Z0),
         "elem_frac": jnp.full_like(s["elem_frac"], 1.0 / 9.0)}
    Z_sm, ef_sm = stencil.chemistry_smooth_loop(grid, s, P)
    live = np.asarray(s["mask"]) > 0
    np.testing.assert_allclose(np.asarray(Z_sm)[live], Z0, rtol=2e-6)
    np.testing.assert_allclose(np.asarray(ef_sm)[live], 1.0 / 9.0,
                               rtol=2e-6)


def test_matches_bruteforce():
    grid, s, (pos, h, m, Z, ef, pid) = _setup()
    Z_sm, ef_sm = stencil.chemistry_smooth_loop(grid, s, P)

    q = np.concatenate([Z[:, None], ef], axis=1)
    ref = _brute_smooth(pos.astype(np.float32), h, m, q)

    # de-tile into pid order
    live = np.asarray(s["mask"]).reshape(-1) > 0
    ids = np.asarray(s["pid"]).reshape(-1)[live]
    got_Z = np.empty(len(pos), np.float32)
    got_Z[ids] = np.asarray(Z_sm).reshape(-1)[live]
    got_ef = np.empty((len(pos), 9), np.float32)
    got_ef[ids] = np.asarray(ef_sm).reshape(-1, 9)[live]

    np.testing.assert_allclose(got_Z, ref[:, 0], rtol=3e-4, atol=1e-7)
    np.testing.assert_allclose(got_ef, ref[:, 1:], rtol=3e-4, atol=1e-7)
