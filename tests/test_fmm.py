"""FMM far-field validation against direct summation.

The analog of the reference's gravity_exact_force_check (engine.c:2627):
accelerations from the FMM+P2P near field must match a brute-force direct
sum of the same softened+truncated pair kernel over all periodic images.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from swift_subtask_dev_tpu.grid import CellGrid
from swift_subtask_dev_tpu.grid.cellgrid import bucket_fields
from swift_subtask_dev_tpu.models.gravity import GravityParams, GravitySolver
from swift_subtask_dev_tpu.ops import fmm, p2p_gravity


def _direct_short_range(pos, m, box, G, H, r_s):
    """f64 direct sum of the truncated short-range pair kernel over the
    27 nearest periodic images (the truncation makes farther images
    negligible)."""
    n = len(pos)
    shifts = np.array([(i, j, k) for i in (-1, 0, 1) for j in (-1, 0, 1)
                       for k in (-1, 0, 1)], np.float64) * box
    acc = np.zeros((n, 3))
    pot = np.zeros(n)
    for i in range(n):
        d = (pos[i] - pos)[None, :, :] - shifts[:, None, :]   # (27, n, 3)
        d = d.reshape(-1, 3)
        r2 = np.sum(d * d, axis=1)
        sel = r2 > 1e-20
        dd, rr2 = d[sel], r2[sel]
        mj = np.tile(m, 27)[sel]
        F = np.asarray(p2p_gravity.softened_force_factor(
            jnp.asarray(rr2, jnp.float32), H), np.float64)
        P = np.asarray(p2p_gravity.softened_pot_factor(
            jnp.asarray(rr2, jnp.float32), H), np.float64)
        if r_s > 0:
            F = F * np.asarray(p2p_gravity.truncation_factor(
                jnp.asarray(rr2, jnp.float32), 1.0 / r_s))
            P = P * np.asarray(p2p_gravity.pot_truncation_factor(
                jnp.asarray(rr2, jnp.float32), 1.0 / r_s))
        acc[i] = -(G * mj[:, None] * F[:, None] * dd).sum(axis=0)
        pot[i] = -(G * mj * P).sum()
    return acc, pot


# the clustered config is the regime the FMM exists for; the
# uniform case is covered by the (cheap) energy/growth gates
@pytest.mark.parametrize("clustered", [True])
def test_fmm_matches_direct_sum(clustered):
    rng = np.random.default_rng(4)
    n = 400
    box = (1.0, 1.0, 1.0)
    if clustered:
        # Plummer-ish blob + background: exercises the K^2-blowup regime
        # the FMM exists for
        r = 0.08 / np.sqrt(rng.uniform(0.05, 1.0, n // 2))
        u = rng.normal(size=(n // 2, 3))
        u /= np.linalg.norm(u, axis=1, keepdims=True)
        blob = 0.5 + r[:, None] * u
        back = rng.uniform(0, 1, (n - n // 2, 3))
        pos = np.concatenate([blob, back]) % 1.0
    else:
        pos = rng.uniform(0, 1, (n, 3))
    m = rng.uniform(0.5, 1.5, n)

    # fine grid (edge < r_cut) forces the FMM regime; mesh_N=16 keeps
    # r_cut=0.35 well under box/2 so the M2L rolls cannot alias
    gp = GravityParams(G=1.0, eps=0.004, mesh_N=16, a_smooth=1.25,
                      r_cut_ratio=4.5)
    grid = CellGrid(box=box, cdim=(16, 16, 16), K=40)
    solver = GravitySolver(gp, grid)
    assert solver.use_fmm, "test must exercise the FMM regime"

    fields, mask, off, nov = bucket_fields(
        grid, jnp.asarray(pos), {"m": jnp.asarray(m, jnp.float32)})
    assert int(nov) == 0
    s = {"mask": mask, "off": off, "m": fields["m"]}

    # near field under test: P2P(radius 2) + FMM M2L band
    pp = p2p_gravity.p2p_accelerations(
        grid, [s], gp.G, H_soft=gp.H_soft, r_s=solver.pm.r_s,
        periodic_truncation=True, radius=2)
    M = fmm.p2m(grid, [s], gp.multipole_order)
    L = fmm.m2l(grid, M, solver.fmm_offsets, solver.fmm_T)
    af, pf = fmm.l2p(grid, L, s, gp.multipole_order, gp.G)
    acc = np.asarray(pp[0][0] + af)
    pot = np.asarray(pp[0][1] + pf)

    acc_ref, pot_ref = _direct_short_range(
        pos, m, np.asarray(box), gp.G, gp.H_soft, solver.pm.r_s)

    # map tiled slots back to particle order (positions are unique)
    mask_np = np.asarray(mask).reshape(-1) > 0
    corners = grid.cell_corners()
    pos_tiled = (corners[:, None, :] + np.asarray(off)).reshape(-1, 3)
    pos_tiled = pos_tiled[mask_np] % 1.0
    acc_t = acc.reshape(-1, 3)[mask_np]
    pot_t = pot.reshape(-1)[mask_np]
    o1 = np.lexsort(pos_tiled.T)
    o2 = np.lexsort((pos % 1.0).T)
    acc_t, pot_t = acc_t[o1], pot_t[o1]
    acc_ref, pot_ref = acc_ref[o2], pot_ref[o2]

    scale = np.sqrt(np.mean(np.sum(acc_ref ** 2, axis=1)))
    err = np.sqrt(np.sum((acc_t - acc_ref) ** 2, axis=1)) / (scale + 1e-30)
    # gates in the spirit of gravity_exact_force_check: the fixed >=3-cell
    # separation MAC at order 5 plus the r_cut truncation tail
    assert np.sqrt(np.mean(err ** 2)) < 2e-3, np.sqrt(np.mean(err ** 2))
    assert np.max(err) < 2e-2, np.max(err)

    perr = np.abs(pot_t - pot_ref) / (np.abs(pot_ref).mean() + 1e-30)
    assert np.mean(perr) < 2e-3, np.mean(perr)
