"""Cartesian multipole far field (FMM M2L) on the uniform cell grid.

The reference's gravity below the mesh scale is an FMM tree walk:
P2M/M2M build multipoles (multipole.h:983,1278), the MAC picks M2L vs P2P
(multipole_accept.h:81), M2L translates multipoles into local Taylor
expansions (multipole.h:2004), L2P evaluates them at particles.  The TPU
re-design flattens the tree onto the uniform cell grid:

* **P2M**: per-cell Cartesian multipoles M_alpha = sum_j m_j b^alpha
  (|alpha| <= p, b = offset from the cell centre) — masked sums over the
  padded tiles.
* **M2L**: for every separation d with 3 <= |d|_inf and |d|*edge inside
  r_cut, the translation is a PRECOMPUTED (n_terms, n_terms) matrix
  T_d[alpha, beta] = (-1)^{|alpha|} D_{alpha+beta}(d*edge) / alpha!
  where D are the exact derivative tensors of the softened+truncated
  potential kernel, obtained by nested jax.jacfwd at solver build time.
  The M2L sweep is then a scan of roll + (C, n) @ (n, n) matmuls — the
  FLOP-heavy part rides the MXU.
* **L2P**: Taylor evaluation phi(a) = sum_beta L_beta a^beta / beta! and
  its exact gradient for the accelerations.
* The near field (|d|_inf <= 2) stays direct P2P (ops/p2p_gravity.py),
  and the beyond-r_cut field is the PM mesh (ops/pm_gravity.py) — the
  same three-way split as the reference's FMM + mesh.

Fixed-separation MAC: pairs closer than 3 cells are never expanded, so
the worst-case convergence ratio is sqrt(3)/2 / (3 - sqrt(3)/2) ~ 0.4,
giving ~1e-3 worst-case / ~1e-4 RMS force errors at order 5 — the
uniform-grid analog of the reference's adaptive theta_cr MAC.
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..grid.cellgrid import CellGrid
from .p2p_gravity import pot_truncation_factor, softened_pot_factor

F32 = jnp.float32


# ---------------------------------------------------------------------------
# Multi-index machinery
# ---------------------------------------------------------------------------

@lru_cache(maxsize=None)
def multi_indices(p: int) -> Tuple[Tuple[int, int, int], ...]:
    """All (i, j, k) with i+j+k <= p, graded order."""
    out = []
    for n in range(p + 1):
        for i in range(n, -1, -1):
            for j in range(n - i, -1, -1):
                out.append((i, j, n - i - j))
    return tuple(out)


def _fact(n: int) -> int:
    return math.factorial(n)


def _alpha_fact(a) -> int:
    return _fact(a[0]) * _fact(a[1]) * _fact(a[2])


# ---------------------------------------------------------------------------
# Translation-matrix builder (host-side, once per solver)
# ---------------------------------------------------------------------------

def far_offsets(grid: CellGrid, r_cut: float, near_radius: int = 2
                ) -> np.ndarray:
    """(O, 3) integer separations handled by M2L: |d|_inf > near_radius,
    nearest-point distance below r_cut (beyond it the truncated kernel is
    negligible — the reference also drops pairs past r_cut,
    runner_doiact_grav.c)."""
    e = np.asarray(grid.edge)
    diag = float(np.linalg.norm(e))
    dmax = [int(math.ceil(r_cut / ei)) + 1 for ei in e]
    for ax, dm in enumerate(dmax):
        if 2 * dm + 1 > grid.cdim[ax]:
            raise ValueError(
                f"M2L span {dm} cells exceeds half the grid on axis {ax} "
                f"(cdim {grid.cdim[ax]}): rolled offsets would alias — "
                f"use a finer mesh (smaller r_cut) or a coarser grid")
    out = []
    for dx in range(-dmax[0], dmax[0] + 1):
        for dy in range(-dmax[1], dmax[1] + 1):
            for dz in range(-dmax[2], dmax[2] + 1):
                if max(abs(dx), abs(dy), abs(dz)) <= near_radius:
                    continue
                r_center = np.linalg.norm(np.asarray([dx, dy, dz]) * e)
                if r_center - diag > r_cut:
                    continue
                out.append((dx, dy, dz))
    return np.asarray(out, np.int32)


def build_t_matrices(grid: CellGrid, offsets: np.ndarray, p: int,
                     H_soft: float, r_s: float) -> np.ndarray:
    """(O, nt, nt) M2L translation matrices via nested-jacfwd derivative
    tensors of the softened + truncated radial kernel.

    Disk-cached (~/.cache/swift_subtask_dev_tpu): the order-5 nested
    jacfwd tower costs minutes per (grid, offsets) geometry and the
    matrices depend only on static build inputs."""
    import hashlib
    import os
    key = hashlib.sha256(
        np.asarray(offsets, np.int32).tobytes()
        + np.asarray(grid.edge_arr, np.float64).tobytes()
        + np.asarray([p, H_soft, r_s], np.float64).tobytes()
    ).hexdigest()[:24]
    cache_dir = os.path.join(os.path.expanduser("~"), ".cache",
                             "swift_subtask_dev_tpu")
    cache = os.path.join(cache_dir, f"tmat_{key}.npy")
    if os.path.exists(cache):
        try:
            return np.load(cache)
        except Exception:
            pass
    T = _build_t_matrices_uncached(grid, offsets, p, H_soft, r_s)
    try:
        os.makedirs(cache_dir, exist_ok=True)
        tmp = cache + f".tmp{os.getpid()}"
        np.save(tmp, T)
        os.replace(tmp, cache)
    except OSError:
        pass
    return T


def _build_t_matrices_uncached(grid: CellGrid, offsets: np.ndarray,
                               p: int, H_soft: float,
                               r_s: float) -> np.ndarray:
    idx = multi_indices(p)
    nt = len(idx)
    pos = {a: i for i, a in enumerate(idx)}
    r_s_inv = 1.0 / r_s if r_s > 0 else 0.0

    def pot(x):
        r2 = jnp.sum(x * x)
        P = softened_pot_factor(r2, jnp.float32(H_soft))
        if r_s > 0:
            P = P * pot_truncation_factor(r2, r_s_inv)
        return P

    fns = [pot]
    for _ in range(p):
        fns.append(jax.jacfwd(fns[-1]))
    # m2l rolls give j = i + d, so the i-to-j separation is R = -d * edge
    R = -jnp.asarray(offsets, F32) * jnp.asarray(grid.edge_arr, F32)
    with jax.default_device(jax.devices("cpu")[0]):
        Ds = [np.asarray(jax.vmap(f)(R)) for f in fns]   # rank-n tensors

    def d_entry(o, gamma):
        n = sum(gamma)
        comp = (0,) * gamma[0] + (1,) * gamma[1] + (2,) * gamma[2]
        return Ds[n][(o,) + comp]

    T = np.zeros((len(offsets), nt, nt), np.float32)
    for ai, a in enumerate(idx):
        na = sum(a)
        sgn = -1.0 if na % 2 else 1.0
        inv_af = sgn / _alpha_fact(a)
        for bi, b in enumerate(idx):
            if na + sum(b) > p:
                continue
            g = (a[0] + b[0], a[1] + b[1], a[2] + b[2])
            for o in range(len(offsets)):
                T[o, ai, bi] = d_entry(o, g) * inv_af
    return T


# ---------------------------------------------------------------------------
# Device-side kernels
# ---------------------------------------------------------------------------

def _monomials(b: jnp.ndarray, p: int) -> jnp.ndarray:
    """(..., 3) -> (..., nt) monomials b^alpha in multi_indices order."""
    idx = multi_indices(p)
    px = [jnp.ones_like(b[..., 0])]
    py = [jnp.ones_like(b[..., 0])]
    pz = [jnp.ones_like(b[..., 0])]
    for _ in range(p):
        px.append(px[-1] * b[..., 0])
        py.append(py[-1] * b[..., 1])
        pz.append(pz[-1] * b[..., 2])
    return jnp.stack([px[i] * py[j] * pz[k] for (i, j, k) in idx], axis=-1)


def p2m(grid: CellGrid, species: Sequence[Dict], p: int) -> jnp.ndarray:
    """(C, nt) cell multipoles about the geometric cell centres, summed
    over all species (multipole.h:983 gravity_P2M)."""
    half = jnp.asarray(grid.edge_arr, F32) * 0.5
    M = 0.0
    for s in species:
        b = s["off"] - half                       # (C, K, 3) about centre
        mono = _monomials(b, p)                   # (C, K, nt)
        w = (s["m"] * s["mask"])[..., None]
        M = M + jnp.sum(mono * w, axis=1)
    return M


def m2l(grid: CellGrid, M: jnp.ndarray, offsets: np.ndarray,
        T: np.ndarray) -> jnp.ndarray:
    """(C, nt) local expansions from all far-separation cell multipoles.

    A scan over the static separation list: each step rolls the multipole
    grid and applies that separation's translation matrix on the MXU
    (multipole.h:2004 gravity_M2L semantics, batched over every cell
    pair of the grid at once).
    """
    nt = M.shape[-1]
    Mg = M.reshape(grid.cdim + (nt,))
    ds = jnp.asarray(offsets)
    Ts = jnp.asarray(T)

    def body(L, inp):
        d, Td = inp
        Mr = jnp.roll(Mg, shift=(-d[0], -d[1], -d[2]), axis=(0, 1, 2))
        return L + Mr.reshape(-1, nt) @ Td, None

    L0 = jnp.zeros((grid.C, nt), F32)
    L, _ = jax.lax.scan(body, L0, (ds, Ts))
    return L


def l2p(grid: CellGrid, L: jnp.ndarray, s: Dict, p: int, G: float):
    """Evaluate the local expansion at particle offsets.

    Returns (acc (C,K,3), pot (C,K)):
      pot   = -G sum_beta L_beta a^beta / beta!
      acc_k = +G sum_beta L_{beta+e_k} a^beta / beta!
    (the exact gradient of the truncated Taylor series).
    """
    idx = multi_indices(p)
    pos = {a: i for i, a in enumerate(idx)}
    inv_bf = np.asarray([1.0 / _alpha_fact(b) for b in idx], np.float32)

    half = jnp.asarray(grid.edge_arr, F32) * 0.5
    a = s["off"] - half
    mono = _monomials(a, p)                       # (C, K, nt)

    Lc = L[:, None, :]                            # (C, 1, nt)
    pot = -jnp.float32(G) * jnp.sum(
        Lc * mono * jnp.asarray(inv_bf), axis=-1)

    acc = []
    for k in range(3):
        # gather map: beta -> beta + e_k (rows with |beta| < p)
        rows, cols, coef = [], [], []
        for bi, b in enumerate(idx):
            if sum(b) >= p:
                continue
            bk = list(b)
            bk[k] += 1
            rows.append(bi)
            cols.append(pos[tuple(bk)])
            coef.append(1.0 / _alpha_fact(b))
        rows = np.asarray(rows)
        cols = np.asarray(cols)
        coef = np.asarray(coef, np.float32)
        acc.append(jnp.float32(G) * jnp.sum(
            Lc[..., cols] * mono[..., rows] * jnp.asarray(coef), axis=-1))
    acc = jnp.stack(acc, axis=-1)
    mask = s["mask"]
    return acc * mask[..., None], pot * mask


# ---------------------------------------------------------------------------
# Adaptive (Dehnen 2014) MAC — multipole_accept.h:108-171
# ---------------------------------------------------------------------------

def multipole_power(M: jnp.ndarray, p: int) -> jnp.ndarray:
    """(C, p+1) Dehnen power estimates (multipole.h:878
    gravity_multipole_compute_power): power[n] = sqrt(sum_{|a|=n}
    w_a M_swift_a^2) with w_a = a!/n!.  This module's moments are
    UNNORMALIZED (M_a = sum m b^a = a! M_swift_a), so the weight becomes
    1/(a! n!).  Unlike the reference we expand about geometric cell
    centres, not the CoM, so the dipole power (n=1) is kept (the
    reference zeroes it, multipole.h:893)."""
    idx = multi_indices(p)
    cols = []
    for n_ord in range(p + 1):
        if n_ord == 0:
            cols.append(jnp.abs(M[:, 0]))
            continue
        s = 0.0
        for i, a in enumerate(idx):
            if sum(a) != n_ord:
                continue
            s = s + M[:, i] ** 2 / (_alpha_fact(a) * _fact(n_ord))
        cols.append(jnp.sqrt(s))
    return jnp.stack(cols, axis=1)


def shell_offsets(grid: CellGrid, radius: int) -> np.ndarray:
    """(O, 3) integer separations with |d|_inf == radius (the outermost
    P2P shell — the candidates the adaptive MAC may promote to M2L)."""
    out = []
    for dx in range(-radius, radius + 1):
        for dy in range(-radius, radius + 1):
            for dz in range(-radius, radius + 1):
                if max(abs(dx), abs(dy), abs(dz)) == radius:
                    out.append((dx, dy, dz))
    return np.asarray(out, np.int32)


def adaptive_accept(grid: CellGrid, M: jnp.ndarray, p: int,
                    offsets: np.ndarray, min_a_grav: jnp.ndarray,
                    eps_mac: float, H_soft: float) -> jnp.ndarray:
    """(C, O) accept mask: Dehnen MAC per (receiver cell A, offset o)
    with source B = A + o (multipole_accept.h:160-171, uniform grid:
    rho_A = rho_B = half cell diagonal):

      E_BA = 8 * [sum_n C(p,n) power_B[n] rho^(p-n)] * rho_max/rho_sum
      accept iff rho_sum^2 < r^2  AND  H_soft^2 < r^2
             AND E_BA < eps * min|a_old|_A * r^p * r^2

    min_a_grav: (C,) minimum old acceleration norm among the receiver
    cell's particles (engine feeds |a_grav + a_grav_mesh| from the
    previous step; the reference carries the same min through its
    multipoles, m_pole.min_old_a_grav_norm).  Cells with min_a = 0
    (first step) accept nothing — pure geometric behaviour.
    """
    e = np.asarray(grid.edge)
    rho = 0.5 * float(np.linalg.norm(e))
    pw = multipole_power(M, p)                                # (C, p+1)
    binom = [math.comb(p, n_) for n_ in range(p + 1)]
    E = 0.0
    for n_ in range(p + 1):
        E = E + binom[n_] * pw[:, n_] * rho ** (p - n_)
    E = E * 8.0 * 0.5                                        # rho_max/rho_sum
    ncx, ncy, ncz = grid.cdim
    Eg = E.reshape(ncx, ncy, ncz)
    cols = []
    for d in offsets:
        r2 = float(np.sum((np.asarray(d) * e) ** 2))
        E_B = jnp.roll(Eg, shift=(-d[0], -d[1], -d[2]),
                       axis=(0, 1, 2)).reshape(-1)
        ok_geo = (2.0 * rho) ** 2 < r2
        ok_soft = H_soft * H_soft < r2
        ok_err = E_B < (eps_mac * min_a_grav
                        * r2 ** (p / 2.0) * r2)
        cols.append(jnp.where(ok_geo & ok_soft, ok_err, False))
    return jnp.stack(cols, axis=1)                            # (C, O)


def m2l_masked(grid: CellGrid, M: jnp.ndarray, offsets: np.ndarray,
               T: np.ndarray, accept: jnp.ndarray) -> jnp.ndarray:
    """m2l with a per-(cell, offset) accept mask: rejected pairs
    contribute nothing (their interaction stays in the P2P pass)."""
    nt = M.shape[-1]
    Mg = M.reshape(grid.cdim + (nt,))
    ds = jnp.asarray(offsets)
    Ts = jnp.asarray(T)

    def body(L, inp):
        o, d, Td = inp
        Mr = jnp.roll(Mg, shift=(-d[0], -d[1], -d[2]), axis=(0, 1, 2))
        contrib = Mr.reshape(-1, nt) @ Td
        return L + contrib * accept[:, o, None], None

    L0 = jnp.zeros((grid.C, nt), F32)
    L, _ = jax.lax.scan(body, L0,
                        (jnp.arange(len(offsets)), ds, Ts))
    return L
