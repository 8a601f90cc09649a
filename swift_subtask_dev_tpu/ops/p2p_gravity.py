"""Short-range (P2P) gravity over the 27-stencil — the near field of P3M.

The reference computes near-field gravity with FMM P2P kernels on SoA
caches (runner_doiact_grav.c:584 runner_dopair_grav_pp_truncated,
gravity_iact.h) with:
  * C2-spline softening (kernel_gravity.h:79 kernel_grav_force_eval):
      W(u) = 21u^5 - 90u^4 + 140u^3 - 84u^2 + 14,  u = r/H < 1
    giving  a = -G m W(u)/H^3 * dx  inside the softening and Newtonian
    1/r^3 outside;
  * Gadget-like long-range truncation chi(r, r_s)
    (kernel_long_gravity.h:34): force factor
      corr(r) = erfc(u) + 2u/sqrt(pi) exp(-u^2),  u = r / (2 r_s)
    so that P2P + PM(exp(-k^2 r_s^2)) sums to the exact force.

Here the pair enumeration is the same dense 27-stencil as hydro.  The
multipole (M2L/M2P) far-field acceleration of the reference's FMM is
subsumed by the PM mesh: choosing the gravity cell edge >= r_cut makes
everything beyond the stencil pure mesh — the classic P3M split.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp

from ..grid.cellgrid import CellGrid
from .stencil import (STENCIL_27, _bi, _bj, _grid_view, _flat_view,
                      _roll, _pair_geometry_shift, _sanitize)

F32 = jnp.float32
_SQRT_PI_INV = 0.5641895835477563  # 1/sqrt(pi)


def softened_force_factor(r2, H):
    """|f|/(m G) * r: the softened 1/r^2 kernel as factor on dx/r.

    Returns F(r) with a = -G m F(r) dx (dx unnormalised), i.e.
    F = 1/r^3 outside the softening H and W(r/H)/H^3 inside.
    """
    r = jnp.sqrt(r2)
    r_inv = jnp.where(r > 0, 1.0 / jnp.maximum(r, 1e-30), 0.0)
    u = r / H
    # C2 spline force kernel (kernel_gravity.h:91)
    W = 21.0 * u - 90.0
    W = W * u + 140.0
    W = W * u - 84.0
    W = W * u
    W = W * u + 14.0
    inside = W / (H * H * H)
    outside = r_inv * r_inv * r_inv
    return jnp.where(r < H, inside, outside)


def _erfc_pos(x):
    """erfc(x) for x >= 0 — Abramowitz & Stegun 7.1.26 polynomial
    (|err| < 1.5e-7).  jax.lax.erfc has no Mosaic lowering, and an
    identical approximation in every backend keeps the XLA and Pallas
    gravity paths bit-consistent."""
    t = 1.0 / (1.0 + 0.3275911 * x)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return poly * jnp.exp(-x * x)


def truncation_factor(r2, r_s_inv):
    """Gadget-like short-range truncation chi_force(r, r_s).

    erfc(u) + 2u/sqrt(pi) e^{-u^2}, u = r/(2 r_s)
    (kernel_long_gravity.h:70-100).
    """
    r = jnp.sqrt(r2)
    u = 0.5 * r * r_s_inv
    return _erfc_pos(u) + 2.0 * u * _SQRT_PI_INV * jnp.exp(-u * u)


def softened_pot_factor(r2, H):
    """phi = -G m P(r): the softened 1/r potential kernel.

    Outside the softening H this is 1/r; inside it is (3 - S(u))/H with
    S(u) = 3u^7 - 15u^6 + 28u^5 - 21u^4 + 7u^2 — the exact integral of the
    C2 force spline above, matching kernel_grav_pot_eval
    (kernel_gravity.h:62).
    """
    r = jnp.sqrt(r2)
    r_inv = jnp.where(r > 0, 1.0 / jnp.maximum(r, 1e-30), 0.0)
    u = r / H
    u2 = u * u
    S = u2 * (7.0 + u2 * (-21.0 + u * (28.0 + u * (-15.0 + 3.0 * u))))
    inside = (3.0 - S) / H
    return jnp.where(r < H, inside, r_inv)


def pot_truncation_factor(r2, r_s_inv):
    """chi_pot(r, r_s) = erfc(r / (2 r_s)) (kernel_long_gravity.h:52)."""
    return _erfc_pos(0.5 * jnp.sqrt(r2) * r_s_inv)


def force_pot_factors(r2, H_inv, r_s_inv, trunc: bool):
    """(F, P) softened + truncated force/potential factors, fused.

    Numerically identical formulas to the four standalone factor
    functions above, restructured for the VPU hot loop: ONE rsqrt gives
    r and 1/r, u/u_trunc are shared, the erfc evaluation and its
    exp(-x^2) are shared between the force and potential truncations,
    and every divide-by-constant is a reciprocal multiply.  ~2x fewer
    transcendentals than calling the four factors separately (the pair
    kernels are VPU-bound — tools/vpu_peak.py).
    """
    r_inv = jnp.where(r2 > 0, jax.lax.rsqrt(jnp.maximum(r2, 1e-38)), 0.0)
    r = r2 * r_inv
    u = r * H_inv
    # C2 spline force kernel (kernel_gravity.h:91)
    W = 21.0 * u - 90.0
    W = W * u + 140.0
    W = W * u - 84.0
    W = W * u
    W = W * u + 14.0
    H3_inv = H_inv * H_inv * H_inv
    r_inv2 = r_inv * r_inv
    inside = u < 1.0
    F = jnp.where(inside, W * H3_inv, r_inv2 * r_inv)
    # potential spline S(u) (kernel_gravity.h:62)
    u2 = u * u
    S = u2 * (7.0 + u2 * (-21.0 + u * (28.0 + u * (-15.0 + 3.0 * u))))
    P = jnp.where(inside, (3.0 - S) * H_inv, r_inv)
    if trunc:
        x = 0.5 * r * r_s_inv
        e = jnp.exp(-x * x)
        t = 1.0 / (1.0 + 0.3275911 * x)
        poly = t * (0.254829592 + t * (-0.284496736 + t * (
            1.421413741 + t * (-1.453152027 + t * 1.061405429))))
        erfc = poly * e
        F = F * (erfc + (2.0 * _SQRT_PI_INV) * x * e)
        P = P * erfc
    return F, P


def stencil_offsets(radius: int):
    """All integer separations with |d|_inf <= radius (27 at radius 1)."""
    r = range(-radius, radius + 1)
    return [(dx, dy, dz) for dx in r for dy in r for dz in r]


def p2p_accelerations(grid: CellGrid,
                      species: Sequence[Dict[str, jnp.ndarray]],
                      G: float, H_soft: float,
                      r_s: float = 0.0, periodic_truncation: bool = True,
                      radius: int = 1, offset_skip=None,
                      offsets=None):
    """Short-range gravity between all species bucketed on the same grid.

    species: list of dicts with keys mask, off, m — each (C, K_s) tiles on
    `grid` (K may differ per species).  Returns a list of (C, K_s, 3)
    accelerations and (C, K_s) potentials.

    H_soft: the softening length H (= 3 * Plummer-equivalent epsilon,
    gravity_properties.c) — a single float, or a sequence with one H per
    species; a pair then softens with max(H_i, H_j), the reference's
    multi-softening rule (kernel_gravity.h / gravity_iact.h uses the
    larger of the two softenings).  r_s: mesh smoothing scale; 0 or
    periodic_truncation=False disables the truncation (pure Newtonian
    near-field, for non-periodic runs).
    """
    edge = grid.edge
    r_s_inv = 1.0 / r_s if r_s > 0 else 0.0
    H_list = (list(H_soft) if isinstance(H_soft, (list, tuple))
              else [float(H_soft)] * len(species))
    if offsets is None:
        # explicit lists let the adaptive MAC STATICALLY drop whole
        # promoted offsets (a real flop cut — the per-cell masked skip
        # below still computes the pairs it zeroes)
        offsets = STENCIL_27 if radius == 1 else stencil_offsets(radius)
    if any(c < 2 * radius + 1 for c in grid.cdim):
        raise ValueError(
            f"P2P stencil radius {radius} needs cdim >= {2 * radius + 1} "
            f"per axis (have {grid.cdim}): offsets would alias")

    outs = []
    for si, H_i in zip(species, H_list):
        mask_i = _grid_view(grid, si["mask"])
        off_i = _grid_view(grid, si["off"])
        acc = jnp.zeros(off_i.shape, F32)
        pot = jnp.zeros(mask_i.shape, F32)

        for sj, H_j in zip(species, H_list):
            H = jnp.float32(max(H_i, H_j))
            mask_j0 = _grid_view(grid, sj["mask"])
            off_j0 = _grid_view(grid, sj["off"])
            m_j0 = _grid_view(grid, sj["m"])

            for d in offsets:
                off_j = _roll(off_j0, d)
                m_j = _bj(_roll(m_j0, d))
                ok = (_bj(_roll(mask_j0, d)) > 0)
                shift = (jnp.float32(d[0] * edge[0]),
                         jnp.float32(d[1] * edge[1]),
                         jnp.float32(d[2] * edge[2]))
                dx, r2 = _pair_geometry_shift(off_i, off_j, shift)
                ok = ok & (r2 > 0)
                w = ok.astype(F32)
                if offset_skip is not None and tuple(d) in offset_skip:
                    # adaptive MAC: (cell, offset) pairs promoted to M2L
                    # are removed from the direct pass (the masked m2l
                    # adds their far-field instead)
                    keep = 1.0 - offset_skip[tuple(d)].astype(F32)
                    w = w * keep.reshape(grid.cdim)[..., None, None]

                F = softened_force_factor(r2, H)
                if periodic_truncation and r_s > 0:
                    F = F * truncation_factor(r2, r_s_inv)
                gmF = jnp.float32(G) * m_j * F * w
                acc = acc - jnp.stack(
                    [jnp.sum(gmF * dx[k], axis=-1) for k in range(3)],
                    axis=-1)
                # potential: softened (kernel_grav_pot_eval) and, for
                # periodic runs, erfc-truncated to match the mesh split
                P = softened_pot_factor(r2, H)
                if periodic_truncation and r_s > 0:
                    P = P * pot_truncation_factor(r2, r_s_inv)
                pot = pot - jnp.sum(jnp.float32(G) * m_j * P * w, axis=-1)

        outs.append((_flat_view(grid, acc) * si["mask"][..., None],
                     _flat_view(grid, pot) * si["mask"]))
    return outs
