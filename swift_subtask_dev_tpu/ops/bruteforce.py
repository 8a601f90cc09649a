"""Brute-force O(N^2) SPH reference loops — the test oracle.

Mirrors the reference's testing strategy (tests/test27cells.c:372,
tests/testActivePair.c): the production neighbour engine is validated
against an all-pairs evaluation of the *same* pairwise term functions on
small particle sets.  Operates on flat (N,) arrays with absolute positions
and a periodic box.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from ..models.sph.sphenix import CosmoFactors, SPHENIXParams

F32 = jnp.float32


def _pair_geometry(pos, box):
    """Minimum-image dx components and r2 for all (i, j): shapes (N, N)."""
    dx = []
    for k in range(3):
        d = pos[:, None, k] - pos[None, :, k]
        if box is not None:
            b = jnp.float32(box[k])
            d = d - b * jnp.round(d / b)
        dx.append(d)
    r2 = dx[0] ** 2 + dx[1] ** 2 + dx[2] ** 2
    return tuple(dx), r2


def density_bruteforce(p: SPHENIXParams, pos, h, m, v, box=None, u=None
                       ) -> Dict[str, jnp.ndarray]:
    """All-pairs density accumulators (pre-end_density).

    ``u`` feeds schemes whose density loop smooths u-weighted quantities
    (DENSITY_NEEDS_U, e.g. PressureEnergy's pressure_bar terms)."""
    dx, r2 = _pair_geometry(pos, box)
    hi = h[:, None]
    ok = (r2 > 0) & (r2 < jnp.float32(p.kernel.gamma2) * hi * hi)
    w = ok.astype(F32)
    dv = tuple(v[:, None, k] - v[None, :, k] for k in range(3))
    uj = (u[None, :],) if getattr(p.mod, "DENSITY_NEEDS_U", False) else ()
    t = p.mod.density_terms(p, dx, r2, 1.0 / hi, m[None, :], dv, *uj)
    out = {k: jnp.sum(val * w, axis=-1) for k, val in t.items()}
    res = {
        "rho": out["rho"], "rho_dh": out["rho_dh"], "wcount": out["wcount"],
        "wcount_dh": out["wcount_dh"], "div_v": out["div_v"],
        "rot_v": jnp.stack([out["rot_v0"], out["rot_v1"], out["rot_v2"]],
                           axis=-1),
    }
    for k in getattr(p.mod, "DENSITY_EXTRA_KEYS", ()):
        res[k] = out[k]
    return res


def gradient_bruteforce(p: SPHENIXParams, pos, h, m, v, u, rho, cs,
                        alpha_visc, v_sig0, a_max0, cosmo: CosmoFactors,
                        box=None, extra=None) -> Dict[str, jnp.ndarray]:
    """``extra``: {key: (N,) array} for the scheme's GRADIENT_J_EXTRA."""
    dx, r2 = _pair_geometry(pos, box)
    hi = h[:, None]
    ok = (r2 > 0) & (r2 < jnp.float32(p.kernel.gamma2) * hi * hi)
    w = ok.astype(F32)
    dv = tuple(v[:, None, k] - v[None, :, k] for k in range(3))
    sum_keys = tuple(getattr(p.mod, "GRADIENT_SUM_KEYS", ("laplace_u",)))
    args = []
    for k in getattr(p.mod, "GRADIENT_J_EXTRA", ()):
        args += [extra[k][:, None], extra[k][None, :]]
    t = p.mod.gradient_terms(
        p, dx, r2, 1.0 / hi, m[None, :], dv, u[:, None], u[None, :],
        1.0 / jnp.maximum(rho[None, :], 1e-30),
        cs[:, None], cs[None, :], alpha_visc[None, :], *args,
        cosmo=cosmo)
    out = {k: jnp.sum(t["sum"][k] * w, axis=-1) for k in sum_keys}
    out["v_sig"] = jnp.maximum(v_sig0, jnp.max(
        jnp.where(ok, t["max"]["v_sig"], -jnp.inf), axis=-1))
    out["alpha_visc_max_ngb"] = jnp.maximum(a_max0, jnp.max(
        jnp.where(ok, t["max"]["alpha_visc_max_ngb"], -jnp.inf),
        axis=-1))
    for k in getattr(p.mod, "GRADIENT_MAX_KEYS", ()):
        out[k] = jnp.max(jnp.where(ok, t["max"][k], jnp.float32(-1e30)),
                         axis=-1)
    return out


def force_bruteforce(p: SPHENIXParams, pos, h, m, v, rho, P, cs, f_gradh,
                     balsara, alpha_visc, alpha_diff, u, v_sig0,
                     cosmo: CosmoFactors, box=None, extra=None
                     ) -> Dict[str, jnp.ndarray]:
    """``extra``: {key: (N,) array} for the scheme's FORCE_J_EXTRA."""
    dx, r2 = _pair_geometry(pos, box)
    hi = h[:, None]
    hj = h[None, :]
    range2 = jnp.float32(p.kernel.gamma2) * jnp.maximum(hi, hj) ** 2
    ok = (r2 > 0) & (r2 < range2)
    w = ok.astype(F32)
    dv = tuple(v[:, None, k] - v[None, :, k] for k in range(3))
    rho_s = jnp.maximum(rho, 1e-30)
    rhoinv = 1.0 / rho_s
    minv = 1.0 / m
    pr2 = P * rhoinv * rhoinv
    args = []
    for k in getattr(p.mod, "FORCE_J_EXTRA", ()):
        args += [extra[k][:, None], extra[k][None, :]]
    t = p.mod.force_terms(
        p, dx, r2, 1.0 / hi, 1.0 / hj, m[:, None], m[None, :],
        minv[:, None], minv[None, :], dv,
        rho_s[:, None], rho_s[None, :], rhoinv[:, None], rhoinv[None, :],
        pr2[:, None], pr2[None, :], P[:, None], P[None, :],
        cs[:, None], cs[None, :], f_gradh[:, None], f_gradh[None, :],
        balsara[:, None], balsara[None, :], alpha_visc[:, None],
        alpha_visc[None, :], alpha_diff[:, None], alpha_diff[None, :],
        u[:, None], u[None, :], *args, cosmo=cosmo)
    sums = {k: jnp.sum(val * w, axis=-1) for k, val in t["sum"].items()}
    res = {
        "a_hydro": jnp.stack([sums["a_hydro0"], sums["a_hydro1"],
                              sums["a_hydro2"]], axis=-1),
        "u_dt": sums["u_dt"],
        "h_dt": sums["h_dt"],
        "v_sig": jnp.maximum(v_sig0, jnp.max(
            jnp.where(ok, t["max"]["v_sig"], -jnp.inf), axis=-1)),
    }
    for k in getattr(p.mod, "FORCE_EXTRA_SUM_KEYS", ()):
        res[k] = sums[k]
    return res
