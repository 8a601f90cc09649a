"""SPHM1RT: two-moment M1 radiative transfer on SPH operators.

Reference src/rt/SPHM1RT/ (rt.h, rt_iact.h — Chan et al. 2021): unlike
rt/GEAR's finite-volume face exchange (rt/gear.py here), SPHM1RT
discretises the moment equations directly with the symmetric SPH
difference operators on PER-MASS radiation variables
(xi = E/rho, f = F/rho; rt_struct.h urad/frad):

    dxi_i/dt = - sum_j m_j (f_i/rho_i^2 dWdr_i + f_j/rho_j^2 dWdr_j) . rhat
    df_i /dt = - c^2 sum_j m_j (P_i/rho_i^2 dWdr_i + P_j/rho_j^2 dWdr_j) . rhat

(the pressure-equation form of the SPH momentum operator, so photon
energy sum m xi is conserved by pair antisymmetry), plus the scheme's
artificial dissipation — a conduction-like exchange with signal speed
c_red that plays the role the Riemann solver plays in the
finite-volume schemes (rt_iact.h dissipation terms, Chan+2021 eq. 29-31).

The M1 closure, injection and thermochemistry are shared with the GEAR
module (rt/m1.py pressure_tensor; gear.rt_inject / rt_thermochemistry
are scheme-independent).  State layout is identical (rt_E, rt_F as
energy densities), so the two schemes are drop-in interchangeable.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..grid.cellgrid import CellGrid
from ..ops.stencil import (_apply_offsets, _bi, _bj, _flat_view,
                           _grid_view, _pair_geometry_shift, _sanitize)
from .m1 import pressure_tensor

F32 = jnp.float32

# (row, col) of the 6 unique components of the symmetric Eddington tensor
_SYM6 = ((0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2))


def sphm1_transport_loop(grid: CellGrid, s: Dict, p, rt, dt,
                         alpha_diss: float = 1.0,
                         use_scan: bool = False) -> Dict:
    """One SPHM1RT transport step for every photon group.

    ``rt`` is the shared RTParams; ``alpha_diss`` scales the artificial
    dissipation (rt_parameters.h SPHM1RT difffurther/difffrac analog).
    """
    g = lambda name: _grid_view(grid, s[name])
    mask, off = g("mask"), g("off")
    h = _sanitize(mask, g("h"))
    hinv = 1.0 / h
    rho = _sanitize(mask, g("rho"))
    rho_inv = 1.0 / jnp.maximum(rho, 1e-30)
    m = g("m")

    gamma2 = jnp.float32(p.kernel.gamma2)
    hi = _bi(h)
    hinv_i = _bi(hinv)
    c_red = float(rt.c_red)
    c2 = c_red * c_red
    al = jnp.float32(alpha_diss * c_red)

    out = dict(s)
    G = rt.ngroups
    new_E, new_F = [], []
    for grp in range(G):
        E = s["rt_E"][..., grp]
        F = s["rt_F"][..., grp, :]
        # per-mass variables and P/rho^2 (precomputed per particle)
        xi = E / jnp.maximum(s["rho"], 1e-30)
        f = F / jnp.maximum(s["rho"], 1e-30)[..., None]
        P = pressure_tensor(E, tuple(F[..., k] for k in range(3)), c_red)
        rr2 = (1.0 / jnp.maximum(s["rho"], 1e-30)) ** 2
        P6 = {f"P{a}{b}": P[a][b] * rr2 for a, b in _SYM6}

        j_fields = {"off": off, "mask": mask, "h": h,
                    "rho": _grid_view(grid, s["rho"]),
                    "m": m,
                    "xi": _grid_view(grid, xi),
                    "f": _grid_view(grid, f),
                    **{k: _grid_view(grid, v) for k, v in P6.items()}}
        acc0 = tuple(jnp.zeros_like(h) for _ in range(4))
        xi_i = _bi(_grid_view(grid, xi))
        f_i = _grid_view(grid, f)
        P6_i = {k: _bi(_grid_view(grid, v)) for k, v in P6.items()}
        rho2_inv_i = _bi(rho_inv * rho_inv)
        rho_i = _bi(rho)
        m_j_side = None

        def accumulate(acc, jf, shift):
            dx, r2 = _pair_geometry_shift(off, jf["off"], shift)
            hj = _bj(jf["h"])
            hmax = jnp.maximum(hi, hj)
            ok = (_bj(jf["mask"]) > 0) & (r2 > 0) \
                & (r2 < gamma2 * hmax * hmax)
            w = ok.astype(F32)
            r_inv = jnp.where(r2 > 0, jax.lax.rsqrt(
                jnp.maximum(r2, 1e-38)), 0.0)
            r = r2 * r_inv
            _, wi_dx = p.kernel.deval(r * hinv_i)
            hinv_j = 1.0 / hj
            _, wj_dx = p.kernel.deval(r * hinv_j)
            wi_dr = hinv_i ** 4 * wi_dx          # dW/dr, negative
            wj_dr = hinv_j ** 4 * wj_dx
            rhat = tuple(d * r_inv for d in dx)  # points j -> i

            m_j = _bj(jf["m"])
            rho_j = jnp.maximum(_bj(jf["rho"]), 1e-30)
            rho2_inv_j = 1.0 / (rho_j * rho_j)

            # energy: symmetric divergence of the per-mass flux
            fi_dot = sum(_bi(f_i[..., k]) * rhat[k] for k in range(3))
            fj_dot = sum(_bj(jf["f"][..., k]) * rhat[k]
                         for k in range(3))
            dxi = -m_j * (fi_dot * rho2_inv_i * wi_dr
                          + fj_dot * rho2_inv_j * wj_dr)

            # flux: divergence of the c^2 P/rho^2 tensor
            def Pdotr(P6side, k):
                tot = 0.0
                for (a, b) in _SYM6:
                    val = P6side[f"P{a}{b}"]
                    if a == k:
                        tot = tot + val * rhat[b]
                    if b == k and a != b:
                        tot = tot + val * rhat[a]
                return tot

            P6_j = {key: _bj(jf[key]) for key in P6}
            df = []
            for k in range(3):
                df.append(-c2 * m_j * (Pdotr(P6_i, k) * wi_dr
                                       + Pdotr(P6_j, k) * wj_dr))

            # artificial dissipation: conduction-like with v_sig = c_red
            # (Chan+2021 eq. 29; keeps the scheme stable where the bare
            # SPH operators are dispersive)
            wbar = 0.5 * (wi_dr + wj_dr)
            coef = al * (-2.0 * wbar) / (rho_i + rho_j)   # >= 0
            dxi = dxi + m_j * coef * (_bj(jf["xi"]) - xi_i)
            for k in range(3):
                df[k] = df[k] + m_j * coef * (
                    _bj(jf["f"][..., k]) - _bi(f_i[..., k]))

            return (acc[0] + jnp.sum(dxi * w, axis=-1),
                    acc[1] + jnp.sum(df[0] * w, axis=-1),
                    acc[2] + jnp.sum(df[1] * w, axis=-1),
                    acc[3] + jnp.sum(df[2] * w, axis=-1))

        dxi, df0, df1, df2 = _apply_offsets(grid, j_fields, acc0,
                                            accumulate, use_scan)
        m_ok = s["mask"] > 0
        rho_f = jnp.maximum(s["rho"], 1e-30)
        xi_new = xi + dt * _flat_view(grid, dxi)
        f_new = f + dt * jnp.stack(
            [_flat_view(grid, d) for d in (df0, df1, df2)], -1)
        E_new = jnp.where(m_ok, jnp.maximum(xi_new * rho_f, 0.0), 0.0)
        F_new = f_new * rho_f[..., None]
        # unphysical-state fixup (rt_unphysical.h): |F| <= c_red E
        Fn = jnp.sqrt(jnp.sum(F_new ** 2, axis=-1))
        cap = c_red * E_new
        scale = jnp.where(Fn > cap, cap / jnp.maximum(Fn, 1e-38), 1.0)
        F_new = F_new * (scale * m_ok)[..., None]
        new_E.append(E_new)
        new_F.append(F_new)

    out["rt_E"] = jnp.stack(new_E, axis=-1)
    out["rt_F"] = jnp.stack(new_F, axis=-2)
    return out
