"""M1-closure moment algebra for radiative transfer.

Pure broadcastable functions (any leading shape): the Eddington pressure
tensor from the reduced flux (rt/GEAR/rt_getters.h:100-160, Levermore
1984 closure), the hyperbolic flux F(U) of the two-moment system
(rt_get_hyperbolic_flux, rt_getters.h:169-210), and the Global
Lax-Friedrichs interface flux (rt_riemann_GLF.h:52-80, Rosdahl+2013
eq. 27).  States are (E, F) with E the radiation energy density and F
the 3-tuple radiative flux density; everything is branchless.
"""

from __future__ import annotations

import jax.numpy as jnp


def pressure_tensor(E, F, c_red: float):
    """P_ij = D_ij E with the M1 Eddington tensor
    D = (1-chi)/2 I + (3chi-1)/2 n n,  chi = (3+4f^2)/(5+2 sqrt(4-3f^2)),
    f = |F|/(c E) clamped to [0, 1] (rt_getters.h:100-160).

    Returns a 3x3 nested tuple of arrays.
    """
    Fnorm = jnp.sqrt(F[0] ** 2 + F[1] ** 2 + F[2] ** 2)
    has_flux = Fnorm > 0.0
    E_safe = jnp.maximum(E, 1e-38)
    f = jnp.minimum(1.0, Fnorm / (c_red * E_safe))
    f2 = f * f
    chi = (3.0 + 4.0 * f2) / (5.0 + 2.0 * jnp.sqrt(
        jnp.maximum(4.0 - 3.0 * f2, 0.0)))
    Fn_inv = jnp.where(has_flux, 1.0 / jnp.maximum(Fnorm, 1e-38), 0.0)
    n = tuple(Fk * Fn_inv for Fk in F)

    aniso = 0.5 * (3.0 * chi - 1.0)
    iso = jnp.where(has_flux, 0.5 * (1.0 - chi), 1.0 / 3.0)
    P = []
    for i in range(3):
        row = []
        for j in range(3):
            val = aniso * n[i] * n[j] * has_flux
            if i == j:
                val = val + iso
            row.append(val * E)
        P.append(tuple(row))
    return tuple(P)


def hyperbolic_flux(E, F, c_red: float):
    """F(U) of dU/dt + div F(U) = 0 for U = (E, F):
    F(U) = (F, c^2 P) (rt_getters.h:169-210).  Returns a 4-tuple of
    3-tuples (rows of the 4x3 flux matrix)."""
    P = pressure_tensor(E, F, c_red)
    c2 = c_red * c_red
    zero = jnp.zeros_like(E)
    ok = E > 0.0
    row0 = tuple(jnp.where(ok, Fk, zero) for Fk in F)
    rows = [row0]
    for i in range(3):
        rows.append(tuple(jnp.where(ok, c2 * P[i][j], zero)
                          for j in range(3)))
    return tuple(rows)


def glf_flux(EL, FL, ER, FR, n_unit, c_red: float):
    """Global Lax-Friedrichs interface flux (rt_riemann_GLF.h:52-80):
    flux = 0.5 (F(UL).n + F(UR).n) - 0.5 c (UR - UL).
    Returns a 4-tuple (energy flux, 3 momentum-flux components)."""
    hfL = hyperbolic_flux(EL, FL, c_red)
    hfR = hyperbolic_flux(ER, FR, c_red)
    UL = (EL,) + tuple(FL)
    UR = (ER,) + tuple(FR)
    out = []
    for q in range(4):
        fL = sum(hfL[q][k] * n_unit[k] for k in range(3))
        fR = sum(hfR[q][k] * n_unit[k] for k in range(3))
        out.append(0.5 * (fL + fR - c_red * (UR[q] - UL[q])))
    return tuple(out)
