"""Riemann solvers for the finite-volume (Gizmo) schemes — pure JAX.

Re-derivation of src/riemann/ (riemann_exact.h, riemann_hllc.h,
riemann_trrs.h, riemann_vacuum.h): batched, branchless (jnp.where)
solvers for the gamma-law gas,

  * ``exact_flux``  — Toro's exact solver (Newton iteration on p*,
    solution sampled at x/t = 0; riemann_exact.h:308 riemann_solver_solve)
  * ``hllc_flux``   — HLLC approximate flux (riemann_hllc.h:36)
  * ``trrs_flux``   — Two-Rarefaction approximation (riemann_trrs.h)

All take primitive states W = (rho, vx, vy, vz, P) as tuples of arrays,
the interface unit normal n (3 arrays) and the interface velocity vij,
returning the five conserved fluxes (mass, momx, momy, momz, energy) in
the lab frame — the contract of riemann_solve_for_flux that the Gizmo
force loops consume (hydro/Gizmo/MFV/hydro_iact.h flux exchange).

Vacuum states (including vacuum generation, Toro 4.6) are handled
branchlessly in every solver, matching riemann_vacuum.h.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

F32 = jnp.float32


def _soundspeed(rho, P, gamma):
    return jnp.sqrt(gamma * P / jnp.maximum(rho, 1e-30))


def _fb(p, rho_k, P_k, a_k, gamma):
    """One-sided pressure function f_k(p) (riemann_fb, riemann_exact.h:52):
    shock branch for p > P_k, rarefaction branch otherwise."""
    A = 2.0 / ((gamma + 1.0) * jnp.maximum(rho_k, 1e-30))
    B = (gamma - 1.0) / (gamma + 1.0) * P_k
    shock = (p - P_k) * jnp.sqrt(A / jnp.maximum(p + B, 1e-30))
    Pk_safe = jnp.maximum(P_k, 1e-30)
    rare = (2.0 * a_k / (gamma - 1.0)
            * ((jnp.maximum(p, 0.0) / Pk_safe)
               ** ((gamma - 1.0) / (2.0 * gamma)) - 1.0))
    return jnp.where(p > P_k, shock, rare)


def _fprimeb(p, rho_k, P_k, a_k, gamma):
    """df_k/dp (riemann_fprimeb, riemann_exact.h:93)."""
    A = 2.0 / ((gamma + 1.0) * jnp.maximum(rho_k, 1e-30))
    B = (gamma - 1.0) / (gamma + 1.0) * P_k
    pB = jnp.maximum(p + B, 1e-30)
    shock = jnp.sqrt(A / pB) * (1.0 - 0.5 * (p - P_k) / pB)
    Pk_safe = jnp.maximum(P_k, 1e-30)
    rare = 1.0 / (jnp.maximum(rho_k, 1e-30) * a_k) \
        * (jnp.maximum(p, 1e-30) / Pk_safe) ** (-(gamma + 1.0)
                                                / (2.0 * gamma))
    return jnp.where(p > P_k, shock, rare)


def _guess_p(rhoL, PL, aL, uL, rhoR, PR, aR, uR, gamma):
    """Initial p* guess (riemann_guess_p, riemann_exact.h:149): adaptive
    PVRS / two-rarefaction / two-shock."""
    pmin = jnp.minimum(PL, PR)
    pmax = jnp.maximum(PL, PR)
    qmax = pmax / jnp.maximum(pmin, 1e-30)
    ppv = 0.5 * (PL + PR) - 0.125 * (uR - uL) * (rhoL + rhoR) * (aL + aR)
    ppv = jnp.maximum(ppv, 1e-8)

    # two-rarefaction
    gm1_2g = (gamma - 1.0) / (2.0 * gamma)
    base = (aL + aR - 0.5 * (gamma - 1.0) * (uR - uL)) / jnp.maximum(
        aL / jnp.maximum(PL, 1e-30) ** gm1_2g
        + aR / jnp.maximum(PR, 1e-30) ** gm1_2g, 1e-30)
    p_tr = jnp.maximum(base, 0.0) ** (1.0 / gm1_2g)

    # two-shock with ppv
    AL = 2.0 / ((gamma + 1.0) * jnp.maximum(rhoL, 1e-30))
    BL = (gamma - 1.0) / (gamma + 1.0) * PL
    AR = 2.0 / ((gamma + 1.0) * jnp.maximum(rhoR, 1e-30))
    BR = (gamma - 1.0) / (gamma + 1.0) * PR
    gL = jnp.sqrt(AL / jnp.maximum(ppv + BL, 1e-30))
    gR = jnp.sqrt(AR / jnp.maximum(ppv + BR, 1e-30))
    p_ts = (gL * PL + gR * PR - (uR - uL)) / jnp.maximum(gL + gR, 1e-30)

    use_pv = (qmax <= 2.0) & (pmin <= ppv) & (ppv <= pmax)
    p0 = jnp.where(use_pv, ppv,
                   jnp.where(ppv < pmin, p_tr, jnp.maximum(p_ts, 1e-8)))
    return jnp.maximum(p0, 1e-8)


def _solve_pstar(rhoL, PL, aL, uL, rhoR, PR, aR, uR, gamma,
                 n_iter: int = 30):
    """Newton iteration for the star pressure (the reference uses Brent,
    riemann_exact.h:200; safeguarded Newton on the monotone convex f(p)
    converges for the gamma-law gas and maps to fixed-trip-count SIMD)."""
    du = uR - uL

    def f(p):
        return (_fb(p, rhoL, PL, aL, gamma)
                + _fb(p, rhoR, PR, aR, gamma) + du)

    p = _guess_p(rhoL, PL, aL, uL, rhoR, PR, aR, uR, gamma)

    def body(_, p):
        fp = f(p)
        fpr = _fprimeb(p, rhoL, PL, aL, gamma) \
            + _fprimeb(p, rhoR, PR, aR, gamma)
        p_new = p - fp / jnp.maximum(fpr, 1e-30)
        # negative Newton step overshoot: halve instead (p stays > 0)
        return jnp.where(p_new > 0.0, p_new, 0.5 * p)

    p = jax.lax.fori_loop(0, n_iter, body, p)
    ustar = 0.5 * (uL + uR) + 0.5 * (_fb(p, rhoR, PR, aR, gamma)
                                     - _fb(p, rhoL, PL, aL, gamma))
    return p, ustar


def _sample_half(rhoL, PL, aL, uL, rhoR, PR, aR, uR, pstar, ustar, gamma):
    """Sample the solution at x/t = 0 (Toro 4.5; riemann_exact.h:308
    riemann_solver_solve).  Returns (rho_half, u_half, P_half) along the
    normal; tangential velocities upwind on sign(ustar)."""
    gp1 = gamma + 1.0
    gm1 = gamma - 1.0

    def side(rho_k, P_k, a_k, u_k, sgn):
        """sgn=+1 for the left family, -1 for the right."""
        P_safe = jnp.maximum(P_k, 1e-30)
        pr = pstar / P_safe
        # shock branch
        S_shock = u_k - sgn * a_k * jnp.sqrt(
            0.5 * gp1 / gamma * pr + 0.5 * gm1 / gamma)
        rho_shock = rho_k * (pr + gm1 / gp1) / (gm1 / gp1 * pr + 1.0)
        in_shock_star = sgn * S_shock < 0.0
        rho_s = jnp.where(in_shock_star, rho_shock, rho_k)
        u_s = jnp.where(in_shock_star, ustar, u_k)
        P_s = jnp.where(in_shock_star, pstar, P_k)
        # rarefaction branch
        a_star = a_k * jnp.maximum(pr, 0.0) ** (gm1 / (2.0 * gamma))
        S_head = u_k - sgn * a_k
        S_tail = ustar - sgn * a_star
        # fan state at xi=0
        fac = 2.0 / gp1 + sgn * gm1 / (gp1 * a_k) * u_k
        fac = jnp.maximum(fac, 1e-10)
        rho_fan = rho_k * fac ** (2.0 / gm1)
        u_fan = 2.0 / gp1 * (sgn * a_k + 0.5 * gm1 * u_k)
        P_fan = P_k * fac ** (2.0 * gamma / gm1)
        rho_star_r = rho_k * jnp.maximum(pr, 0.0) ** (1.0 / gamma)
        rho_r = jnp.where(sgn * S_head > 0.0, rho_k,
                          jnp.where(sgn * S_tail > 0.0, rho_fan,
                                    rho_star_r))
        u_r = jnp.where(sgn * S_head > 0.0, u_k,
                        jnp.where(sgn * S_tail > 0.0, u_fan, ustar))
        P_r = jnp.where(sgn * S_head > 0.0, P_k,
                        jnp.where(sgn * S_tail > 0.0, P_fan, pstar))
        shock = pstar > P_k
        return (jnp.where(shock, rho_s, rho_r),
                jnp.where(shock, u_s, u_r),
                jnp.where(shock, P_s, P_r))

    rhoLh, uLh, PLh = side(rhoL, PL, aL, uL, 1.0)
    rhoRh, uRh, PRh = side(rhoR, PR, aR, uR, -1.0)
    left = ustar >= 0.0
    return (jnp.where(left, rhoLh, rhoRh),
            jnp.where(left, uLh, uRh),
            jnp.where(left, PLh, PRh))


def _sample_vacuum(rhoL, PL, aL, uL, rhoR, PR, aR, uR, gamma):
    """Vacuum Riemann sampling at x/t = 0 (riemann_solve_vacuum,
    riemann_vacuum.h:56; Toro 4.6).  Returns (rho, u, P, take_left) where
    take_left selects which side's tangential velocities apply."""
    gp1 = gamma + 1.0
    gm1 = gamma - 1.0
    t2gm1 = 2.0 / gm1
    t2gp1 = 2.0 / gp1
    gm1gp1 = gm1 / gp1

    vac_L = rhoL <= 0.0   # left state is vacuum
    vac_R = rhoR <= 0.0

    # --- right vacuum: left fan expands into it ---------------------------
    fanL = jnp.maximum(t2gp1 + gm1gp1 / jnp.maximum(aL, 1e-30) * uL,
                       0.0)
    rho_Lfan = rhoL * fanL ** t2gm1
    P_Lfan = PL * fanL ** (t2gm1 * gamma)
    u_Lfan = t2gp1 * (aL + 0.5 * gm1 * uL)
    SL_vac = uL + t2gm1 * aL      # front of the expansion
    rv_rho = jnp.where(uL < aL,
                       jnp.where(SL_vac > 0.0, rho_Lfan, 0.0), rhoL)
    rv_u = jnp.where(uL < aL,
                     jnp.where(SL_vac > 0.0, u_Lfan, 0.0), uL)
    rv_P = jnp.where(uL < aL,
                     jnp.where(SL_vac > 0.0, P_Lfan, 0.0), PL)

    # --- left vacuum: right fan -------------------------------------------
    fanR = jnp.maximum(t2gp1 - gm1gp1 / jnp.maximum(aR, 1e-30) * uR,
                       0.0)
    rho_Rfan = rhoR * fanR ** t2gm1
    P_Rfan = PR * fanR ** (t2gm1 * gamma)
    u_Rfan = t2gp1 * (-aR + 0.5 * gm1 * uR)
    SR_vac = uR - t2gm1 * aR
    lv_rho = jnp.where(-aR < uR,
                       jnp.where(SR_vac < 0.0, rho_Rfan, 0.0), rhoR)
    lv_u = jnp.where(-aR < uR,
                     jnp.where(SR_vac < 0.0, u_Rfan, 0.0), uR)
    lv_P = jnp.where(-aR < uR,
                     jnp.where(SR_vac < 0.0, P_Rfan, 0.0), PR)

    # --- vacuum generation: two fans with vacuum in between ---------------
    S_starL = uL + t2gm1 * aL
    S_starR = uR - t2gm1 * aR
    gen_left_side = S_starL > 0.0      # xi=0 left of the vacuum region
    gen_right_side = S_starR < 0.0
    g_rho = jnp.where(gen_left_side,
                      jnp.where(aL > uL, rho_Lfan, rhoL),
                      jnp.where(gen_right_side,
                                jnp.where(-aR < uR, rho_Rfan, rhoR), 0.0))
    g_u = jnp.where(gen_left_side,
                    jnp.where(aL > uL, u_Lfan, uL),
                    jnp.where(gen_right_side,
                              jnp.where(-aR < uR, u_Rfan, uR), 0.0))
    g_P = jnp.where(gen_left_side,
                    jnp.where(aL > uL, P_Lfan, PL),
                    jnp.where(gen_right_side,
                              jnp.where(-aR < uR, P_Rfan, PR), 0.0))

    rho = jnp.where(vac_L & vac_R, 0.0,
                    jnp.where(vac_R, rv_rho,
                              jnp.where(vac_L, lv_rho, g_rho)))
    u = jnp.where(vac_L & vac_R, 0.0,
                  jnp.where(vac_R, rv_u,
                            jnp.where(vac_L, lv_u, g_u)))
    P = jnp.where(vac_L & vac_R, 0.0,
                  jnp.where(vac_R, rv_P,
                            jnp.where(vac_L, lv_P, g_P)))
    take_left = jnp.where(vac_R, True,
                          jnp.where(vac_L, False, gen_left_side))
    return rho, u, P, take_left


def _is_vacuum(rhoL, rhoR, uL, uR, aL, aR, gamma):
    """riemann_is_vacuum (riemann_vacuum.h:24): existing vacuum or
    vacuum generation 2(aL+aR)/(gamma-1) <= uR - uL."""
    gen = 2.0 / (gamma - 1.0) * (aL + aR) <= uR - uL
    return (rhoL <= 0.0) | (rhoR <= 0.0) | gen


def _flux_from_half(rho, un, vt, P, n, vij, gamma):
    """Conserved fluxes from the sampled half state (riemann_exact.h:567):
    interface-frame flux + lab-frame deboost.  ``vt`` is the full
    upwinded velocity vector (its normal component is replaced by un)."""
    v = [vt[k] + (un - (vt[0] * n[0] + vt[1] * n[1] + vt[2] * n[2]))
         * n[k] for k in range(3)]
    vdotn = un
    rho_un = rho * vdotn
    v2 = v[0] * v[0] + v[1] * v[1] + v[2] * v[2]
    e = P / ((gamma - 1.0) * jnp.maximum(rho, 1e-30)) + 0.5 * v2
    e = jnp.where(rho > 0.0, e, 0.0)
    F0 = rho_un
    F1 = rho_un * v[0] + P * n[0]
    F2 = rho_un * v[1] + P * n[1]
    F3 = rho_un * v[2] + P * n[2]
    F4 = rho_un * e + P * vdotn
    # deboost (riemann_hllc.h:160-170): energy first, then momenta
    vij2 = vij[0] * vij[0] + vij[1] * vij[1] + vij[2] * vij[2]
    F4 = F4 + vij[0] * F1 + vij[1] * F2 + vij[2] * F3 + 0.5 * vij2 * F0
    F1 = F1 + vij[0] * F0
    F2 = F2 + vij[1] * F0
    F3 = F3 + vij[2] * F0
    return (F0, F1, F2, F3, F4)


def exact_flux(WL, WR, n, vij, gamma: float = 5.0 / 3.0):
    """Exact Riemann flux at the interface (riemann_exact.h:567).

    WL/WR: (rho, vx, vy, vz, P) arrays; n: unit normal (3 arrays);
    vij: interface velocity (3 arrays).  Returns 5 conserved fluxes.
    """
    rhoL, PL = WL[0], WL[4]
    rhoR, PR = WR[0], WR[4]
    uL = WL[1] * n[0] + WL[2] * n[1] + WL[3] * n[2]
    uR = WR[1] * n[0] + WR[2] * n[1] + WR[3] * n[2]
    aL = _soundspeed(rhoL, PL, gamma)
    aR = _soundspeed(rhoR, PR, gamma)

    pstar, ustar = _solve_pstar(
        jnp.maximum(rhoL, 1e-30), jnp.maximum(PL, 1e-30), aL, uL,
        jnp.maximum(rhoR, 1e-30), jnp.maximum(PR, 1e-30), aR, uR, gamma)
    rho_h, u_h, P_h = _sample_half(rhoL, PL, aL, uL, rhoR, PR, aR, uR,
                                   pstar, ustar, gamma)
    take_left = ustar >= 0.0

    v_rho, v_u, v_P, v_left = _sample_vacuum(rhoL, PL, aL, uL,
                                             rhoR, PR, aR, uR, gamma)
    vac = _is_vacuum(rhoL, rhoR, uL, uR, aL, aR, gamma)
    rho_h = jnp.where(vac, v_rho, rho_h)
    u_h = jnp.where(vac, v_u, u_h)
    P_h = jnp.where(vac, v_P, P_h)
    take_left = jnp.where(vac, v_left, take_left)

    vt = tuple(jnp.where(take_left, WL[1 + k], WR[1 + k])
               for k in range(3))
    return _flux_from_half(rho_h, u_h, vt, P_h, n, vij, gamma)


def trrs_flux(WL, WR, n, vij, gamma: float = 5.0 / 3.0):
    """Two-Rarefaction approximate flux (riemann_trrs.h): closed-form p*
    assuming both waves are rarefactions, then the same sampling."""
    rhoL, PL = WL[0], WL[4]
    rhoR, PR = WR[0], WR[4]
    uL = WL[1] * n[0] + WL[2] * n[1] + WL[3] * n[2]
    uR = WR[1] * n[0] + WR[2] * n[1] + WR[3] * n[2]
    aL = _soundspeed(rhoL, PL, gamma)
    aR = _soundspeed(rhoR, PR, gamma)

    gm1_2g = (gamma - 1.0) / (2.0 * gamma)
    PLz = jnp.maximum(PL, 1e-30) ** gm1_2g
    PRz = jnp.maximum(PR, 1e-30) ** gm1_2g
    num = aL + aR - 0.5 * (gamma - 1.0) * (uR - uL)
    den = aL / PLz + aR / PRz
    pstar = jnp.maximum(num / jnp.maximum(den, 1e-30),
                        0.0) ** (1.0 / gm1_2g)
    ustar = 0.5 * (uL + uR) + 0.5 * (
        _fb(pstar, rhoR, PR, aR, gamma) - _fb(pstar, rhoL, PL, aL, gamma))

    rho_h, u_h, P_h = _sample_half(rhoL, PL, aL, uL, rhoR, PR, aR, uR,
                                   pstar, ustar, gamma)
    take_left = ustar >= 0.0
    v_rho, v_u, v_P, v_left = _sample_vacuum(rhoL, PL, aL, uL,
                                             rhoR, PR, aR, uR, gamma)
    vac = _is_vacuum(rhoL, rhoR, uL, uR, aL, aR, gamma)
    rho_h = jnp.where(vac, v_rho, rho_h)
    u_h = jnp.where(vac, v_u, u_h)
    P_h = jnp.where(vac, v_P, P_h)
    take_left = jnp.where(vac, v_left, take_left)
    vt = tuple(jnp.where(take_left, WL[1 + k], WR[1 + k])
               for k in range(3))
    return _flux_from_half(rho_h, u_h, vt, P_h, n, vij, gamma)


def hllc_flux(WL, WR, n, vij, gamma: float = 5.0 / 3.0):
    """HLLC approximate flux (riemann_hllc.h:36), vacuum falling back to
    the exact vacuum solver like the reference."""
    rhoL, PL = WL[0], WL[4]
    rhoR, PR = WR[0], WR[4]
    uL = WL[1] * n[0] + WL[2] * n[1] + WL[3] * n[2]
    uR = WR[1] * n[0] + WR[2] * n[1] + WR[3] * n[2]
    rhoLinv = jnp.where(rhoL > 0.0, 1.0 / jnp.maximum(rhoL, 1e-30), 0.0)
    rhoRinv = jnp.where(rhoR > 0.0, 1.0 / jnp.maximum(rhoR, 1e-30), 0.0)
    aL = jnp.sqrt(gamma * PL * rhoLinv)
    aR = jnp.sqrt(gamma * PR * rhoRinv)

    # pressure estimate + wave speeds
    rhobar = rhoL + rhoR
    abar = aL + aR
    pPVRS = 0.5 * ((PL + PR) - 0.25 * (uR - uL) * rhobar * abar)
    pstar = jnp.maximum(0.0, pPVRS)
    qL = jnp.where(
        (pstar > PL) & (PL > 0.0),
        jnp.sqrt(1.0 + 0.5 * (gamma + 1.0) / gamma
                 * (pstar / jnp.maximum(PL, 1e-30) - 1.0)), 1.0)
    qR = jnp.where(
        (pstar > PR) & (PR > 0.0),
        jnp.sqrt(1.0 + 0.5 * (gamma + 1.0) / gamma
                 * (pstar / jnp.maximum(PR, 1e-30) - 1.0)), 1.0)
    SLmuL = -aL * qL
    SRmuR = aR * qR
    Sstar = (PR - PL + rhoL * uL * SLmuL - rhoR * uR * SRmuR) \
        / jnp.maximum(jnp.abs(rhoL * SLmuL - rhoR * SRmuR), 1e-30) \
        * jnp.sign(rhoL * SLmuL - rhoR * SRmuR)

    # left-of-contact flux
    rhoLuL = rhoL * uL
    v2L = WL[1] ** 2 + WL[2] ** 2 + WL[3] ** 2
    eL = PL * rhoLinv / (gamma - 1.0) + 0.5 * v2L
    SL = SLmuL + uL
    starfacL = SLmuL / jnp.where(jnp.abs(SL - Sstar) > 1e-30, SL - Sstar,
                                 1e-30)
    rhoLSL = rhoL * SL
    SstarmuL = Sstar - uL
    rhoLSLstarfac = rhoLSL * (starfacL - 1.0)
    rhoLSLSstarmuL = rhoLSL * SstarmuL * starfacL
    addL = (SL < 0.0).astype(aL.dtype)
    FL0 = rhoLuL + addL * rhoLSLstarfac
    FL1 = rhoLuL * WL[1] + PL * n[0] + addL * (
        rhoLSLstarfac * WL[1] + rhoLSLSstarmuL * n[0])
    FL2 = rhoLuL * WL[2] + PL * n[1] + addL * (
        rhoLSLstarfac * WL[2] + rhoLSLSstarmuL * n[1])
    FL3 = rhoLuL * WL[3] + PL * n[2] + addL * (
        rhoLSLstarfac * WL[3] + rhoLSLSstarmuL * n[2])
    FL4 = rhoLuL * eL + PL * uL + addL * (
        rhoLSLstarfac * eL + rhoLSLSstarmuL
        * (Sstar + PL / jnp.where(jnp.abs(rhoL * SLmuL) > 1e-30,
                                  rhoL * SLmuL, 1e-30)))

    # right-of-contact flux
    rhoRuR = rhoR * uR
    v2R = WR[1] ** 2 + WR[2] ** 2 + WR[3] ** 2
    eR = PR * rhoRinv / (gamma - 1.0) + 0.5 * v2R
    SR = SRmuR + uR
    starfacR = SRmuR / jnp.where(jnp.abs(SR - Sstar) > 1e-30, SR - Sstar,
                                 1e-30)
    rhoRSR = rhoR * SR
    SstarmuR = Sstar - uR
    rhoRSRstarfac = rhoRSR * (starfacR - 1.0)
    rhoRSRSstarmuR = rhoRSR * SstarmuR * starfacR
    addR = (SR > 0.0).astype(aR.dtype)
    FR0 = rhoRuR + addR * rhoRSRstarfac
    FR1 = rhoRuR * WR[1] + PR * n[0] + addR * (
        rhoRSRstarfac * WR[1] + rhoRSRSstarmuR * n[0])
    FR2 = rhoRuR * WR[2] + PR * n[1] + addR * (
        rhoRSRstarfac * WR[2] + rhoRSRSstarmuR * n[1])
    FR3 = rhoRuR * WR[3] + PR * n[2] + addR * (
        rhoRSRstarfac * WR[3] + rhoRSRSstarmuR * n[2])
    FR4 = rhoRuR * eR + PR * uR + addR * (
        rhoRSRstarfac * eR + rhoRSRSstarmuR
        * (Sstar + PR / jnp.where(jnp.abs(rhoR * SRmuR) > 1e-30,
                                  rhoR * SRmuR, 1e-30)))

    left = Sstar >= 0.0
    F0 = jnp.where(left, FL0, FR0)
    F1 = jnp.where(left, FL1, FR1)
    F2 = jnp.where(left, FL2, FR2)
    F3 = jnp.where(left, FL3, FR3)
    F4 = jnp.where(left, FL4, FR4)

    # vacuum fallback (riemann_hllc.h:63): exact vacuum flux
    vac = _is_vacuum(rhoL, rhoR, uL, uR, aL, aR, gamma)
    v_rho, v_u, v_P, v_left = _sample_vacuum(rhoL, PL, aL, uL,
                                             rhoR, PR, aR, uR, gamma)
    vt = tuple(jnp.where(v_left, WL[1 + k], WR[1 + k]) for k in range(3))
    VF = _flux_from_half(v_rho, v_u, vt, v_P, n,
                         (jnp.zeros_like(v_u),) * 3, gamma)
    F0 = jnp.where(vac, VF[0], F0)
    F1 = jnp.where(vac, VF[1], F1)
    F2 = jnp.where(vac, VF[2], F2)
    F3 = jnp.where(vac, VF[3], F3)
    F4 = jnp.where(vac, VF[4], F4)

    # deboost to the lab frame (riemann_hllc.h:160)
    vij2 = vij[0] * vij[0] + vij[1] * vij[1] + vij[2] * vij[2]
    F4 = F4 + vij[0] * F1 + vij[1] * F2 + vij[2] * F3 + 0.5 * vij2 * F0
    F1 = F1 + vij[0] * F0
    F2 = F2 + vij[1] * F0
    F3 = F3 + vij[2] * F0
    both_vac = (rhoL <= 0.0) & (rhoR <= 0.0)
    return tuple(jnp.where(both_vac, 0.0, F)
                 for F in (F0, F1, F2, F3, F4))


def _middle_flux_from(pstar, ustar, vac, n, vij):
    PM = jnp.where(vac, 0.0, pstar)
    vM = jnp.where(vac, 0.0, ustar)
    vface = vij[0] * n[0] + vij[1] * n[1] + vij[2] * n[2]
    zero = jnp.zeros_like(PM)
    return (zero, PM * n[0], PM * n[1], PM * n[2], (vM + vface) * PM)


def middle_state_flux(WL, WR, n, vij, gamma: float = 5.0 / 3.0,
                      n_iter: int = 12):
    """Lagrangian middle-state flux for MFM
    (riemann_solve_for_middle_state_flux, riemann_exact.h:626): only the
    star-region pressure PM and normal velocity vM matter — no mass flux
    crosses the (comoving) interface.  Returns the 5 conserved fluxes
    (0, PM*n, (vM+vface)*PM); vacuum pairs yield zero flux."""
    rhoL, PL = WL[0], WL[4]
    rhoR, PR = WR[0], WR[4]
    uL = WL[1] * n[0] + WL[2] * n[1] + WL[3] * n[2]
    uR = WR[1] * n[0] + WR[2] * n[1] + WR[3] * n[2]
    aL = _soundspeed(rhoL, PL, gamma)
    aR = _soundspeed(rhoR, PR, gamma)

    pstar, ustar = _solve_pstar(
        jnp.maximum(rhoL, 1e-30), jnp.maximum(PL, 1e-30), aL, uL,
        jnp.maximum(rhoR, 1e-30), jnp.maximum(PR, 1e-30), aR, uR, gamma,
        n_iter=n_iter)

    vac = (rhoL <= 0.0) | (rhoR <= 0.0) \
        | _is_vacuum(rhoL, rhoR, uL, uR, aL, aR, gamma)
    return _middle_flux_from(pstar, ustar, vac, n, vij)


def trrs_middle_state_flux(WL, WR, n, vij, gamma: float = 5.0 / 3.0):
    """Two-rarefaction middle-state flux (riemann_trrs.h:223): closed-form
    p*/u* — one pow chain instead of a Newton loop, the cheap MFM path."""
    rhoL, PL = WL[0], WL[4]
    rhoR, PR = WR[0], WR[4]
    uL = WL[1] * n[0] + WL[2] * n[1] + WL[3] * n[2]
    uR = WR[1] * n[0] + WR[2] * n[1] + WR[3] * n[2]
    aL = _soundspeed(rhoL, PL, gamma)
    aR = _soundspeed(rhoR, PR, gamma)

    gm1_2g = (gamma - 1.0) / (2.0 * gamma)
    PLz = jnp.maximum(PL, 1e-30) ** gm1_2g
    PRz = jnp.maximum(PR, 1e-30) ** gm1_2g
    num = aL + aR - 0.5 * (gamma - 1.0) * (uR - uL)
    den = aL / PLz + aR / PRz
    pstar = jnp.maximum(num / jnp.maximum(den, 1e-30),
                        0.0) ** (1.0 / gm1_2g)
    ustar = 0.5 * (uL + uR) + 0.5 * (
        _fb(pstar, rhoR, PR, aR, gamma) - _fb(pstar, rhoL, PL, aL, gamma))

    vac = (rhoL <= 0.0) | (rhoR <= 0.0) \
        | _is_vacuum(rhoL, rhoR, uL, uR, aL, aR, gamma)
    return _middle_flux_from(pstar, ustar, vac, n, vij)


SOLVERS = {"exact": exact_flux, "hllc": hllc_flux, "trrs": trrs_flux}
