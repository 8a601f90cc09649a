"""GEAR-style M1 radiative transfer on the padded cell tiles.

Transport is a finite-volume flux exchange over SPH effective faces
(the scheme-agnostic face of rt/GEAR/rt_iact.h:282-289 — the reference
uses the Gizmo geometry matrix when well-conditioned and this SPH face
otherwise; here the SPH face is the default so RT rides ANY hydro
scheme), solved with the Global Lax-Friedrichs Riemann solver
(rt_riemann_GLF.h) at first order.  Injection deposits source photons
kernel-weighted onto neighbouring gas (rt_iact.h:55-190's psi weights,
without the octant machinery).  Thermochemistry is an explicit
hydrogen-only network (photoionization, case-B recombination,
collisional ionization, optional photoheating) replacing the reference's
grackle binding (rt_thermochemistry.h) — the regime of the reference's
Iliev-test examples.

State fields (all masked padded tiles):
  rt_E   (C, K, G)    — radiation energy density per group
  rt_F   (C, K, G, 3) — radiative flux density per group
  x_HI   (C, K)       — neutral-hydrogen fraction
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..grid.cellgrid import CellGrid
from ..ops.stencil import (_apply_offsets, _bi, _bj, _flat_view,
                           _grid_view, _pair_geometry_shift, _sanitize)
from .m1 import glf_flux

F32 = jnp.float32


@dataclass(frozen=True)
class RTParams:
    """RT parameter surface (GEARRT: YAML section; rt_properties.h).

    All quantities in internal units.  ``sigma``/``e_photon`` have one
    entry per photon group (rt_parameters.h RT_NGROUPS).
    """

    ngroups: int = 1
    c_red: float = 1.0          # reduced speed of light (f_reduce * c)
    CFL: float = 0.9            # rt CFL: dt_rt = CFL * h / c_red
    sigma: Tuple[float, ...] = (1.0,)      # HI cross-section per group
    e_photon: Tuple[float, ...] = (1.0,)   # mean photon energy per group
    X_H: float = 1.0            # hydrogen mass fraction
    m_p: float = 1.0            # proton mass (internal units)
    alpha_B: float = 0.0        # case-B recombination coefficient
    beta_coll: float = 0.0      # collisional ionization coefficient
    e_ion: float = 0.0          # ionization threshold (13.6 eV internal)
    heating: bool = False       # couple photoheating into u_dt
    chem_substeps: int = 4      # explicit network substeps per RT step
    src_h: float = 0.1          # injection kernel radius of point sources


def rt_init_state(s: Dict, rt: RTParams) -> Dict:
    """Attach zeroed radiation fields + fully neutral hydrogen."""
    C, K = s["mask"].shape
    G = rt.ngroups
    return {**s,
            "rt_E": jnp.zeros((C, K, G), F32),
            "rt_F": jnp.zeros((C, K, G, 3), F32),
            "x_HI": jnp.ones((C, K), F32) * s["mask"]}


def _volumes(s):
    """Particle 'cell' volumes V = m/rho (the Gizmo volume analog used by
    the SPH-face construction, rt_iact.h:236)."""
    return s["m"] / jnp.maximum(s["rho"], 1e-30)


def rt_transport_loop(grid: CellGrid, s: Dict, p, rt: RTParams,
                      dt, use_scan: bool = False) -> Dict:
    """One first-order GLF transport step for every photon group
    (runner_iact_rt_flux_common, rt_iact.h:208-360).

    Pair discovery is symmetric (r < gamma * max(h_i, h_j)) so the
    antisymmetric face + flux make the exchange exactly conservative in
    sum_i V_i E_i.  Accumulates i-side only; the per-group python loop
    unrolls at trace time (RT_NGROUPS is compile-time in the reference
    too)."""
    g = lambda name: _grid_view(grid, s[name])
    mask, off = g("mask"), g("off")
    h = _sanitize(mask, g("h"))
    hinv = 1.0 / h
    V = _sanitize(mask, _grid_view(grid, _volumes(s)))

    gamma2 = jnp.float32(p.kernel.gamma2)
    hi = _bi(h)
    hinv_i = _bi(hinv)
    Vi = _bi(V)
    c_red = float(rt.c_red)

    out = dict(s)
    G = rt.ngroups
    E_all = _grid_view(grid, s["rt_E"])
    F_all = _grid_view(grid, s["rt_F"])
    new_E, new_F = [], []
    for grp in range(G):
        E = E_all[..., grp]
        F = F_all[..., grp, :]
        j_fields = {"off": off, "mask": mask, "h": h, "V": V,
                    "E": E, "F": F}
        acc0 = tuple(jnp.zeros_like(h) for _ in range(4))

        def accumulate(acc, jf, shift):
            dx, r2 = _pair_geometry_shift(off, jf["off"], shift)
            hj = _bj(jf["h"])
            hmax = jnp.maximum(hi, hj)
            pair_ok = (_bj(jf["mask"]) > 0) & (r2 > 0) \
                & (r2 < gamma2 * hmax * hmax)
            w = pair_ok.astype(F32)

            r_inv = jnp.where(r2 > 0, jax.lax.rsqrt(
                jnp.maximum(r2, 1e-38)), 0.0)
            r = r2 * r_inv
            hinv_j = 1.0 / hj
            xi = r * hinv_i
            _, wi_dx = p.kernel.deval(xi)
            xj = r * hinv_j
            _, wj_dx = p.kernel.deval(xj)
            hidp1 = hinv_i ** 4
            hjdp1 = hinv_j ** 4
            Vj = _bj(jf["V"])
            # SPH effective face (rt_iact.h:282-289); Anorm_s > 0
            Anorm_s = -(hidp1 * Vi * Vi * wi_dx
                        + hjdp1 * Vj * Vj * wj_dx) * r_inv
            Anorm = Anorm_s * r
            n_unit = tuple(-d * r_inv for d in dx)  # points i -> j

            EL = _bi(E)
            ER = _bj(jf["E"])
            FL = tuple(_bi(F[..., k]) for k in range(3))
            FR = tuple(_bj(jf["F"][..., k]) for k in range(3))
            fl = glf_flux(EL, FL, ER, FR, n_unit, c_red)
            contrib = tuple(jnp.sum(Anorm * fq * w, axis=-1) for fq in fl)
            return tuple(a + c for a, c in zip(acc, contrib))

        dE, dF0, dF1, dF2 = _apply_offsets(grid, j_fields, acc0,
                                           accumulate, use_scan)
        Vinv = 1.0 / jnp.maximum(_flat_view(grid, V), 1e-30)
        m_ok = s["mask"] > 0
        E_new = s["rt_E"][..., grp] - dt * _flat_view(grid, dE) * Vinv
        F_new = s["rt_F"][..., grp, :] - dt * jnp.stack(
            [_flat_view(grid, d) for d in (dF0, dF1, dF2)],
            axis=-1) * Vinv[..., None]
        # unphysical-state fixup (rt_unphysical.h): E >= 0, |F| <= c E
        E_new = jnp.where(m_ok, jnp.maximum(E_new, 0.0), 0.0)
        Fn = jnp.sqrt(jnp.sum(F_new ** 2, axis=-1))
        cap = c_red * E_new
        scale = jnp.where(Fn > cap, cap / jnp.maximum(Fn, 1e-38), 1.0)
        F_new = F_new * (scale * m_ok)[..., None]
        new_E.append(E_new)
        new_F.append(F_new)

    out["rt_E"] = jnp.stack(new_E, axis=-1)
    out["rt_F"] = jnp.stack(new_F, axis=-2)
    return out


def _abs_positions(grid: CellGrid, off):
    """Absolute particle positions from cell-local offsets, traceable
    (the jit analog of cellgrid.global_positions)."""
    C = grid.C
    ncx, ncy, ncz = grid.cdim
    cid = jnp.arange(C, dtype=jnp.int32)
    ix = cid // (ncy * ncz)
    iy = (cid // ncz) % ncy
    iz = cid % ncz
    origin = jnp.stack([ix, iy, iz], axis=-1).astype(F32) \
        * jnp.asarray(grid.edge_arr, F32)
    return origin[:, None, :] + off


def rt_inject(grid: CellGrid, s: Dict, rt: RTParams, src_pos, src_L,
              dt) -> Dict:
    """Deposit dt * L of each point source kernel-weighted over its gas
    neighbours (the psi-weight deposition of rt_iact.h:55-190; sources
    are explicit (S, 3) positions — star particles in the reference,
    fixed emitters in its Iliev examples).  Normalised per source so the
    injected energy is exactly L*dt."""
    pos = _abs_positions(grid, s["off"])            # (C, K, 3)
    box = jnp.asarray(grid.box, F32)
    V = jnp.maximum(_volumes(s), 1e-30)
    m_ok = s["mask"] > 0
    E = s["rt_E"]
    hs = jnp.float32(rt.src_h)
    kern_gamma = jnp.float32(p_gamma_default)
    for si in range(src_pos.shape[0]):
        d = pos - jnp.asarray(src_pos[si], F32)
        d = d - box * jnp.round(d / box)            # periodic
        r = jnp.sqrt(jnp.sum(d * d, axis=-1))
        w = jnp.maximum(1.0 - r / (kern_gamma * hs), 0.0) ** 2 \
            * m_ok                                   # compact deposition
        wsum = jnp.maximum(jnp.sum(w), 1e-30)
        for grp in range(rt.ngroups):
            dE = src_L[si, grp] * dt * w / (wsum * V)
            E = E.at[..., grp].add(dE)
    return {**s, "rt_E": E}


p_gamma_default = 2.0  # deposition support in units of src_h


def rt_thermochemistry(s: Dict, rt: RTParams, dt) -> Dict:
    """Explicit H-only network + photon absorption
    (rt_thermochemistry.h semantics, grackle replaced):

      Gamma    = sum_g c σ_g E_g / e_γ,g        (per HI atom)
      dx_HI/dt = -x_HI (Gamma + β n_e) + α_B n_e x_HII
      dE_g/dt  = -c σ_g n_HI E_g                (absorption)
      du/dt   += sum_g c σ_g n_HI E_g (1 - e_ion/e_γ,g) / rho  [optional]

    Substepped with an exponential integrator: per substep the
    coefficients (n_e, Gamma) are frozen, giving dx/dt = -D x + R with
    D = Gamma + (β+α_B) n_e, R = α_B n_e, whose exact solution
    x(t) = R/D + (x0 − R/D) e^{−D t} is unconditionally stable even for
    photoionization rates ≫ 1/dt (the stiff regime the reference hands
    to grackle's implicit solve).  Net ionizations per substep are capped
    at the photons actually absorbed there (photon-conserving, the
    C2-Ray property) so I-fronts advance at the physical speed even when
    the front is unresolved."""
    m_ok = s["mask"] > 0
    n_H = jnp.where(m_ok, s["rho"] * rt.X_H / rt.m_p, 0.0)
    c = rt.c_red
    x = s["x_HI"]
    E = s["rt_E"]
    du = jnp.zeros_like(x)
    atten = jnp.ones_like(E)   # cumulative e^-tau per group
    sub_dt = dt / rt.chem_substeps
    for _ in range(rt.chem_substeps):
        n_HI = x * n_H
        Gamma = sum(c * rt.sigma[g] * E[..., g] / rt.e_photon[g]
                    for g in range(rt.ngroups))
        n_e = (1.0 - x) * n_H
        D = Gamma + (rt.beta_coll + rt.alpha_B) * n_e
        R = rt.alpha_B * n_e
        x_eq = R / jnp.maximum(D, 1e-30)
        x_trial = jnp.clip(x_eq + (x - x_eq) * jnp.exp(-D * sub_dt),
                           0.0, 1.0)
        absorb = []
        N_abs = jnp.zeros_like(x)   # photon number density absorbed
        for g in range(rt.ngroups):
            fac = jnp.exp(-c * rt.sigma[g] * n_HI * sub_dt)
            if rt.heating:
                du = du + E[..., g] * (1.0 - fac) \
                    * (1.0 - rt.e_ion / rt.e_photon[g]) \
                    / jnp.maximum(s["rho"], 1e-30)
            N_abs = N_abs + E[..., g] * (1.0 - fac) / rt.e_photon[g]
            absorb.append(fac)
        # photon conservation: can't ionize more atoms than photons
        # absorbed this substep (ionizing branch only)
        x_floor = x - N_abs / jnp.maximum(n_H, 1e-30)
        x = jnp.where(x_trial < x, jnp.maximum(x_trial, x_floor), x_trial)
        x = jnp.clip(x, 0.0, 1.0)
        step_fac = jnp.stack(absorb, axis=-1)
        E = E * step_fac
        atten = atten * step_fac
    out = {**s, "x_HI": jnp.where(m_ok, x, 0.0), "rt_E": E,
           "rt_F": s["rt_F"] * atten[..., None]}
    if rt.heating:
        out["u_full"] = s["u_full"] + du * m_ok
        out["u"] = s["u"] + du * m_ok
    return out


def rt_subcycles(grid: CellGrid, s: Dict, p, rt: RTParams, dt_hydro,
                 n_sub: int, src_pos=None, src_L=None,
                 use_scan: bool = False, transport=None) -> Dict:
    """n_sub RT steps per hydro step (the reference's RT subcycling,
    engine.c / rt_properties.h): inject → transport → thermochemistry.
    ``n_sub`` is static; pick it host-side as
    ceil(dt_hydro / (CFL * min h / c_red)).  ``transport`` selects the
    scheme's transport loop (default rt/GEAR finite-volume faces; pass
    rt.sphm1.sphm1_transport_loop for the SPH-operator scheme — state
    layouts are identical, so they are drop-in interchangeable)."""
    if transport is None:
        transport = rt_transport_loop
    dt = dt_hydro / n_sub
    for _ in range(n_sub):
        if src_pos is not None:
            s = rt_inject(grid, s, rt, src_pos, src_L, dt)
        s = transport(grid, s, p, rt, dt, use_scan=use_scan)
        s = rt_thermochemistry(s, rt, dt)
    return s


def stromgren_radius(Ndot, n_H, alpha_B):
    """Analytic Strömgren radius r_S = (3 Ndot / 4 π α_B n_H^2)^{1/3}
    and recombination time t_rec = 1/(α_B n_H) — the oracle for the
    Iliev test 1 analog."""
    import math
    r_S = (3.0 * Ndot / (4.0 * math.pi * alpha_B * n_H * n_H)) ** (1.0 / 3)
    return r_S, 1.0 / (alpha_B * n_H)


# ---------------------------------------------------------------------------
# Engine wiring: star-sourced injection + the GEARRT: parameter surface
# (rt_properties.h rt_props_init; runner order rt_injection ->
#  rt_transport -> rt_tchem, engine_rt.c / runner_main.c RT task chain)
# ---------------------------------------------------------------------------


def rt_inject_from_stars(grid: CellGrid, gas_s: Dict, star_s: Dict, p,
                         rt: RTParams, dt, L, use_scan: bool = False):
    """Deposit each star's L*dt kernel-weighted over its gas neighbours.

    The reference's two-pass injection (rt_iact.h:55-190): pass 1
    (star-centric density loop, runner_iact_nonsym_rt_injection_prep)
    accumulates the normalisation psi_sum over gas neighbours; pass 2
    (gas-centric, runner_iact_rt_inject) deposits
    dE_i = sum_s L_g dt w(r_si, h_s)/psi_sum_s / V_i.  Cross-species
    tiles may carry different K, which the 27-stencil machinery handles
    (the same shape as the feedback loops, ops/stencil.py).

    ``L`` is the per-group constant stellar luminosity (G,) — the
    reference's GEARRT:const_stellar_luminosities_LSol model.
    """
    sm = lambda n: _grid_view(grid, star_s[n])
    smask, soff = sm("mask"), sm("off")
    h_s = _sanitize(smask, sm("h"))
    gamma2 = jnp.float32(p.kernel.gamma2)

    # ---- pass 1: per-star psi_sum over gas neighbours --------------------
    hinv_i = _bi(1.0 / h_s)
    j_gas = {"off": _grid_view(grid, gas_s["off"]),
             "mask": _grid_view(grid, gas_s["mask"])}

    def psi_accum(acc, jf, shift):
        dx, r2 = _pair_geometry_shift(soff, jf["off"], shift)
        ok = (_bj(jf["mask"]) > 0) & (r2 * hinv_i ** 2 < gamma2)
        r = jnp.sqrt(jnp.maximum(r2, 1e-38))
        w, _ = p.kernel.deval(r * hinv_i)
        return acc + jnp.sum(jnp.where(ok, w, 0.0), axis=-1)

    psi0 = jnp.zeros(smask.shape, F32)
    psi_sum = _apply_offsets(grid, j_gas, psi0, psi_accum, use_scan)
    psi_sum = _flat_view(grid, psi_sum) * star_s["mask"]

    # ---- pass 2: gas-centric deposit --------------------------------------
    gmask = _grid_view(grid, gas_s["mask"])
    goff = _grid_view(grid, gas_s["off"])
    j_star = {"off": soff, "mask": smask, "h": h_s,
              "psi": _grid_view(grid, psi_sum)}

    def dep_accum(acc, jf, shift):
        dx, r2 = _pair_geometry_shift(goff, jf["off"], shift)
        hj = _bj(jf["h"])
        hinv_j = 1.0 / hj
        ok = (_bj(jf["mask"]) > 0) & (r2 * hinv_j ** 2 < gamma2) \
            & (_bj(jf["psi"]) > 0)
        r = jnp.sqrt(jnp.maximum(r2, 1e-38))
        w, _ = p.kernel.deval(r * hinv_j)
        frac = jnp.where(ok, w / jnp.maximum(_bj(jf["psi"]), 1e-30), 0.0)
        return acc + jnp.sum(frac, axis=-1)

    frac0 = jnp.zeros(gmask.shape, F32)
    frac = _apply_offsets(grid, j_star, frac0, dep_accum, use_scan)
    frac = _flat_view(grid, frac) * gas_s["mask"]

    V = jnp.maximum(_volumes(gas_s), 1e-30)
    E = gas_s["rt_E"]
    for grp in range(rt.ngroups):
        E = E.at[..., grp].add(float(L[grp]) * dt * frac / V)
    return {**gas_s, "rt_E": E}


def rt_params_from_yaml(params, units=None):
    """Build (RTParams, max_nr_subcycles, scheme) from the GEARRT: or
    SPHM1RT: YAML section (the runtime analog of the reference's
    compile-time --with-rt=GEAR_N / SPHM1RT_N selection, configure.ac).

    Parameter surface (rt_properties.h rt_props_init + the reference's
    TimeIntegration:max_nr_rt_subcycles):

      GEARRT:
        f_reduce_c: 0.01              # c_red = f * c  (OR reduced_speed_of_light directly, internal units)
        CFL_condition: 0.9
        photon_groups: 1
        group_cross_sections: [s1,..] # HI sigma per group, internal units
        group_photon_energies: [e1,..]# mean photon energy per group
        hydrogen_mass_fraction: 1.0
        case_B_recombination: a_B     # internal units (0 = off)
        collisional_ionization: beta  # internal units (0 = off)
        ionization_energy: e_ion
        with_heating: 0|1
        thermochemistry_substeps: 4
        source_radius: h_inject       # point-source deposition radius

    The reference derives cross-sections/energies by integrating a
    stellar spectrum over photon_groups_Hz bins (rt_stellar_emission_-
    rate.c); here they are direct parameters in internal units — the
    synthesized-table analog used throughout this framework's subgrid.
    """
    sec = scheme = None
    for cand, name in (("GEARRT", "gear"), ("SPHM1RT", "sphm1")):
        if params.has(cand):
            sec, scheme = cand, name
            break
    if sec is None:
        return None
    G = params.opt_int(sec, "photon_groups", 1)

    def arr(name, default):
        v = params.opt_array(sec, name, [default] * G)
        v = list(v) + [v[-1]] * (G - len(v))
        return tuple(float(x) for x in v[:G])

    c_red = params.opt_float(sec, "reduced_speed_of_light", 0.0)
    if c_red <= 0.0:
        f = params.opt_float(sec, "f_reduce_c", 0.01)
        c_int = (units.constants().const_speed_light_c
                 if units is not None else 1.0)
        c_red = f * c_int
    rt = RTParams(
        ngroups=G,
        c_red=c_red,
        CFL=params.opt_float(sec, "CFL_condition", 0.9),
        sigma=arr("group_cross_sections", 1.0),
        e_photon=arr("group_photon_energies", 1.0),
        X_H=params.opt_float(sec, "hydrogen_mass_fraction", 1.0),
        # idealized-unit tests may override the proton mass directly
        # (the reference's RT examples pick unit systems instead)
        m_p=params.opt_float(
            sec, "proton_mass",
            (units.constants().const_proton_mass
             if units is not None else 1.0)),
        alpha_B=params.opt_float(sec, "case_B_recombination", 0.0),
        beta_coll=params.opt_float(sec, "collisional_ionization", 0.0),
        e_ion=params.opt_float(sec, "ionization_energy", 0.0),
        heating=bool(params.opt_int(sec, "with_heating", 0)),
        chem_substeps=params.opt_int(sec, "thermochemistry_substeps", 4),
        src_h=params.opt_float(sec, "source_radius", 0.1),
    )
    max_sub = params.opt_int("TimeIntegration", "max_nr_rt_subcycles", 8)
    return rt, max_sub, scheme


def _transport_for(scheme: str):
    if scheme == "sphm1":
        from .sphm1 import sphm1_transport_loop
        return sphm1_transport_loop
    return rt_transport_loop


def pick_n_subcycles(rt: RTParams, dt_max: float, h_min: float,
                     max_nr: int) -> int:
    """Static subcycle count: smallest n with dt_max/n <= CFL*h_min/c_red,
    capped at max_nr (TimeIntegration:max_nr_rt_subcycles; the reference
    sizes this per-step from the RT time-step task — here it is fixed at
    init so the jitted step never recompiles)."""
    import math
    dt_rt = rt.CFL * h_min / max(rt.c_red, 1e-30)
    return max(1, min(max_nr, int(math.ceil(dt_max / max(dt_rt, 1e-30)))))


def make_rt_fn(p, rt: RTParams, n_sub: int, src_pos=None, src_L=None,
               use_scan: bool = False, scheme: str = "gear"):
    """Engine closure: s = rt_fn(grid, s, T) subcycled over the step's
    drift interval (hydro_step calls it between cooling and the kicks —
    the reference's RT task chain runs inside the same engine step,
    runner_main.c).  Radiation advances globally every step regardless
    of hydro time bins — the field is updated for ALL particles each
    system step, which is exact (the reference subcycles per-cell only
    to save task work)."""
    sp = None if src_pos is None else np.asarray(src_pos, np.float64)
    sL = None if src_L is None else np.asarray(src_L, np.float64)
    transport = _transport_for(scheme)

    def rt_fn(grid, s, T):
        return rt_subcycles(grid, s, p, rt, T.dt_drift, n_sub,
                            src_pos=sp, src_L=sL, use_scan=use_scan,
                            transport=transport)
    return rt_fn


def make_rt_multi_fn(p, rt: RTParams, n_sub: int, L,
                     use_scan: bool = False, scheme: str = "gear"):
    """MultiEngine closure: gas = rt_fn(grid, gas_s, star_s, T) with
    star particles as the photon sources (const per-group luminosities
    L, the GEARRT const stellar emission model)."""
    Lv = np.asarray(L, np.float64).reshape(-1)
    transport = _transport_for(scheme)

    def rt_fn(grid, gas_s, star_s, T):
        dt = T.dt_drift / n_sub
        for _ in range(n_sub):
            if star_s is not None:
                gas_s = rt_inject_from_stars(grid, gas_s, star_s, p, rt,
                                             dt, Lv, use_scan=use_scan)
            gas_s = transport(grid, gas_s, p, rt, dt, use_scan=use_scan)
            gas_s = rt_thermochemistry(gas_s, rt, dt)
        return gas_s
    return rt_fn
