"""Multi-species engine: gas + dark matter (+ stars) in one jitted step.

The reference co-evolves six particle arrays through one task graph
(space.c particle arrays; runner bodies per species).  Here each species is
its own padded tile state on the shared top grid, and one bulk-synchronous
step drifts, rebuilds, and kicks them all, with gravity sourced jointly:

    drift(all species) -> rebucket(all) -> SPH loops(gas)
    -> gravity(P3M over the union of species) -> KDK per species
    -> limiter(gas)

This is the engine for the SmallCosmoVolume / EAGLE-class runs (gas + DM
self-gravity, comoving integration) — reference engine_step (engine.c:2245)
with engine_policies hydro+self_gravity+cosmology.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .engine import (Engine, EngineConfig, StepTables, NBINS, F32, I32,
                     _gas_loops, _gas_kdk, _dm_kdk, _rebucket_phase,
                     _call_gravity, apply_wake, bin_from_dt,
                     make_external_gravity_fn)
from .grid.cellgrid import CellGrid, bucket_fields
from .models.sph import sphenix
from .models.sph.sphenix import CosmoFactors, SPHENIXParams
from .utils import timeline as tl


def _species_active(sp: Dict, T: StepTables):
    mask_b = sp["mask"] > 0
    tb = jnp.clip(sp["time_bin"], 0, NBINS)
    return mask_b, tb, mask_b & T.active[tb]


def _convert_gas_to_stars(grid: CellGrid, gas: Dict, stars: Dict,
                          conv, T: StepTables):
    """Move converted gas particles into free star slots of their cell.

    The reference pre-allocates `space_extra_sparts` free spart slots per
    cell and converts in-place under the cell lock
    (cell_convert_part.c:cell_convert_part_to_spart, space.h:53); here the
    conversion is a masked scatter into the star tiles' free slots.  The
    particle ID is preserved, the full gas mass moves to the star.
    Returns (gas, stars, n_converted, n_lost_capacity).
    """
    C = grid.C
    K_s = stars["mask"].shape[1]
    n_star = jnp.sum((stars["mask"] > 0).astype(I32), axis=1)   # (C,)
    rank = jnp.cumsum(conv.astype(I32), axis=1) - 1             # (C,K_gas)
    dest_slot = n_star[:, None] + rank
    ok = conv & (dest_slot < K_s)
    n_lost = jnp.sum(conv & ~ok)
    cid = jnp.arange(C, dtype=I32)[:, None]
    flat_dest = jnp.where(ok, cid * K_s + dest_slot, C * K_s)  # sentinel

    def scat(star_arr, gas_val):
        flat = star_arr.reshape((C * K_s,) + star_arr.shape[2:])
        pad = jnp.zeros((1,) + flat.shape[1:], flat.dtype)
        out = jnp.concatenate([flat, pad], 0)
        out = out.at[flat_dest.reshape(-1)].set(
            gas_val.reshape((C * gas_val.shape[1],) + gas_val.shape[2:]))
        return out[:-1].reshape(star_arr.shape)

    okf = ok.astype(F32)
    stars = {**stars,
             "mask": scat(stars["mask"], okf),
             "off": scat(stars["off"], gas["off"]),
             "a_grav_mesh": scat(stars["a_grav_mesh"], gas["a_grav_mesh"]),
             "v_full": scat(stars["v_full"], gas["v_full"]),
             "m": scat(stars["m"], gas["m"]),
             "pid": scat(stars["pid"], gas["pid"]),
             "h": scat(stars["h"], gas["h"]),
             "time_bin": scat(stars["time_bin"], gas["time_bin"]),
             "birth_time": scat(stars["birth_time"],
                                jnp.full_like(gas["m"], T.birth_time)),
             "birth_density": scat(stars["birth_density"], gas["rho"]),
             "fb_done": scat(stars["fb_done"], jnp.zeros_like(gas["m"])),
             }
    if "m_init" in stars:
        stars = {**stars, "m_init": scat(stars["m_init"], gas["m"])}
    if "Z" in stars and "Z" in gas:
        stars = {**stars, "Z": scat(stars["Z"], gas["Z"])}
    if "elem_frac" in stars and "elem_frac" in gas:
        stars = {**stars,
                 "elem_frac": scat(stars["elem_frac"],
                                   gas["elem_frac"])}
    # newborn stars carry the gas's drift since its last rebucket
    stars = {**stars, "drift_accum": jnp.maximum(stars["drift_accum"],
                                                 gas["drift_accum"])}
    gas = {**gas, "mask": jnp.where(ok, 0.0, gas["mask"])}
    return gas, stars, jnp.sum(ok), n_lost


def _convert_gas_to_sinks(grid: CellGrid, gas: Dict, sinks: Dict,
                          conv, T: StepTables, r_cut: float):
    """Move forming gas particles into free sink slots of their cell
    (cell_convert_part.c:cell_convert_part_to_sink; sink.h:51
    sink_first_init_sink sets r_cut from the scheme property and zeroes
    the swallow counters/angular momentum).  Same masked-scatter
    machinery as the gas->star conversion."""
    C = grid.C
    K_k = sinks["mask"].shape[1]
    n_sink = jnp.sum((sinks["mask"] > 0).astype(I32), axis=1)
    rank = jnp.cumsum(conv.astype(I32), axis=1) - 1
    dest_slot = n_sink[:, None] + rank
    ok = conv & (dest_slot < K_k)
    n_lost = jnp.sum(conv & ~ok)
    cid = jnp.arange(C, dtype=I32)[:, None]
    flat_dest = jnp.where(ok, cid * K_k + dest_slot, C * K_k)

    def scat(arr, gas_val):
        flat = arr.reshape((C * K_k,) + arr.shape[2:])
        pad = jnp.zeros((1,) + flat.shape[1:], flat.dtype)
        out = jnp.concatenate([flat, pad], 0)
        out = out.at[flat_dest.reshape(-1)].set(
            gas_val.reshape((C * gas_val.shape[1],) + gas_val.shape[2:]))
        return out[:-1].reshape(arr.shape)

    okf = ok.astype(F32)
    zeros = jnp.zeros_like(gas["m"])
    sinks = {**sinks,
             "mask": scat(sinks["mask"], okf),
             "off": scat(sinks["off"], gas["off"]),
             "v_full": scat(sinks["v_full"], gas["v_full"]),
             "m": scat(sinks["m"], gas["m"]),
             "pid": scat(sinks["pid"], gas["pid"]),
             "r_cut": scat(sinks["r_cut"],
                           jnp.full_like(gas["m"], r_cut)),
             "a_grav_mesh": scat(sinks["a_grav_mesh"],
                                 gas["a_grav_mesh"]),
             "time_bin": scat(sinks["time_bin"], gas["time_bin"]),
             "swallowed_L": scat(sinks["swallowed_L"],
                                 jnp.zeros_like(gas["v_full"])),
             "n_gas_swallows": scat(sinks["n_gas_swallows"], zeros),
             "n_sink_swallows": scat(sinks["n_sink_swallows"], zeros),
             }
    sinks = {**sinks, "drift_accum": jnp.maximum(sinks["drift_accum"],
                                                 gas["drift_accum"])}
    gas = {**gas, "mask": jnp.where(ok, 0.0, gas["mask"])}
    return gas, sinks, jnp.sum(ok), n_lost



def _eps_of(eps_soft, name: str) -> float:
    """Per-species timestep softening: ``eps_soft`` is a float, or a
    (baryon, dm) pair (Gravity:comoving_baryon_softening /
    comoving_DM_softening — timestep.h:141 uses the particle's own
    epsilon).  Collisionless baryons (stars/bh/sinks) take the baryon
    value; dm and the delta-f neutrinos take the DM value."""
    if isinstance(eps_soft, tuple):
        return float(eps_soft[1] if name in ("dm", "nu") else eps_soft[0])
    return float(eps_soft)

def multi_step(grid: CellGrid, p: SPHENIXParams, cfg: EngineConfig,
               gravity_fn: Optional[Callable], eps_soft: float,
               cosmo: CosmoFactors, state: Dict[str, Dict], T: StepTables,
               cooling_fn: Optional[Callable] = None,
               sf=None, feedback=None, bh_model=None, sink_model=None,
               enrichment=None, rt_fn: Optional[Callable] = None,
               tracers=None):
    """One engine step over {'gas', 'dm', 'stars', 'bh', 'sinks'} species.

    ``sf`` is an optional (EagleStarFormation, EagleEntropyFloor|None)
    pair enabling stochastic gas->star conversion (requires a 'stars'
    species for the free slots).  ``feedback`` is an optional
    EagleThermalFeedback injecting SNII energy from flagged stars.
    ``bh_model`` is an optional EagleBlackHoles driving Bondi accretion,
    gas swallowing and AGN heating of the 'bh' species.  ``sink_model``
    is an optional GEARSinks driving sink formation, gas accretion and
    sink mergers of the 'sinks' species (runner_sinks.c, sink/GEAR).
    """
    gas = state.get("gas")
    dm = state.get("dm")
    stars = state.get("stars")
    bh = state.get("bh")
    sinks = state.get("sinks")
    nu = state.get("nu")
    n_overflow = jnp.int32(0)
    n_ghost_iter = jnp.int32(0)
    too_small_n = jnp.int32(0)
    n_woken = jnp.int32(0)
    n_active = jnp.int32(0)
    h_max_active = jnp.float32(0.0)
    n_converted = jnp.int32(0)
    sfr_total = jnp.float32(0.0)
    sfrdt_total = jnp.float32(0.0)
    sfr_inactive = jnp.float32(0.0)
    m_stars_formed = jnp.float32(0.0)
    Z_smooth = None

    # --- drift + rebucket + SPH loops (gas) ---------------------------------
    if gas is not None:
        s = gas
        if "a_grav_mesh" not in s:  # pre-split-mesh checkpoints
            s = {**s, "a_grav_mesh": jnp.zeros_like(s["a_grav"]),
                 "pot_mesh": jnp.zeros_like(s["m"])}
        if sf is not None and "sfr" not in s:  # pre-SFH checkpoints
            s = {**s, "sfr": jnp.zeros_like(s["m"])}
        mask_b, tb, active = _species_active(s, T)
        a_tot = s["a_hydro"] + s["a_grav"] + s["a_grav_mesh"]
        s = {**s,
             "off": s["off"] + s["v_full"] * T.dt_drift
             * s["mask"][..., None],
             "v": s["v"] + a_tot * T.dt_drift}
        s = sphenix.predict_extra(p, s, cosmo, T.dt_drift, T.dt_therm_drift)
        reach = jnp.maximum(
            jnp.max(jnp.where(mask_b, s["h"], 0.0))
            * jnp.float32(p.kernel.gamma),
            jnp.float32(cfg.p2p_reach))
        s, nov = _rebucket_phase(grid, cfg, s, T, reach)
        n_overflow = n_overflow + nov
        mask_b, tb, active = _species_active(s, T)
        s, n_ghost_iter = _gas_loops(grid, p, cfg, cosmo, s, active,
                                     T.dt_alpha)
        # smoothed chemistry (chemistry/EAGLE/chemistry_iact.h): cooling
        # and star formation consume the kernel-smoothed metallicity,
        # not the raw particle carrier
        if "Z" in s and "elem_frac" in s and (cooling_fn is not None
                                              or sf is not None):
            from .ops import stencil as _st
            Z_smooth, _ = _st.chemistry_smooth_loop(
                grid, s, p, use_scan=cfg.stencil_scan)
        # turbulent metal diffusion (chemistry/GEAR_DIFFUSION):
        # Smagorinsky D from the velocity shear, then pairwise exchange
        if "Z" in s and "elem_frac" in s \
                and getattr(cfg, "chem_diffusion", 0.0) > 0.0:
            from .ops import stencil as _st
            diff_coef = _st.chemistry_shear_diff_loop(
                grid, s, p, cfg.chem_diffusion, cosmo,
                use_scan=cfg.stencil_scan)
            dZ_dt, dfrac_dt = _st.chemistry_diffusion_loop(
                grid, {**s, "diff_coef": diff_coef}, p, cosmo,
                use_scan=cfg.stencil_scan)
            dt_ch = T.dt_alpha[tb] * active
            s = {**s,
                 "Z": jnp.clip(s["Z"] + dZ_dt * dt_ch, 0.0, 1.0),
                 "elem_frac": jnp.clip(
                     s["elem_frac"] + dfrac_dt * dt_ch[..., None],
                     0.0, 1.0)}
        gas = s
        gas_act = (mask_b, tb, active)
        n_active = n_active + jnp.sum(active)
        h_max_active = jnp.max(jnp.where(active, s["h"], 0.0))

    # --- drift + rebucket (collisionless species) ----------------------------
    if dm is not None:
        d = dm
        d = {**d, "off": d["off"] + d["v_full"] * T.dt_drift
             * d["mask"][..., None]}
        d, nov = _rebucket_phase(grid, cfg, d, T,
                                 jnp.float32(cfg.p2p_reach))
        n_overflow = n_overflow + nov
        dm = d
        dm_act = _species_active(d, T)
        n_active = n_active + jnp.sum(dm_act[2])
    if stars is not None:
        d = stars
        d = {**d, "off": d["off"] + d["v_full"] * T.dt_drift
             * d["mask"][..., None]}
        # feedback pairs reach out to gamma*h_star: the rebucket trigger
        # must protect that range too, or a drifted star's heated
        # neighbours could straddle beyond the 27-stencil
        reach_s = jnp.float32(cfg.p2p_reach)
        if feedback is not None:
            reach_s = jnp.maximum(
                reach_s,
                jnp.max(jnp.where(d["mask"] > 0, d["h"], 0.0))
                * jnp.float32(p.kernel.gamma))
        d, nov = _rebucket_phase(grid, cfg, d, T, reach_s)
        n_overflow = n_overflow + nov
        stars = d
        stars_act = _species_active(d, T)
        n_active = n_active + jnp.sum(stars_act[2])
    if bh is not None:
        d = bh
        d = {**d, "off": d["off"] + d["v_full"] * T.dt_drift
             * d["mask"][..., None]}
        reach_b = jnp.float32(cfg.p2p_reach)
        if bh_model is not None:
            # BH-gas loops reach out to gamma*h_bh
            reach_b = jnp.maximum(
                reach_b,
                jnp.max(jnp.where(d["mask"] > 0, d["h"], 0.0))
                * jnp.float32(p.kernel.gamma))
        d, nov = _rebucket_phase(grid, cfg, d, T, reach_b)
        n_overflow = n_overflow + nov
        bh = d
        bh_act = _species_active(d, T)
        n_active = n_active + jnp.sum(bh_act[2])
    if sinks is not None:
        d = sinks
        d = {**d, "off": d["off"] + d["v_full"] * T.dt_drift
             * d["mask"][..., None]}
        # sink-gas and sink-sink pairs reach out to r_cut
        reach_k = jnp.maximum(
            jnp.float32(cfg.p2p_reach),
            jnp.max(jnp.where(d["mask"] > 0, d["r_cut"], 0.0)))
        d, nov = _rebucket_phase(grid, cfg, d, T, reach_k)
        n_overflow = n_overflow + nov
        sinks = d
        sinks_act = _species_active(d, T)
        n_active = n_active + jnp.sum(sinks_act[2])
    if nu is not None:
        d = nu
        d = {**d, "off": d["off"] + d["v_full"] * T.dt_drift
             * d["mask"][..., None]}
        d, nov = _rebucket_phase(grid, cfg, d, T, jnp.float32(0.0))
        n_overflow = n_overflow + nov
        nu = d
        nu_act = _species_active(d, T)
        n_active = n_active + jnp.sum(nu_act[2])

    # --- star/BH density ghost: adaptive smoothing lengths -------------------
    # (runner_ghost.c:72 runner_do_stars_ghost, :577 BH density ghost):
    # iterate each species' h to the neighbour target over gas BEFORE any
    # consumer — feedback deposition weights, Bondi densities and
    # reposition/merger radii all use the converged ball.
    if cfg.species_ghost_iterations > 0 and gas is not None:
        from .ops import species_ghost as _sg
        if stars is not None and (feedback is not None
                                  or enrichment is not None):
            h_s, _, _ = _sg.species_h_iterate(
                grid, stars, gas, p, stars_act[2],
                max_iter=cfg.species_ghost_iterations,
                use_scan=cfg.stencil_scan)
            stars = {**stars, "h": h_s}
            h_max_active = jnp.maximum(
                h_max_active, jnp.max(jnp.where(stars_act[2], h_s, 0.0)))
        if bh is not None and bh_model is not None:
            h_b, _, _ = _sg.species_h_iterate(
                grid, bh, gas, p, bh_act[2],
                max_iter=cfg.species_ghost_iterations,
                use_scan=cfg.stencil_scan)
            bh = {**bh, "h": h_b}
            h_max_active = jnp.maximum(
                h_max_active, jnp.max(jnp.where(bh_act[2], h_b, 0.0)))

    # --- joint gravity (all species source; all receive) ---------------------
    if gravity_fn is not None:
        # neutrinos are mesh-only (neutrino.h): excluded from the
        # short-range/near-field gravity entirely
        pool = {"gas": (gas, gas_act if gas is not None else None),
                "dm": (dm, dm_act if dm is not None else None),
                "stars": (stars, stars_act if stars is not None else None),
                "bh": (bh, bh_act if bh is not None else None),
                "sinks": (sinks, sinks_act if sinks is not None
                          else None)}
        names = [n for n in ("gas", "dm", "stars", "bh", "sinks")
                 if pool[n][0] is not None]
        outs = gravity_fn([pool[n][0] for n in names])
        for n, (acc, pot) in zip(names, outs):
            sp, act_t = pool[n]
            act = act_t[2]
            sp = {**sp, "a_grav": jnp.where(act[..., None], acc,
                                            sp["a_grav"])}
            if pot is not None and "pot" in sp:
                sp = {**sp, "pot": jnp.where(act, pot, sp["pot"])}
            pool[n] = (sp, act_t)
        gas = pool["gas"][0]
        dm = pool["dm"][0]
        stars = pool["stars"][0]
        bh = pool["bh"][0]
        sinks = pool["sinks"][0]

    # --- black holes: density -> accretion -> swallow -> AGN -----------------
    # (runner_black_holes.c: bh_density, bh_swallow, do_gas_swallow,
    # bh_feedback; black_holes/EAGLE)
    n_swallowed = jnp.int32(0)
    n_agn = jnp.int32(0)
    n_bh_merged = jnp.int32(0)
    bh_heated = None
    if bh_model is not None and bh is not None and gas is not None \
            and getattr(bh_model, "kind", "eagle") == "default":
        # black_holes/Default: passive BHs — density pass only, no
        # accretion/swallowing/feedback (black_holes/Default/black_holes.h)
        from .ops import black_holes as _bh
        dens = _bh.bh_gas_density_loop(grid, bh, gas, p,
                                       use_scan=cfg.stencil_scan)
        h_bh = jnp.where(bh["mask"] > 0, bh["h"], 1.0)
        bh = {**bh,
              "rho_gas": jnp.where(bh_act[2],
                                   dens["rho"] / h_bh ** 3, bh["rho_gas"]),
              "ngb_mass": jnp.where(bh_act[2], dens["ngb_mass"],
                                    bh["ngb_mass"])}
    elif bh_model is not None and bh is not None and gas is not None:
        from .ops import black_holes as _bh
        from .ops import stencil as _st
        bh_kind = getattr(bh_model, "kind", "eagle")
        dens = _bh.bh_gas_density_loop(grid, bh, gas, p,
                                       use_scan=cfg.stencil_scan,
                                       with_ang_mom=bh_kind == "spin_jet")
        tb_bh = jnp.clip(bh["time_bin"], 0, NBINS)
        dt_bh = T.dt_alpha[tb_bh] * bh_act[2]

        # --- reposition to the potential minimum among slow-enough gas
        # neighbours (black_holes.h:193-230, black_holes_iact.h:290) ------
        if getattr(bh_model, "reposition_ratio", 0.0) > 0.0 \
                and cfg.eps_soft > 0.0 and "pot" in gas:
            rho_rs = jnp.maximum(dens["rho"], 1e-30)
            cs_rs = dens["cs_w"] / rho_rs * cosmo.a_factor_sound_speed
            found_r, delta_r = _bh.bh_reposition_loop(
                grid, {**bh, "cs_gas": cs_rs}, gas, p,
                max_dist=bh_model.reposition_ratio * cfg.eps_soft,
                v2_max_fac=bh_model.repos_vel_ratio,
                v2_min_thresh=bh_model.repos_vel_min,
                use_scan=cfg.stencil_scan)
            move = found_r & bh_act[2]
            jump = jnp.where(move, jnp.sqrt(jnp.sum(delta_r ** 2, -1)),
                             0.0)
            bh = {**bh,
                  "off": jnp.where(move[..., None], bh["off"] + delta_r,
                                   bh["off"]),
                  # teleports count against the rebucket drift budget
                  "drift_accum": bh["drift_accum"] + jnp.max(jump)}

        bh = bh_model.accrete(bh, dens, cosmo, dt_bh)
        # only ACTIVE black holes swallow or fire this step
        bh = {**bh,
              "swallow_prob": jnp.where(bh_act[2], bh["swallow_prob"],
                                        0.0)}

        # swallowing: mark -> collect -> apply (mass + momentum moves)
        bid = _bh.bh_swallow_target_loop(grid, gas, bh, p,
                                         T.ti_lo, T.ti_hi,
                                         use_scan=cfg.stencil_scan)
        gains = _bh.bh_swallow_collect_loop(grid, bh, gas, p, bid,
                                            use_scan=cfg.stencil_scan)
        m_new = bh["m"] + gains["dm"]
        dp = jnp.stack([gains["dp0"], gains["dp1"], gains["dp2"]], -1)
        v_new = (bh["m"][..., None] * bh["v_full"] + dp) \
            / jnp.maximum(m_new, 1e-30)[..., None]
        keep_v = (gains["dm"] <= 0)[..., None]
        bh = {**bh, "m": m_new,
              "v_full": jnp.where(keep_v, bh["v_full"], v_new)}
        swallowed = bid >= 0
        n_swallowed = jnp.sum(swallowed)
        gas = {**gas, "mask": jnp.where(swallowed, 0.0, gas["mask"])}

        # AGN heating: reservoir release through the stochastic kernel
        fb_energy, resv = bh_model.agn_fire(bh)
        fb_energy = jnp.where(bh_act[2], fb_energy, 0.0)
        resv = jnp.where(bh_act[2], resv, bh["energy_reservoir"])
        bh = {**bh, "energy_reservoir": resv}
        bh_fb = {**bh, "fb_energy": fb_energy,
                 "fb_ngb_mass": bh["ngb_mass"]}
        du_add, nev = _st.feedback_apply_loop(
            grid, gas, bh_fb, p, T.ti_lo, T.ti_hi, bh_model.delta_u,
            use_scan=cfg.stencil_scan)
        bh_heated = nev > 0
        n_agn = jnp.sum(fb_energy > 0)
        gas = {**gas, "u_full": gas["u_full"] + du_add,
               "u": gas["u"] + du_add}

        # --- AGN jets: paired kicks along ±spin axis (SPIN_JET,
        # black_holes.h:1185-1248; AGN_jet_spin_axis model) ----------------
        if bh_kind == "spin_jet":
            fire_jet, v_jet = bh_model.jet_fire(bh)
            fire_jet = fire_jet & bh_act[2]
            bh_r = {**bh, "fire": fire_jet, "ray_dir": bh["spin_dir"]}
            pid_p, m_p, pid_m, m_m = _st.kinetic_ray_select_loop(
                grid, bh_r, gas, p, use_scan=cfg.stencil_scan)
            found = (pid_p >= 0) & (pid_m >= 0)
            bh_j = {**bh_r, "pid_plus": pid_p, "pid_minus": pid_m,
                    "kick_q_plus": jnp.where(found, m_p * v_jet, 0.0),
                    "kick_q_minus": jnp.where(found, m_m * v_jet, 0.0)}
            dp = _st.kinetic_kick_apply_loop(
                grid, gas, bh_j, p, use_scan=cfg.stencil_scan)
            dv_j = dp / jnp.maximum(gas["m"], 1e-30)[..., None]
            gas = {**gas, "v_full": gas["v_full"] + dv_j,
                   "v": gas["v"] + dv_j}
            e_dep = jnp.where(found & fire_jet,
                              0.5 * (m_p + m_m) * v_jet * v_jet, 0.0)
            bh = {**bh,
                  "jet_reservoir": jnp.maximum(
                      bh["jet_reservoir"] - e_dep, 0.0),
                  "v_jet_last": jnp.where(fire_jet, v_jet,
                                          bh["v_jet_last"])}
            n_agn = n_agn + jnp.sum(e_dep > 0)
            jet_kicked = jnp.any(dp != 0.0, axis=-1)
            bh_heated = bh_heated | jet_kicked

        # --- BH-BH mergers: lighter onto heavier when bound and close
        # (black_holes_iact.h runner_iact_nonsym_bh_bh_swallow) ------------
        if getattr(bh_model, "merging_ratio", 0.0) > 0.0 \
                and cfg.eps_soft > 0.0:
            vic = _bh.bh_merger_mark_loop(
                grid, bh, p,
                max_dist=bh_model.merging_ratio * cfg.eps_soft,
                G=bh_model.G, threshold=bh_model.merger_threshold,
                use_scan=cfg.stencil_scan)
            vic = jnp.where(bh_act[2], vic, -1)  # active victims only
            not_vic = vic < 0
            mg = _bh.bh_merger_collect_loop(
                grid, bh, vic, not_vic,
                with_spin=bh_kind == "spin_jet",
                use_scan=cfg.stencil_scan)
            consumed = _bh.bh_merger_consumed_loop(
                grid, bh, vic, not_vic, use_scan=cfg.stencil_scan)
            if bh_kind == "spin_jet":
                # remnant spin BEFORE the mass moves (merger_spin_evolve)
                spin_m, dir_m = bh_model.merge_spin(bh, mg)
            m_bh_new = bh["m"] + mg["dm"]
            dp_m = jnp.stack([mg["dp0"], mg["dp1"], mg["dp2"]], -1)
            v_bh_new = (bh["m"][..., None] * bh["v_full"] + dp_m) \
                / jnp.maximum(m_bh_new, 1e-30)[..., None]
            keep_v = (mg["dm"] <= 0)[..., None]
            bh = {**bh, "m": m_bh_new,
                  "m_subgrid": bh["m_subgrid"] + mg["dms"],
                  "energy_reservoir": bh["energy_reservoir"]
                  + mg["dresv"],
                  "v_full": jnp.where(keep_v, bh["v_full"], v_bh_new),
                  "mask": jnp.where(consumed, 0.0, bh["mask"])}
            if bh_kind == "spin_jet":
                bh = {**bh, "spin": spin_m, "spin_dir": dir_m,
                      "jet_reservoir": bh["jet_reservoir"] + mg["djet"]}
            n_bh_merged = jnp.sum(consumed)

    # --- sinks: swallow gas -> merge (runner_sinks.c; sink/GEAR) -------------
    n_sink_gas_sw = jnp.int32(0)
    n_sink_merged = jnp.int32(0)
    n_sink_formed = jnp.int32(0)
    if sink_model is not None and sinks is not None and gas is not None:
        from .ops import sinks as _sk

        # only ACTIVE sinks swallow this step (runner processes active
        # cells): inactive sinks get a zero cut-off in the mark loop
        sk_live = {**sinks, "r_cut": jnp.where(sinks_act[2],
                                               sinks["r_cut"], 0.0)}
        sid = _sk.sink_gas_swallow_mark_loop(grid, gas, sk_live,
                                             use_scan=cfg.stencil_scan)
        a_now = cosmo.a
        gains = _sk.sink_gas_swallow_collect_loop(
            grid, sinks, gas, sid, a=a_now, a_inv=1.0 / a_now,
            use_scan=cfg.stencil_scan)
        m_new = sinks["m"] + gains["dm"]
        dp = jnp.stack([gains["dp0"], gains["dp1"], gains["dp2"]], -1)
        dL = jnp.stack([gains["dL0"], gains["dL1"], gains["dL2"]], -1)
        v_new = (sinks["m"][..., None] * sinks["v_full"] + dp) \
            / jnp.maximum(m_new, 1e-30)[..., None]
        keep_v = (gains["dm"] <= 0)[..., None]
        sinks = {**sinks, "m": m_new,
                 "v_full": jnp.where(keep_v, sinks["v_full"], v_new),
                 "swallowed_L": sinks["swallowed_L"] + dL,
                 "n_gas_swallows": sinks["n_gas_swallows"] + gains["n"]}
        swallowed = sid >= 0
        n_sink_gas_sw = jnp.sum(swallowed)
        gas = {**gas, "mask": jnp.where(swallowed, 0.0, gas["mask"])}

        # sink-sink mergers: lighter onto heavier; chains defer one step
        vic = _sk.sink_merger_mark_loop(grid, sinks,
                                        use_scan=cfg.stencil_scan)
        not_victim = vic < 0
        mg = _sk.sink_merger_collect_loop(grid, sinks, vic, not_victim,
                                          use_scan=cfg.stencil_scan)
        consumed = _sk.sink_merger_consumed_loop(
            grid, sinks, vic, not_victim, use_scan=cfg.stencil_scan)
        m_new = sinks["m"] + mg["dm"]
        dp = jnp.stack([mg["dp0"], mg["dp1"], mg["dp2"]], -1)
        dL = jnp.stack([mg["dL0"], mg["dL1"], mg["dL2"]], -1)
        v_new = (sinks["m"][..., None] * sinks["v_full"] + dp) \
            / jnp.maximum(m_new, 1e-30)[..., None]
        keep_v = (mg["dm"] <= 0)[..., None]
        sinks = {**sinks, "m": m_new,
                 "v_full": jnp.where(keep_v, sinks["v_full"], v_new),
                 "swallowed_L": sinks["swallowed_L"] + dL,
                 "n_sink_swallows": sinks["n_sink_swallows"] + mg["n"],
                 "mask": jnp.where(consumed, 0.0, sinks["mask"])}
        n_sink_merged = jnp.sum(consumed)
        sinks_act = _species_active(sinks, T)

    # --- stellar feedback (stars -> gas) --------------------------------------
    # three application paths keyed on feedback.kind: EAGLE thermal
    # stochastic heating, EAGLE kinetic paired kicks, GEAR continuous
    # kernel-weighted deposition (see subgrid/feedback.py for references)
    n_heated = jnp.int32(0)
    heated = None
    if feedback is not None and stars is not None and gas is not None:
        from .ops import stencil as _st
        fb_kind = getattr(feedback, "kind", "thermal")
        energy, fire = feedback.firing_energy(stars, T.birth_time,
                                              stars_act[2])
        if fb_kind == "thermal":
            ngb_mass = _st.star_ngb_mass_loop(grid, stars, gas, p,
                                              use_scan=cfg.stencil_scan)
            stars_fb = {**stars, "fb_energy": energy,
                        "fb_ngb_mass": ngb_mass}
            du_add, nev = _st.feedback_apply_loop(
                grid, gas, stars_fb, p, T.ti_lo, T.ti_hi,
                feedback.delta_u, use_scan=cfg.stencil_scan)
            heated = nev > 0
            # direct injection into both the drifted and the full energy
            # (hydro_set_physical_internal_energy + _drifted,
            # feedback_iact.h)
            gas = {**gas, "u_full": gas["u_full"] + du_add,
                   "u": gas["u"] + du_add}
            stars = {**stars, "fb_done": jnp.where(
                fire, 1.0, stars["fb_done"])}
        elif fb_kind == "gear":
            norm = _st.star_kernel_weight_loop(grid, stars, gas, p,
                                               use_scan=cfg.stencil_scan)
            deposited = fire & (norm > 0)
            stars_fb = {**stars, "ej_norm": norm,
                        "fb_energy": jnp.where(deposited, energy, 0.0)}
            du_add = _st.star_energy_apply_loop(
                grid, gas, stars_fb, p, use_scan=cfg.stencil_scan)
            heated = du_add > 0
            gas = {**gas, "u_full": gas["u_full"] + du_add,
                   "u": gas["u"] + du_add}
            stars = {**stars, "fb_done": jnp.where(
                deposited, 1.0, stars["fb_done"])}
        elif fb_kind == "kinetic":
            dirs = feedback.ray_directions(stars["pid"], T.ti_lo, T.ti_hi)
            stars_r = {**stars, "fire": fire & (energy > 0),
                       "ray_dir": dirs}
            pid_p, m_p, pid_m, m_m = _st.kinetic_ray_select_loop(
                grid, stars_r, gas, p, use_scan=cfg.stencil_scan)
            q = feedback.pair_momentum(energy, m_p, m_m)
            stars_k = {**stars_r, "pid_plus": pid_p, "pid_minus": pid_m,
                       "kick_q": q}
            dp = _st.kinetic_kick_apply_loop(
                grid, gas, stars_k, p, use_scan=cfg.stencil_scan)
            heated = jnp.any(dp != 0.0, axis=-1)
            dv = dp / jnp.maximum(gas["m"], 1e-30)[..., None]
            gas = {**gas, "v_full": gas["v_full"] + dv,
                   "v": gas["v"] + dv}
            # a star whose rays found no pair keeps its reservoir and
            # retries next step (ray_feedback_kick_allowed semantics)
            stars = {**stars, "fb_done": jnp.where(
                fire & (q > 0), 1.0, stars["fb_done"])}
        else:
            raise ValueError(f"unknown feedback kind {fb_kind!r}")
        n_heated = jnp.sum(heated)

    # --- stellar enrichment: AGB+SNII mass return, SNIa metals ---------------
    # (feedback/EAGLE/enrichment.h evolve_* integrated over the stars
    # dying this step; ejecta distributed kernel-weighted to gas)
    m_enriched = jnp.float32(0.0)
    if enrichment is not None and stars is not None and gas is not None \
            and "Z" in gas and "elem_frac" in gas:
        from .ops import stencil as _st
        mask_s, tb_s, act_s = stars_act
        dt_s = T.dt_alpha[tb_s]
        age2 = T.birth_time - stars["birth_time"]
        age1 = jnp.maximum(age2 - dt_s, 0.0)
        live = act_s & (stars["birth_time"] > 0) & (age2 > 0)
        m_init = stars.get("m_init", stars["m"])
        Z_s = stars.get("Z", jnp.zeros_like(stars["m"]))
        ef_s = stars.get("elem_frac",
                         jnp.zeros(stars["m"].shape + (9,), F32))
        dm_ej, dmZ_ej, delem_ej = enrichment.ejecta(
            m_init, Z_s, ef_s, age1, age2)
        # never eject more than the star has (evolve_* cap), nor without
        # gas neighbours to receive it (conservation)
        norm = _st.star_kernel_weight_loop(grid, stars, gas, p,
                                           use_scan=cfg.stencil_scan)
        can = live & (norm > 0)
        cap = jnp.minimum(dm_ej, 0.9 * stars["m"])
        scale = jnp.where(dm_ej > 0, cap / jnp.maximum(dm_ej, 1e-30),
                          0.0)
        dm_ej = jnp.where(can, cap, 0.0)
        dmZ_ej = jnp.where(can, dmZ_ej * scale, 0.0)
        delem_ej = jnp.where(can[..., None], delem_ej
                             * scale[..., None], 0.0)
        stars_ej = {**stars, "ej_m": dm_ej, "ej_mZ": dmZ_ej,
                    "ej_elem": delem_ej, "ej_norm": norm}
        rec = _st.enrichment_apply_loop(grid, gas, stars_ej, p,
                                        use_scan=cfg.stencil_scan)
        m_old = gas["m"]
        m_new = m_old + rec["dm"]
        m_inv = 1.0 / jnp.maximum(m_new, 1e-30)
        got = rec["dm"] > 0
        v_new = (m_old[..., None] * gas["v_full"] + rec["dp"]) \
            * m_inv[..., None]
        gas = {**gas, "m": m_new,
               "v_full": jnp.where(got[..., None], v_new,
                                   gas["v_full"]),
               "Z": (gas["Z"] * m_old + rec["dmZ"]) * m_inv,
               "elem_frac": (gas["elem_frac"] * m_old[..., None]
                             + rec["delem"]) * m_inv[..., None]}
        stars = {**stars, "m": stars["m"] - dm_ej}
        m_enriched = jnp.sum(rec["dm"])

    # --- per-species KDK ------------------------------------------------------
    bin_counts = jnp.zeros(NBINS + 1, jnp.int32)
    if gas is not None:
        mask_b, tb, active = gas_act
        if cooling_fn is not None:
            gas_ch = gas if Z_smooth is None else {**gas, "Z": Z_smooth}
            upd = cooling_fn(gas_ch, cosmo, T.dt_therm_full[tb])
            for k, v in upd.items():
                gas = {**gas, k: jnp.where(active, v, gas[k])}
        # --- radiative transfer: star-sourced inject/transport/thermo
        # (the RT task chain, runner_main.c; rt/gear.py make_rt_multi_fn)
        if rt_fn is not None:
            gas = rt_fn(grid, gas, stars, T)
        gas, too_small, woken = _gas_kdk(grid, p, cfg, cosmo, gas, T,
                                         active, mask_b, tb)
        too_small_n = too_small_n + jnp.sum(too_small)
        n_woken = n_woken + woken

        # --- feedback sync: heated inactive particles join the current
        # step (runner_do_sync, runner_time_integration.c:1478); AGN
        # heating syncs through the same machinery ------------------------
        if bh_heated is not None:
            heated = bh_heated if heated is None else (heated | bh_heated)
        if heated is not None:
            sync = heated & mask_b & ~active & (gas["time_bin"] > 0)
            tb_now = jnp.clip(gas["time_bin"], 0, NBINS)
            new_bin_w = jnp.minimum(tb_now, T.max_active_bin)
            gas = apply_wake(p, cosmo, gas, T, sync, new_bin_w)
            n_woken = n_woken + jnp.sum(sync)

        # --- tracers: thermal-history records (tracers/EAGLE/tracers.h
        # tracers_after_cooling + tracers_after_black_holes_feedback) ----
        if tracers is not None and "T_max" in gas:
            gas = {**gas, **tracers.update(gas, cosmo,
                                           agn_heated=bh_heated)}

        # --- star formation (runner_do_star_formation, runner_others.c) ---
        if sf is not None and stars is not None:
            sf_model, sf_floor = sf
            dt_star = T.dt_alpha[tb]
            gas_ch = gas if Z_smooth is None else {**gas, "Z": Z_smooth}
            conv, sfr = sf_model.conversion_mask(
                gas_ch, cosmo, dt_star, T.ti_lo, T.ti_hi, sf_floor,
                active)
            # sticky per-particle SFR (star_formation_struct.h SFR —
            # inactive particles keep their last value; active non-SF
            # gas is reset to 0) + SFH bookkeeping for SFR.txt
            # (star_formation_logger.h)
            if "sfr" in gas:
                gas = {**gas, "sfr": jnp.where(active, sfr, gas["sfr"])
                       * gas["mask"]}
                sfr_inactive = jnp.sum(
                    jnp.where((gas["mask"] > 0) & ~active, gas["sfr"],
                              0.0))
            m_stars_formed = m_stars_formed + jnp.sum(
                jnp.where(conv, gas["m"], 0.0))
            gas, stars, n_c, n_lost = _convert_gas_to_stars(
                grid, gas, stars, conv, T)
            n_converted = n_converted + n_c
            n_overflow = n_overflow + n_lost
            sfr_total = sfr_total + jnp.sum(sfr)
            sfrdt_total = sfrdt_total + jnp.sum(sfr * dt_star)

        # --- sink formation (runner_do_sink_formation, runner_others.c;
        # sink.h:149 sink_is_forming) --------------------------------------
        if sink_model is not None and sinks is not None:
            from .ops import sinks as _sk
            can_form = _sk.sink_formation_gate_loop(
                grid, gas, sink_model.cut_off_radius,
                use_scan=cfg.stencil_scan)
            form = sink_model.formation_mask(gas, cosmo, active,
                                             can_form)
            form = form & (gas["mask"] > 0)  # not swallowed this step
            gas, sinks, n_f, n_lost_k = _convert_gas_to_sinks(
                grid, gas, sinks, form, T, sink_model.cut_off_radius)
            n_sink_formed = n_sink_formed + n_f
            n_overflow = n_overflow + n_lost_k

        mask_b = gas["mask"] > 0  # excludes converted + swallowed slots
        bins_masked = jnp.where(mask_b, jnp.clip(gas["time_bin"], 0, NBINS),
                                NBINS + 5)
        bin_counts = bin_counts + jnp.bincount(
            bins_masked.reshape(-1), length=NBINS + 6)[:NBINS + 1]
    if dm is not None:
        mask_b, tb, active = dm_act
        dm, too_small = _dm_kdk(cfg, _eps_of(eps_soft, "dm"), dm, T,
                                active, tb)
        too_small_n = too_small_n + jnp.sum(too_small)
        bins_masked = jnp.where(mask_b, jnp.clip(dm["time_bin"], 0, NBINS),
                                NBINS + 5)
        bin_counts = bin_counts + jnp.bincount(
            bins_masked.reshape(-1), length=NBINS + 6)[:NBINS + 1]
    if stars is not None:
        mask_b, tb, active = stars_act
        stars, too_small = _dm_kdk(cfg, _eps_of(eps_soft, "stars"),
                                   stars, T, active, tb)
        too_small_n = too_small_n + jnp.sum(too_small)
        mask_b = stars["mask"] > 0  # includes this step's newborns
        bins_masked = jnp.where(mask_b,
                                jnp.clip(stars["time_bin"], 0, NBINS),
                                NBINS + 5)
        bin_counts = bin_counts + jnp.bincount(
            bins_masked.reshape(-1), length=NBINS + 6)[:NBINS + 1]
    if bh is not None:
        mask_b, tb, active = bh_act
        bh, too_small = _dm_kdk(cfg, _eps_of(eps_soft, "bh"), bh, T,
                                active, tb)
        too_small_n = too_small_n + jnp.sum(too_small)
        bins_masked = jnp.where(mask_b, jnp.clip(bh["time_bin"], 0, NBINS),
                                NBINS + 5)
        bin_counts = bin_counts + jnp.bincount(
            bins_masked.reshape(-1), length=NBINS + 6)[:NBINS + 1]
    if sinks is not None:
        mask_b, tb, active = sinks_act
        sinks, too_small = _dm_kdk(cfg, _eps_of(eps_soft, "sinks"),
                                   sinks, T, active, tb)
        too_small_n = too_small_n + jnp.sum(too_small)
        mask_b = sinks["mask"] > 0  # includes newly formed, minus merged
        bins_masked = jnp.where(mask_b,
                                jnp.clip(sinks["time_bin"], 0, NBINS),
                                NBINS + 5)
        bin_counts = bin_counts + jnp.bincount(
            bins_masked.reshape(-1), length=NBINS + 6)[:NBINS + 1]
    if nu is not None:
        mask_b, tb, active = nu_act
        nu, too_small = _dm_kdk(cfg, _eps_of(eps_soft, "nu"), nu, T,
                                active, tb)
        too_small_n = too_small_n + jnp.sum(too_small)
        bins_masked = jnp.where(mask_b, jnp.clip(nu["time_bin"], 0, NBINS),
                                NBINS + 5)
        bin_counts = bin_counts + jnp.bincount(
            bins_masked.reshape(-1), length=NBINS + 6)[:NBINS + 1]

    out_state = {}
    if gas is not None:
        out_state["gas"] = gas
    if dm is not None:
        out_state["dm"] = dm
    if stars is not None:
        out_state["stars"] = stars
    if bh is not None:
        out_state["bh"] = bh
    if sinks is not None:
        out_state["sinks"] = sinks
    if nu is not None:
        out_state["nu"] = nu
    diag = {
        "bin_counts": bin_counts,
        "n_overflow": n_overflow,
        "n_dt_too_small": too_small_n,
        "n_ghost_iter": n_ghost_iter,
        "n_active": n_active,
        "n_woken": n_woken,
        "h_max_active": h_max_active,
        "n_converted": n_converted,
        "sfr_total": sfr_total,
        "sfrdt_total": sfrdt_total,
        "sfr_inactive": sfr_inactive,
        "m_stars_formed": m_stars_formed,
        # particle-splitting trigger (engine_split_gas_particles)
        "m_max_gas": (jnp.max(jnp.where(gas["mask"] > 0, gas["m"], 0.0))
                      if gas is not None else jnp.float32(0.0)),
        "n_heated": n_heated,
        # fullest live cell over ALL species (occupancy re-grid trigger)
        "k_max_live": jnp.max(jnp.stack([
            jnp.max(jnp.sum(sp["mask"] > 0, axis=1))
            for sp in out_state.values()])),
        "n_swallowed": n_swallowed,
        "n_bh_merged": n_bh_merged,
        "n_agn": n_agn,
        "n_sink_formed": n_sink_formed,
        "m_enriched": m_enriched,
        "n_sink_gas_swallows": n_sink_gas_sw,
        "n_sink_mergers": n_sink_merged,
    }
    return out_state, diag


def multi_init(grid: CellGrid, p: SPHENIXParams, cfg: EngineConfig,
               gravity_fn: Optional[Callable], eps_soft: float,
               cosmo: CosmoFactors, state: Dict[str, Dict], T: StepTables):
    """engine_init_particles for all species: density/ghost + forces +
    initial bins + first half-kick (engine.c:1893)."""
    gas = state.get("gas")
    dm = state.get("dm")
    stars = state.get("stars")
    bh = state.get("bh")
    sinks = state.get("sinks")
    nu = state.get("nu")
    n_ghost_iter = jnp.int32(0)

    if gas is not None:
        mask_b = gas["mask"] > 0
        gas, n_ghost_iter = _gas_loops(grid, p, cfg, cosmo, gas, mask_b,
                                       T.dt_alpha * 0.0)

    # star/BH h start converged (the load-time h is only a guess)
    if cfg.species_ghost_iterations > 0 and gas is not None:
        from .ops import species_ghost as _sg
        for nm in ("stars", "bh"):
            sp = stars if nm == "stars" else bh
            if sp is None:
                continue
            h_n, _, _ = _sg.species_h_iterate(
                grid, sp, gas, p, sp["mask"] > 0,
                max_iter=cfg.species_ghost_iterations,
                use_scan=cfg.stencil_scan)
            if nm == "stars":
                stars = {**stars, "h": h_n}
            else:
                bh = {**bh, "h": h_n}

    if gravity_fn is not None:
        # neutrinos are mesh-only sources/receivers: never in the
        # short-range pool (neutrino.h)
        pool = {"gas": gas, "dm": dm, "stars": stars, "bh": bh,
                "sinks": sinks, "nu": None}
        names = [n for n in _SPECIES_ORDER if pool[n] is not None]
        outs = gravity_fn([pool[n] for n in names])
        for n, (acc, pot) in zip(names, outs):
            sp = {**pool[n], "a_grav": acc}
            if pot is not None and "pot" in sp:
                sp = {**sp, "pot": pot}
            pool[n] = sp
        gas, dm, stars, bh, sinks = (pool["gas"], pool["dm"],
                                     pool["stars"], pool["bh"],
                                     pool["sinks"])

    bin_counts = jnp.zeros(NBINS + 1, jnp.int32)
    too_small_n = jnp.int32(0)

    if gas is not None:
        mask_b = gas["mask"] > 0
        s = gas
        dt_cfl = sphenix.compute_timestep(p, s, cosmo)
        dt_h = sphenix.timestep_h_change_limit(p, s)
        new_dt = jnp.minimum(jnp.minimum(dt_cfl, dt_h),
                             jnp.float32(cfg.dt_max))
        if cfg.with_self_gravity or cfg.with_external_gravity:
            a_norm = jnp.sqrt(jnp.sum(
                (s["a_hydro"] + s["a_grav"]
                 + s.get("a_grav_mesh", jnp.float32(0.0))) ** 2, -1))
            eps = jnp.float32(_eps_of(eps_soft, "gas"))
            dt_grav = jnp.sqrt(2.0 * cfg.eta_grav * eps
                               / jnp.maximum(a_norm, 1e-30))
            new_dt = jnp.minimum(new_dt, dt_grav)
        too_small_n = too_small_n + jnp.sum(mask_b & (new_dt < cfg.dt_min))
        new_bin = jnp.clip(bin_from_dt(new_dt, T.time_base_inv), 1, NBINS)
        new_bin = jnp.minimum(new_bin, T.max_bin)
        s = {**s, "time_bin": jnp.where(mask_b, new_bin, 0)}
        dt_k1 = T.dt_kick1[jnp.clip(s["time_bin"], 0, NBINS)]
        a_tot = s["a_hydro"] + s["a_grav"]
        s = {**s, "v_full": s["v_full"] + a_tot * dt_k1[..., None]
             * s["mask"][..., None]}
        ke = sphenix.kick_extra(p, s, cosmo, dt_k1 * s["mask"])
        gas = {**s, "u_full": ke["u_full"], "u_dt": ke["u_dt"]}
        bins_masked = jnp.where(mask_b, jnp.clip(gas["time_bin"], 0, NBINS),
                                NBINS + 5)
        bin_counts = bin_counts + jnp.bincount(
            bins_masked.reshape(-1), length=NBINS + 6)[:NBINS + 1]

    for name, sp in (("dm", dm), ("stars", stars), ("bh", bh),
                     ("sinks", sinks), ("nu", nu)):
        if sp is None:
            continue
        mask_b = sp["mask"] > 0
        a_norm = jnp.sqrt(jnp.sum(
            (sp["a_grav"] + sp.get("a_grav_mesh", jnp.float32(0.0))) ** 2,
            -1))
        new_dt = jnp.sqrt(2.0 * cfg.eta_grav * _eps_of(eps_soft, name)
                          / jnp.maximum(a_norm, 1e-30))
        new_dt = jnp.minimum(new_dt, jnp.float32(cfg.dt_max))
        too_small_n = too_small_n + jnp.sum(mask_b & (new_dt < cfg.dt_min))
        new_bin = jnp.clip(bin_from_dt(new_dt, T.time_base_inv), 1, NBINS)
        new_bin = jnp.minimum(new_bin, T.max_bin)
        sp = {**sp, "time_bin": jnp.where(mask_b, new_bin, 0)}
        dt_k1 = T.dt_kick1[jnp.clip(sp["time_bin"], 0, NBINS)]
        sp = {**sp, "v_full": sp["v_full"] + sp["a_grav"] * dt_k1[..., None]
              * sp["mask"][..., None]}
        bins_masked = jnp.where(mask_b, jnp.clip(sp["time_bin"], 0, NBINS),
                                NBINS + 5)
        bin_counts = bin_counts + jnp.bincount(
            bins_masked.reshape(-1), length=NBINS + 6)[:NBINS + 1]
        if name == "dm":
            dm = sp
        elif name == "stars":
            stars = sp
        elif name == "bh":
            bh = sp
        elif name == "sinks":
            sinks = sp
        else:
            nu = sp

    out_state = {}
    if gas is not None:
        out_state["gas"] = gas
    if dm is not None:
        out_state["dm"] = dm
    if stars is not None:
        out_state["stars"] = stars
    if bh is not None:
        out_state["bh"] = bh
    if sinks is not None:
        out_state["sinks"] = sinks
    if nu is not None:
        out_state["nu"] = nu
    diag = {
        "bin_counts": bin_counts,
        "n_overflow": jnp.int32(0),
        "n_dt_too_small": too_small_n,
        "n_ghost_iter": n_ghost_iter,
        "n_active": sum(jnp.sum(sp["mask"] > 0)
                        for sp in out_state.values()),
        "n_woken": jnp.int32(0),
        "h_max_active": (jnp.max(jnp.where(gas["mask"] > 0, gas["h"], 0.0))
                         if gas is not None else jnp.float32(0.0)),
        "n_converted": jnp.int32(0),
        "sfr_total": jnp.float32(0.0),
        "sfrdt_total": jnp.float32(0.0),
        "sfr_inactive": jnp.float32(0.0),
        "m_stars_formed": jnp.float32(0.0),
    }
    return out_state, diag


_JIT_MULTI_STEP = jax.jit(multi_step,
                          static_argnums=(0, 1, 2, 3, 4, 8, 9, 10, 11,
                                          12, 13, 14, 15))
_JIT_MULTI_INIT = jax.jit(multi_init, static_argnums=(0, 1, 2, 3, 4))

_SPECIES_ORDER = ("gas", "dm", "stars", "bh", "sinks", "nu")


def _mesh_update_multi(mesh_fn, state, dt_close, dt_open,
                       nu_model=None, a_now=1.0):
    """Split PM-mesh kick at a mesh-step boundary for every species
    (kick.h:255 mesh terms; engine.c:2406 ti_mesh).  ``mesh_fn`` takes the
    species list (same order the gravity_fn uses) and returns
    [(acc_mesh, pot_mesh), ...].  A 'nu' species deposits its delta-f
    WEIGHTED mass (neutrino.h:36; neutrinos are mesh-only sources)."""
    names = [n for n in _SPECIES_ORDER if n in state]
    closed = {}
    for n in names:
        s = state[n]
        if "a_grav_mesh" not in s:
            s = {**s, "a_grav_mesh": jnp.zeros_like(s["a_grav"]),
                 "pot_mesh": jnp.zeros_like(s["m"])}
        mb = s["mask"][..., None]
        closed[n] = {**s, "v_full": s["v_full"]
                     + s["a_grav_mesh"] * (dt_close * mb)}
    sources = []
    for n in names:
        s = closed[n]
        if n == "nu" and nu_model is not None:
            w = nu_model.weights(s["v_full"], s["mask"], s["y0"], a_now)
            s = {**s, "m": s["m"] * w}
        sources.append(s)
    outs = mesh_fn(sources)
    amax = jnp.float32(0.0)
    new = {}
    for n, (acc, pot) in zip(names, outs):
        s = closed[n]
        mb = s["mask"][..., None]
        amax = jnp.maximum(amax, jnp.max(jnp.sqrt(jnp.sum(acc * acc, -1))))
        new[n] = {**s, "v_full": s["v_full"] + acc * (dt_open * mb),
                  "a_grav_mesh": acc * mb, "pot_mesh": pot * s["mask"]}
    return new, amax


def _mesh_open_multi(state, dt):
    new = {}
    for n, s in state.items():
        mb = s["mask"][..., None]
        new[n] = {**s, "v_full": s["v_full"] + s["a_grav_mesh"] * (dt * mb)}
    return new


_JIT_MESH_MULTI = jax.jit(_mesh_update_multi, static_argnums=(0, 4))
_JIT_MESH_OPEN_MULTI = jax.jit(_mesh_open_multi)


class MultiEngine(Engine):
    """Gas + DM engine (the SmallCosmoVolume / EAGLE configuration)."""

    def __init__(self, grid: CellGrid, sph: SPHENIXParams,
                 cfg: EngineConfig, time_begin: float, time_end: float,
                 gravity_fn: Optional[Callable] = None,
                 eps_soft: float = 1e-3,
                 cosmo: Optional[CosmoFactors] = None, cosmology=None,
                 cooling_fn: Optional[Callable] = None,
                 star_formation=None, entropy_floor=None,
                 feedback=None, mesh_fn: Optional[Callable] = None,
                 mesh_dt_scale: float = 0.0, bh_model=None,
                 nu_model=None, sink_model=None, enrichment=None,
                 external_potential=None, rt_fn=None, tracers=None):
        if cfg.backend == "gather":
            # gather: the multi-species step doesn't carry candidate
            # lists.  (flat + SF/feedback/sinks is supported: gas-gas
            # loops ride the flat Pallas engine while the cross-species
            # star/BH/sink loops run the 27-stencil over the SAME column
            # grid — with ncz=1 the z-rolls become genuine periodic
            # z-images because the stencil shift is folded into the j
            # offsets, so pair enumeration stays exact.)
            import dataclasses
            cfg = dataclasses.replace(cfg, backend="xla")
        super().__init__(grid, sph, cfg, time_begin, time_end,
                         cosmo=cosmo, gravity_fn=gravity_fn,
                         cosmology=cosmology, cooling_fn=cooling_fn,
                         mesh_fn=mesh_fn, mesh_dt_scale=mesh_dt_scale,
                         external_potential=external_potential,
                         rt_fn=rt_fn)
        self.eps_soft = (tuple(float(e) for e in eps_soft)
                         if isinstance(eps_soft, (tuple, list))
                         else float(eps_soft))
        # static (hashable) SF pair for the jitted step
        self.sf = (star_formation, entropy_floor) \
            if star_formation is not None else None
        self.feedback = feedback
        self.bh_model = bh_model
        self.sink_model = sink_model
        self.enrichment = enrichment
        self.tracers = tracers
        self.nu_model = nu_model
        if nu_model is not None and mesh_fn is None:
            raise ValueError(
                "neutrino delta-f particles are mesh-only gravity "
                "sources: run with split mesh kicks (mesh_fn)")
        self.state = {}

    # --- loading --------------------------------------------------------------
    def load_gas(self, pos, m, v, u, h, pid=None, Z=None, elem_frac=None):
        gas_engine = Engine(self.grid, self.sph, self.cfg, 0.0, 1.0)
        gas_engine.load_particles(pos, m, v, u, h, pid=pid, Z=Z,
                                  elem_frac=elem_frac)
        self.state["gas"] = gas_engine.state
        if self.sf is not None:
            # sticky per-particle SFR (star_formation_struct.h; feeds
            # SFR.txt and the StarFormationRates snapshot field)
            self.state["gas"]["sfr"] = jnp.zeros_like(
                self.state["gas"]["m"])
        if self.tracers is not None:
            self.state["gas"].update(
                self.tracers.init_fields(self.state["gas"]["m"].shape))
        self.n_particles = getattr(self, "n_particles", 0) + len(pos)

    def alloc_stars(self, extra_per_cell: int = 8):
        """Pre-allocate empty star slots for star formation — the analog of
        space_extra_sparts (space.h:53, default 100/cell in the reference;
        padded tiles make the cost K_s slots per cell here)."""
        C = self.grid.C
        K_s = int(extra_per_cell)
        z = lambda: jnp.zeros((C, K_s), F32)
        self.state["stars"] = {
            "mask": z(), "off": jnp.zeros((C, K_s, 3), F32),
            "pid": jnp.full((C, K_s), -1, I32),
            "m": z(), "v_full": jnp.zeros((C, K_s, 3), F32),
            "h": z(),
            "a_grav": jnp.zeros((C, K_s, 3), F32), "pot": z(),
            "a_grav_mesh": jnp.zeros((C, K_s, 3), F32), "pot_mesh": z(),
            "time_bin": jnp.zeros((C, K_s), I32),
            "birth_time": z(), "birth_density": z(), "fb_done": z(),
            "m_init": z(), "Z": z(),
            "elem_frac": jnp.zeros((C, K_s, 9), F32),
            "drift_accum": jnp.float32(0.0),
        }

    def load_stars(self, pos, m, v, h=None, pid=None,
                   extra_per_cell: int = 8):
        """Bucket existing star particles + extra free slots for SF."""
        n = len(pos)
        if pid is None:
            pid = np.arange(n, dtype=np.int32)
        if h is None:
            h = np.full(n, min(self.grid.edge) / 4, np.float32)
        fields = {
            "pid": jnp.asarray(pid, I32),
            "m": jnp.asarray(m, F32),
            "v_full": jnp.asarray(v, F32),
            "h": jnp.asarray(h, F32),
        }
        # headroom: K_s covers the loaded stars plus SF free slots
        out, mask, off, n_over = bucket_fields(self.grid, jnp.asarray(pos),
                                               fields)
        if int(n_over) != 0:
            raise RuntimeError(f"{int(n_over)} star particles overflow K")
        K0 = mask.shape[1]
        K_s = K0 + int(extra_per_cell)
        C = self.grid.C

        def pad(a, fill=0.0):
            extra_shape = (C, K_s - K0) + a.shape[2:]
            return jnp.concatenate(
                [a, jnp.full(extra_shape, fill, a.dtype)], axis=1)

        z = jnp.zeros((C, K_s), F32)
        self.state["stars"] = {
            "mask": pad(mask), "off": pad(off),
            "pid": pad(out["pid"], -1), "m": pad(out["m"]),
            "v_full": pad(out["v_full"]), "h": pad(out["h"]),
            "a_grav": jnp.zeros((C, K_s, 3), F32), "pot": z,
            "a_grav_mesh": jnp.zeros((C, K_s, 3), F32), "pot_mesh": z * 1.0,
            "time_bin": jnp.zeros((C, K_s), I32),
            "birth_time": z * 1.0, "birth_density": z * 1.0,
            "fb_done": z * 1.0,
            "m_init": pad(out["m"]), "Z": z * 1.0,
            "elem_frac": jnp.zeros((C, K_s, 9), F32)
            .at[..., 0].set(0.752).at[..., 1].set(0.248),
            "drift_accum": jnp.float32(0.0),
        }
        self.n_particles = getattr(self, "n_particles", 0) + n

    def load_dm(self, pos, m, v, pid=None):
        n = len(pos)
        if pid is None:
            pid = np.arange(n, dtype=np.int32)
        fields = {
            "pid": jnp.asarray(pid, I32),
            "m": jnp.asarray(m, F32),
            "v_full": jnp.asarray(v, F32),
        }
        out, mask, off, n_over = bucket_fields(
            self.grid, jnp.asarray(pos), fields,
            zsort=self.cfg.backend == "flat")
        if int(n_over) != 0:
            raise RuntimeError(f"{int(n_over)} DM particles overflow K")
        C, K = self.grid.C, self.grid.K
        self.state["dm"] = {
            "mask": mask, "off": off, **out,
            "a_grav": jnp.zeros((C, K, 3), F32),
            "a_grav_mesh": jnp.zeros((C, K, 3), F32),
            "pot": jnp.zeros((C, K), F32),
            "pot_mesh": jnp.zeros((C, K), F32),
            "time_bin": jnp.zeros((C, K), I32),
            "drift_accum": jnp.float32(0.0),
        }
        self.n_particles = getattr(self, "n_particles", 0) + n

    # --- split PM-mesh timestep over all species -----------------------------
    def _mesh_boundary(self):
        t = self.timeline
        ti = t.ti_current
        a_now = (self.cosmology.a_of_ti(ti)
                 if self.cosmology is not None else 1.0)
        dt_close = (0.0 if self.ti_mesh_mid is None
                    else self._kick_fac(self.ti_mesh_mid, ti))
        self.state, amax = _JIT_MESH_MULTI(self.mesh_fn, self.state,
                                           jnp.float32(dt_close),
                                           jnp.float32(0.0),
                                           self.nu_model,
                                           jnp.float32(a_now))
        dti = self._pick_mesh_dti(float(amax))
        self.ti_mesh_end = min(ti + dti, tl.MAX_NR_TIMESTEPS)
        self.ti_mesh_mid = min(ti + dti // 2, tl.MAX_NR_TIMESTEPS)
        dt_open = self._kick_fac(ti, self.ti_mesh_mid)
        self.state = _JIT_MESH_OPEN_MULTI(self.state, jnp.float32(dt_open))
        self.n_mesh_updates += 1

    def load_bh(self, pos, m, v, h=None, pid=None, m_subgrid=None):
        """Bucket black holes (EAGLE bpart: dynamical mass m, subgrid
        mass m_subgrid, AGN energy reservoir; black_holes_part.h)."""
        n = len(pos)
        if pid is None:
            pid = np.arange(n, dtype=np.int32)
        if h is None:
            h = np.full(n, min(self.grid.edge) / 4, np.float32)
        if m_subgrid is None:
            m_subgrid = np.asarray(m, np.float32)
        fields = {
            "pid": jnp.asarray(pid, I32),
            "m": jnp.asarray(m, F32),
            "m_subgrid": jnp.asarray(m_subgrid, F32),
            "v_full": jnp.asarray(v, F32),
            "h": jnp.asarray(h, F32),
        }
        out, mask, off, n_over = bucket_fields(
            self.grid, jnp.asarray(pos), fields,
            zsort=self.cfg.backend == "flat")
        if int(n_over) != 0:
            raise RuntimeError(f"{int(n_over)} BH particles overflow K")
        C, K = self.grid.C, mask.shape[1]
        z = lambda: jnp.zeros((C, K), F32)
        self.state["bh"] = {
            "mask": mask, "off": off, **out,
            "a_grav": jnp.zeros((C, K, 3), F32),
            "a_grav_mesh": jnp.zeros((C, K, 3), F32),
            "pot": z(), "pot_mesh": z(),
            "time_bin": jnp.zeros((C, K), I32),
            "energy_reservoir": z(), "swallow_prob": z(),
            "mdot": z(), "rho_gas": z(), "ngb_mass": z(),
            "drift_accum": jnp.float32(0.0),
        }
        if hasattr(self.bh_model, "init_extra_fields"):
            # model-specific carriers (SPIN_JET: spin, direction, jet
            # reservoir, mode, efficiencies — black_holes_part.h)
            self.state["bh"].update(
                self.bh_model.init_extra_fields((C, K), mask))
        self.n_particles = getattr(self, "n_particles", 0) + n

    def alloc_sinks(self, extra_per_cell: int = 8):
        """Pre-allocate empty sink slots for sink formation (the
        space_extra_sinks analog, space.h)."""
        C = self.grid.C
        K_k = int(extra_per_cell)
        z = lambda: jnp.zeros((C, K_k), F32)
        self.state["sinks"] = {
            "mask": z(), "off": jnp.zeros((C, K_k, 3), F32),
            "pid": jnp.full((C, K_k), -1, I32),
            "m": z(), "v_full": jnp.zeros((C, K_k, 3), F32),
            "r_cut": z(),
            "a_grav": jnp.zeros((C, K_k, 3), F32), "pot": z(),
            "a_grav_mesh": jnp.zeros((C, K_k, 3), F32), "pot_mesh": z(),
            "time_bin": jnp.zeros((C, K_k), I32),
            "swallowed_L": jnp.zeros((C, K_k, 3), F32),
            "n_gas_swallows": z(), "n_sink_swallows": z(),
            "drift_accum": jnp.float32(0.0),
        }

    def load_sinks(self, pos, m, v, pid=None, r_cut=None,
                   extra_per_cell: int = 8):
        """Bucket sink particles (PartType3; sink/GEAR/sink_part.h),
        keeping ``extra_per_cell`` free slots for in-run formation."""
        if self.sink_model is None:
            raise ValueError("load_sinks needs a sink_model")
        n = len(pos)
        if pid is None:
            pid = np.arange(n, dtype=np.int32)
        if r_cut is None:
            r_cut = np.full(n, self.sink_model.cut_off_radius, np.float32)
        fields = {
            "pid": jnp.asarray(pid, I32),
            "m": jnp.asarray(m, F32),
            "v_full": jnp.asarray(v, F32),
            "r_cut": jnp.asarray(r_cut, F32),
        }
        out, mask, off, n_over = bucket_fields(
            self.grid, jnp.asarray(pos), fields)
        if int(n_over) != 0:
            raise RuntimeError(f"{int(n_over)} sinks overflow K")
        C = self.grid.C
        K0 = mask.shape[1]
        K_k = K0 + int(extra_per_cell)

        def pad(a, fill=0.0):
            extra_shape = (C, K_k - K0) + a.shape[2:]
            return jnp.concatenate(
                [a, jnp.full(extra_shape, fill, a.dtype)], axis=1)

        z = lambda: jnp.zeros((C, K_k), F32)
        self.state["sinks"] = {
            "mask": pad(mask), "off": pad(off),
            "pid": pad(out["pid"], -1), "m": pad(out["m"]),
            "v_full": pad(out["v_full"]), "r_cut": pad(out["r_cut"]),
            "a_grav": jnp.zeros((C, K_k, 3), F32),
            "a_grav_mesh": jnp.zeros((C, K_k, 3), F32),
            "pot": z(), "pot_mesh": z(),
            "time_bin": jnp.zeros((C, K_k), I32),
            "swallowed_L": jnp.zeros((C, K_k, 3), F32),
            "n_gas_swallows": z(), "n_sink_swallows": z(),
            "drift_accum": jnp.float32(0.0),
        }
        self.n_particles = getattr(self, "n_particles", 0) + n

    def load_nu(self, pos, m, v=None, pid=None):
        """Bucket delta-f neutrino particles (PartType6).  Without
        explicit velocities, isotropic Fermi-Dirac thermal velocities are
        drawn from the ID-seeded sampler (fermi_dirac.c) so the initial
        delta-f weights vanish.  ``y0`` stores the sampled dimensionless
        momentum (neutrino.h:36 sampled magnitude)."""
        if self.nu_model is None:
            raise ValueError("load_nu needs a nu_model")
        n = len(pos)
        if pid is None:
            pid = np.arange(n, dtype=np.int32)
        a_now = (self.cosmology.a_of_ti(self.timeline.ti_current)
                 if self.cosmology is not None else 1.0)
        if v is None:
            v = self.nu_model.thermal_velocities(pid, a_now)
        y0 = np.asarray(self.nu_model.sample_y(jnp.asarray(pid)),
                        np.float32)
        fields = {
            "pid": jnp.asarray(pid, I32),
            "m": jnp.asarray(m, F32),
            "v_full": jnp.asarray(v, F32),
            "y0": jnp.asarray(y0, F32),
        }
        out, mask, off, n_over = bucket_fields(
            self.grid, jnp.asarray(pos), fields,
            zsort=self.cfg.backend == "flat")
        if int(n_over) != 0:
            raise RuntimeError(f"{int(n_over)} neutrinos overflow K")
        C, K = self.grid.C, mask.shape[1]
        self.state["nu"] = {
            "mask": mask, "off": off, **out,
            "a_grav": jnp.zeros((C, K, 3), F32),
            "a_grav_mesh": jnp.zeros((C, K, 3), F32),
            "pot": jnp.zeros((C, K), F32),
            "pot_mesh": jnp.zeros((C, K), F32),
            "time_bin": jnp.zeros((C, K), I32),
            "drift_accum": jnp.float32(0.0),
        }
        self.n_particles = getattr(self, "n_particles", 0) + n

    # --- stepping ---------------------------------------------------------------
    def init_particles(self):
        return self._with_regrid_retry(self._init_particles_once)

    def _init_particles_once(self):
        if self.mesh_fn is not None:
            self._mesh_boundary()
        T = self._tables()
        self.state, diag = _JIT_MULTI_INIT(
            self.grid, self.sph, self.cfg, self.gravity_fn, self.eps_soft,
            self.cosmo, self.state, T)
        self._post_step(diag)
        return diag

    def _step_once(self):
        t = self.timeline
        ti_next = self._ti_end_min
        if self.mesh_fn is not None:
            if self.ti_mesh_end is None:    # e.g. resumed run
                self._mesh_boundary()
            ti_next = min(ti_next, self.ti_mesh_end)
        ti_old = t.ti_current
        dt_drift = (ti_next - ti_old) * t.time_base
        t.ti_current = ti_next
        T = self._tables(dt_drift=dt_drift, ti_drift_start=ti_old)
        self.state, diag = _JIT_MULTI_STEP(
            self.grid, self.sph, self.cfg, self.gravity_fn, self.eps_soft,
            self.cosmo, self.state, T, self.cooling_fn, self.sf,
            self.feedback, self.bh_model, self.sink_model,
            self.enrichment, self.rt_fn, self.tracers)
        self._post_step(diag)
        self.step_count += 1
        if self.mesh_fn is not None and t.ti_current >= self.ti_mesh_end:
            self._mesh_boundary()
        return diag

    def _post_step(self, diag):
        from .engine import RegridNeeded
        counts = np.asarray(diag["bin_counts"])
        self._ti_end_min = self.timeline.ti_end_min_from_bins(counts)
        if int(diag["n_overflow"]) != 0:
            raise RegridNeeded(
                f"cell overflow during rebucket at step {self.step_count}")
        if int(diag["n_dt_too_small"]) != 0:
            raise RuntimeError("a particle wants dt < dt_min")
        if "gas" in self.state:
            h_reach = float(diag["h_max_active"]) * self.sph.kernel.gamma
            if h_reach > min(self.grid.edge) * (1 + 1e-5):
                raise RegridNeeded(
                    f"smoothing reach {h_reach:.4g} exceeds cell edge "
                    f"{min(self.grid.edge):.4g}", h_reach=h_reach)

    # --- automatic re-gridding over all species ---------------------------
    def _grid_reach(self, h_reach: float = 0.0) -> float:
        reach = float(self.cfg.p2p_reach)
        for name in ("gas", "stars", "bh"):
            sp = self.state.get(name)
            if sp is None or "h" not in sp:
                continue
            mask = np.asarray(sp["mask"]) > 0
            if mask.any():
                reach = max(reach,
                            float(np.asarray(sp["h"])[mask].max())
                            * self.sph.kernel.gamma * 1.05)
        return max(reach, h_reach * 1.05)

    def split_gas_particles(self, thr: float) -> int:
        """Gas-only splitting in the species pool: re-bucket the split
        gas onto the current grid, or regrid every species when the
        split overflows cell capacity (engine_split_gas_particles)."""
        r = self._split_arrays(self.state["gas"], thr)
        if r is None:
            return 0
        pos_all, merged, n = r
        try:
            self.state["gas"] = self._rebucket_species(self.grid, pos_all,
                                                       merged)
        except RuntimeError:
            self.regrid(_override={"gas": (pos_all, merged)})
        return n

    def regrid(self, h_reach: float = 0.0, _override=None):
        """space_regrid over every species: one new grid sized for the
        union of particles, each species re-bucketed onto it (stars keep
        their star-formation free slots).  ``_override`` replaces a
        species' live arrays with caller-provided (pos, fields) —
        used by the particle-splitting pass."""
        reach = self._grid_reach(h_reach)
        extracted = {}
        pos_all = []
        for name, sp in self.state.items():
            if _override is not None and name in _override:
                pos, fields = _override[name]
            else:
                pos, fields = self._extract_particles(sp)
            extracted[name] = (pos, fields)
            pos_all.append(pos)
        new_grid = self._build_grid(np.concatenate(pos_all), reach)
        new_state = {}
        for name, (pos, fields) in extracted.items():
            extra = 8 if (name == "stars" and self.sf is not None) \
                or (name == "sinks"
                    and self.sink_model is not None) else 0
            new_state[name] = self._rebucket_species(new_grid, pos,
                                                     fields,
                                                     extra_slots=extra)
        self.state = new_state
        self.grid = new_grid
        if self.gravity_fn is not None or self.mesh_fn is not None:
            self._rebind_gravity(new_grid)

    def _bind_solver(self, solver):
        if self.mesh_fn is not None:
            if self.cfg.shard_n > 0 and self.cfg.backend == "flat":
                self.gravity_fn = solver.short_range_sharded_fn(
                    self.cfg.shard_n)
            else:
                self.gravity_fn = solver.short_range_accelerations
            self.mesh_fn = solver.mesh_accelerations
            self.mesh_dt_scale = solver.pm.r_s
        else:
            self.gravity_fn = solver.accelerations
        if getattr(self, "external_potential", None) is not None:
            self.gravity_fn = self._compose_external(self.gravity_fn,
                                                     solver.grid)

    def _compose_external(self, gravity_fn, grid):
        """Multi-species variant: gravity_fn maps a LIST of species
        states to a list of (acc, pot) — apply the external potential
        to every species (external forces act on all part types,
        runner_others.c:114)."""
        one = make_external_gravity_fn(grid, self.external_potential)

        def ext_fn(states):
            return [one(s) for s in states]
        if gravity_fn is None:
            return ext_fn

        def fn(states):
            outs = gravity_fn(states)
            exts = ext_fn(states)
            return [(a1 + a2, (p2 if p1 is None else p1 + p2))
                    for (a1, p1), (a2, p2) in zip(outs, exts)]
        return fn
