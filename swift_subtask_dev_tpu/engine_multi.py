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
                     _call_gravity, bin_from_dt)
from .grid.cellgrid import CellGrid, bucket_fields
from .models.sph import sphenix
from .models.sph.sphenix import CosmoFactors, SPHENIXParams
from .utils import timeline as tl


def _species_active(sp: Dict, T: StepTables):
    mask_b = sp["mask"] > 0
    tb = jnp.clip(sp["time_bin"], 0, NBINS)
    return mask_b, tb, mask_b & T.active[tb]


def multi_step(grid: CellGrid, p: SPHENIXParams, cfg: EngineConfig,
               gravity_fn: Optional[Callable], eps_soft: float,
               cosmo: CosmoFactors, state: Dict[str, Dict], T: StepTables,
               cooling_fn: Optional[Callable] = None):
    """One engine step over {'gas': ..., 'dm': ...} species states."""
    gas = state.get("gas")
    dm = state.get("dm")
    n_overflow = jnp.int32(0)
    n_ghost_iter = jnp.int32(0)
    too_small_n = jnp.int32(0)
    n_woken = jnp.int32(0)
    n_active = jnp.int32(0)
    h_max_active = jnp.float32(0.0)

    # --- drift + rebucket + SPH loops (gas) ---------------------------------
    if gas is not None:
        s = gas
        mask_b, tb, active = _species_active(s, T)
        a_tot = s["a_hydro"] + s["a_grav"]
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
        gas = s
        gas_act = (mask_b, tb, active)
        n_active = n_active + jnp.sum(active)
        h_max_active = jnp.max(jnp.where(active, s["h"], 0.0))

    # --- drift + rebucket (dm) -----------------------------------------------
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

    # --- joint gravity (all species source; all receive) ---------------------
    if gravity_fn is not None:
        species = [sp for sp in (gas, dm) if sp is not None]
        outs = gravity_fn(species)
        idx = 0
        if gas is not None:
            acc, pot = outs[idx]
            idx += 1
            act = gas_act[2]
            gas = {**gas, "a_grav": jnp.where(act[..., None], acc,
                                              gas["a_grav"])}
            if pot is not None:
                gas = {**gas, "pot": jnp.where(act, pot, gas["pot"])}
        if dm is not None:
            acc, pot = outs[idx]
            act = dm_act[2]
            dm = {**dm, "a_grav": jnp.where(act[..., None], acc,
                                            dm["a_grav"])}
            if pot is not None:
                dm = {**dm, "pot": jnp.where(act, pot, dm["pot"])}

    # --- per-species KDK ------------------------------------------------------
    bin_counts = jnp.zeros(NBINS + 1, jnp.int32)
    if gas is not None:
        mask_b, tb, active = gas_act
        if cooling_fn is not None:
            upd = cooling_fn(gas, cosmo, T.dt_therm_full[tb])
            for k, v in upd.items():
                gas = {**gas, k: jnp.where(active, v, gas[k])}
        gas, too_small, woken = _gas_kdk(grid, p, cfg, cosmo, gas, T,
                                         active, mask_b, tb)
        too_small_n = too_small_n + jnp.sum(too_small)
        n_woken = n_woken + woken
        bins_masked = jnp.where(mask_b, jnp.clip(gas["time_bin"], 0, NBINS),
                                NBINS + 5)
        bin_counts = bin_counts + jnp.bincount(
            bins_masked.reshape(-1), length=NBINS + 6)[:NBINS + 1]
    if dm is not None:
        mask_b, tb, active = dm_act
        dm, too_small = _dm_kdk(cfg, eps_soft, dm, T, active, tb)
        too_small_n = too_small_n + jnp.sum(too_small)
        bins_masked = jnp.where(mask_b, jnp.clip(dm["time_bin"], 0, NBINS),
                                NBINS + 5)
        bin_counts = bin_counts + jnp.bincount(
            bins_masked.reshape(-1), length=NBINS + 6)[:NBINS + 1]

    out_state = {}
    if gas is not None:
        out_state["gas"] = gas
    if dm is not None:
        out_state["dm"] = dm
    diag = {
        "bin_counts": bin_counts,
        "n_overflow": n_overflow,
        "n_dt_too_small": too_small_n,
        "n_ghost_iter": n_ghost_iter,
        "n_active": n_active,
        "n_woken": n_woken,
        "h_max_active": h_max_active,
    }
    return out_state, diag


def multi_init(grid: CellGrid, p: SPHENIXParams, cfg: EngineConfig,
               gravity_fn: Optional[Callable], eps_soft: float,
               cosmo: CosmoFactors, state: Dict[str, Dict], T: StepTables):
    """engine_init_particles for all species: density/ghost + forces +
    initial bins + first half-kick (engine.c:1893)."""
    gas = state.get("gas")
    dm = state.get("dm")
    n_ghost_iter = jnp.int32(0)

    if gas is not None:
        mask_b = gas["mask"] > 0
        gas, n_ghost_iter = _gas_loops(grid, p, cfg, cosmo, gas, mask_b,
                                       T.dt_alpha * 0.0)

    if gravity_fn is not None:
        species = [sp for sp in (gas, dm) if sp is not None]
        outs = gravity_fn(species)
        idx = 0
        if gas is not None:
            acc, pot = outs[idx]
            idx += 1
            gas = {**gas, "a_grav": acc}
            if pot is not None:
                gas = {**gas, "pot": pot}
        if dm is not None:
            acc, pot = outs[idx]
            dm = {**dm, "a_grav": acc}
            if pot is not None:
                dm = {**dm, "pot": pot}

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
            a_norm = jnp.sqrt(jnp.sum((s["a_hydro"] + s["a_grav"]) ** 2, -1))
            eps = jnp.float32(eps_soft)
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

    if dm is not None:
        mask_b = dm["mask"] > 0
        a_norm = jnp.sqrt(jnp.sum(dm["a_grav"] ** 2, -1))
        new_dt = jnp.sqrt(2.0 * cfg.eta_grav * eps_soft
                          / jnp.maximum(a_norm, 1e-30))
        new_dt = jnp.minimum(new_dt, jnp.float32(cfg.dt_max))
        too_small_n = too_small_n + jnp.sum(mask_b & (new_dt < cfg.dt_min))
        new_bin = jnp.clip(bin_from_dt(new_dt, T.time_base_inv), 1, NBINS)
        new_bin = jnp.minimum(new_bin, T.max_bin)
        dm = {**dm, "time_bin": jnp.where(mask_b, new_bin, 0)}
        dt_k1 = T.dt_kick1[jnp.clip(dm["time_bin"], 0, NBINS)]
        dm = {**dm, "v_full": dm["v_full"] + dm["a_grav"] * dt_k1[..., None]
              * dm["mask"][..., None]}
        bins_masked = jnp.where(mask_b, jnp.clip(dm["time_bin"], 0, NBINS),
                                NBINS + 5)
        bin_counts = bin_counts + jnp.bincount(
            bins_masked.reshape(-1), length=NBINS + 6)[:NBINS + 1]

    out_state = {}
    if gas is not None:
        out_state["gas"] = gas
    if dm is not None:
        out_state["dm"] = dm
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
    }
    return out_state, diag


_JIT_MULTI_STEP = jax.jit(multi_step, static_argnums=(0, 1, 2, 3, 4, 8))
_JIT_MULTI_INIT = jax.jit(multi_init, static_argnums=(0, 1, 2, 3, 4))


class MultiEngine(Engine):
    """Gas + DM engine (the SmallCosmoVolume / EAGLE configuration)."""

    def __init__(self, grid: CellGrid, sph: SPHENIXParams,
                 cfg: EngineConfig, time_begin: float, time_end: float,
                 gravity_fn: Optional[Callable] = None,
                 eps_soft: float = 1e-3,
                 cosmo: Optional[CosmoFactors] = None, cosmology=None,
                 cooling_fn: Optional[Callable] = None):
        super().__init__(grid, sph, cfg, time_begin, time_end,
                         cosmo=cosmo, gravity_fn=gravity_fn,
                         cosmology=cosmology, cooling_fn=cooling_fn)
        self.eps_soft = float(eps_soft)
        self.state = {}

    # --- loading --------------------------------------------------------------
    def load_gas(self, pos, m, v, u, h, pid=None):
        gas_engine = Engine(self.grid, self.sph, self.cfg, 0.0, 1.0)
        gas_engine.load_particles(pos, m, v, u, h, pid=pid)
        self.state["gas"] = gas_engine.state
        self.n_particles = getattr(self, "n_particles", 0) + len(pos)

    def load_dm(self, pos, m, v, pid=None):
        n = len(pos)
        if pid is None:
            pid = np.arange(n, dtype=np.int32)
        fields = {
            "pid": jnp.asarray(pid, I32),
            "m": jnp.asarray(m, F32),
            "v_full": jnp.asarray(v, F32),
        }
        out, mask, off, n_over = bucket_fields(self.grid, jnp.asarray(pos),
                                               fields)
        if int(n_over) != 0:
            raise RuntimeError(f"{int(n_over)} DM particles overflow K")
        C, K = self.grid.C, self.grid.K
        self.state["dm"] = {
            "mask": mask, "off": off, **out,
            "a_grav": jnp.zeros((C, K, 3), F32),
            "pot": jnp.zeros((C, K), F32),
            "time_bin": jnp.zeros((C, K), I32),
            "drift_accum": jnp.float32(0.0),
        }
        self.n_particles = getattr(self, "n_particles", 0) + n

    # --- stepping ---------------------------------------------------------------
    def init_particles(self):
        T = self._tables()
        self.state, diag = _JIT_MULTI_INIT(
            self.grid, self.sph, self.cfg, self.gravity_fn, self.eps_soft,
            self.cosmo, self.state, T)
        self._post_step(diag)
        return diag

    def step(self):
        t = self.timeline
        ti_next = self._ti_end_min
        ti_old = t.ti_current
        dt_drift = (ti_next - ti_old) * t.time_base
        t.ti_current = ti_next
        T = self._tables(dt_drift=dt_drift, ti_drift_start=ti_old)
        self.state, diag = _JIT_MULTI_STEP(
            self.grid, self.sph, self.cfg, self.gravity_fn, self.eps_soft,
            self.cosmo, self.state, T, self.cooling_fn)
        self._post_step(diag)
        self.step_count += 1
        return diag

    def _post_step(self, diag):
        counts = np.asarray(diag["bin_counts"])
        self._ti_end_min = self.timeline.ti_end_min_from_bins(counts)
        if int(diag["n_overflow"]) != 0:
            raise RuntimeError(
                f"cell overflow during rebucket at step {self.step_count}")
        if int(diag["n_dt_too_small"]) != 0:
            raise RuntimeError("a particle wants dt < dt_min")
        if "gas" in self.state:
            h_reach = float(diag["h_max_active"]) * self.sph.kernel.gamma
            if h_reach > min(self.grid.edge) * (1 + 1e-5):
                raise RuntimeError(
                    f"smoothing reach {h_reach:.4g} exceeds cell edge "
                    f"{min(self.grid.edge):.4g}: re-grid needed")
