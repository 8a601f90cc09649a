"""The engine — SWIFT's task graph as one jit-compiled KDK step.

The reference orchestrates each step through a dynamic task DAG
(engine_step engine.c:2245 -> engine_launch -> runners).  Here the whole
step is a single bulk-synchronous jitted function over padded cell tiles:

    drift(all) -> rebucket -> density+ghost(active) -> gradient(active)
    -> force(active) -> kick2(active) -> timestep(active) -> kick1(active)

XLA's program order IS the dependency graph; per-particle time bins become
``where(active, new, old)`` masks (SWIFT skips inactive cells entirely —
engine_marktasks; we compute-and-mask, trading flops for regularity).

Host/device split for the integer timeline: the device never holds a 64-bit
tick.  Each step the host builds small per-bin tables (:class:`StepTables`)
— which bins are active, per-bin kick/drift intervals, bin-raise
permissions — and reads back per-bin occupancy from which it forms the
exact next ``ti_current`` (utils/timeline.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .grid.cellgrid import CellGrid, bucket_fields, rebucket_offsets
from .models import mhd
from .models.sph import sphenix
from .models.sph.sphenix import CosmoFactors, SPHENIXParams
from .ops import stencil
from .ops import gather_pairs
from .ops import hydro_pallas
from .utils import timeline as tl

F32 = jnp.float32
I32 = jnp.int32
NBINS = tl.NUM_TIME_BINS


class StepTables(NamedTuple):
    """Per-step host-built tables indexed by time bin (0..56)."""

    active: jnp.ndarray        # (57,) bool  — bin is active at ti_current
    dt_kick1: jnp.ndarray      # (57,) f32   — first-half kick of a new step
    dt_kick2: jnp.ndarray      # (57,) f32   — second-half kick of old step
    dt_therm1: jnp.ndarray     # (57,) f32
    dt_therm2: jnp.ndarray     # (57,) f32
    dt_alpha: jnp.ndarray      # (57,) f32   — full step length per bin
    dt_therm_full: jnp.ndarray  # (57,) f32  — thermal integral over the
    # particle's full elapsed step [ti-dti, ti] (cooling's dt_therm,
    # runner_others.c runner_do_cooling)
    aligned_up: jnp.ndarray    # (57,) bool  — bin b may be raised to b+1
    dt_drift: jnp.ndarray      # () f32      — drift interval of this step
    dt_therm_drift: jnp.ndarray  # () f32
    max_bin: jnp.ndarray       # () i32      — ceiling from dt_max
    min_bin: jnp.ndarray       # () i32      — floor from dt_min
    time_base_inv: jnp.ndarray  # () f32     — 1/time_base (for bin_from_dt)
    wake_dv: jnp.ndarray       # (57,57) f32 — limiter wake kick (velocity):
    # [old_bin, new_bin] -> net dt of (undo old kick1) + (advance to the new
    # step start) + (new kick1), timestep_limit_part (timestep_limiter.h:64)
    wake_du: jnp.ndarray       # (57,57) f32 — same for the thermal kick
    max_active_bin: jnp.ndarray  # () i32 — largest bin active at ti_current
    # (sync target for feedback-heated particles, runner_do_sync)
    ti_lo: jnp.ndarray         # () i32 — ti_current & 0x7FFFFFFF (RNG fold)
    ti_hi: jnp.ndarray         # () i32 — ti_current >> 31 (RNG fold)
    birth_time: jnp.ndarray    # () f32 — scale factor a (cosmological) or
    # time at ti_current, stamped on newly formed stars


@dataclass(frozen=True)
class EngineConfig:
    dt_min: float = 1e-17
    dt_max: float = 1e-2
    backend: str = "xla"  # 'xla' (roll-stencil; GSPMD-shardable) |
    # 'pallas' | 'gather' (Verlet candidate lists; fast where gathers are
    # cheap — CPU/GPU-style backends — but TPU gathers run at ~5% of HBM
    # peak, so the dense paths win on TPU)
    stencil_scan: bool = False  # lax.scan over offsets (small sharded graphs)
    with_hydro: bool = True
    with_self_gravity: bool = False
    with_external_gravity: bool = False
    max_ghost_iterations: int = 30
    ghost_unroll: bool = False  # unroll the ghost loop (GSPMD-friendly:
    # identical results whenever the while_loop would converge within
    # max_ghost_iterations, because unconverged-only masking makes the
    # extra iterations no-ops)
    rebucket_every_step: bool = False
    # trigger-based rebucket (the default): drift displacements are
    # accumulated and the counting sort runs only when the bound
    # 2*D + reach > min_edge could be violated — the analog of SWIFT's
    # rebuild triggers (engine.c:2392-2448) vs per-step rebuilds.
    rebucket_trigger: bool = True
    rebucket_safety: float = 0.9  # fraction of the safe margin to use
    # star/BH density-ghost: iterate their smoothing lengths to the
    # neighbour target over gas each step (runner_ghost.c:72,577); 0
    # keeps load-time h fixed (pre-round-4 behavior, debugging only)
    species_ghost_iterations: int = 8
    p2p_reach: float = 0.0    # P2P gravity r_cut (coverage margin term);
    # set by callers that wire a stencil-based gravity_fn
    shard_n: int = 0          # >0 with backend='flat': run the pair passes
    # under shard_map over an n-device x-slab mesh with explicit ppermute
    # column-slab halos (parallel/flat.py shard_flat_call — the proxy.c
    # analog), while the rebucket/KDK stay under GSPMD.  Use with
    # ghost_unroll=True (collectives inside while_loop are avoided).
    # Occupancy re-grid trigger — the TPU analog of the reference's
    # load-imbalance repartition (engine.c:1781, partition.c).  Under
    # shard_map/GSPMD every device computes the same padded shapes, so
    # live-count imbalance costs nothing directly; what DOES cost is K
    # (the global per-cell capacity) outgrowing the actual distribution —
    # every padded lane is masked-but-computed work.  Re-grid when the
    # rebuilt capacity (fullest live cell x rebuild headroom) would be
    # below trigger*K, i.e. the current tiles waste > (1-trigger) of
    # their lanes.  The overflow direction (clustering outgrew K) is the
    # existing RegridNeeded path.  <= 0 disables.
    regrid_shrink_trigger: float = 0.5
    regrid_cooldown: int = 20  # min steps between occupancy re-grids
    eta_grav: float = 0.025   # Gravity:eta
    eps_soft: float = 1e-3    # Gravity:eps — gas gravity softening used by
    # the dt_grav = sqrt(2 eta eps/|a|) criterion (timestep.h:141); a
    # per-particle 'softening' field in the state overrides it
    mesh_dt_max: float = 0.0  # ceiling for the split PM-mesh interval
    # (engine.c ti_mesh is bounded by TimeIntegration:dt_max like any
    # bin).  0 -> cfg.dt_max.  run_fixed_dt drives particles at dt_max
    # itself, so callers there set the TRUE TimeIntegration ceiling here
    # — otherwise the mesh boundary fires every step and each boundary
    # costs blocking host roundtrips.
    chem_diffusion: float = 0.0  # GEARChemistry:diffusion_coefficient —
    # Smagorinsky turbulent metal diffusion between gas neighbours
    # (chemistry/GEAR_DIFFUSION); 0 = off
    pressure_floor: object = None  # optional GEARPressureFloor: clamp the
    # ghost-finalised comoving pressure before the gradient/force loops
    # (pressure_floor/GEAR/pressure_floor.h wraps every pressure read)
    with_timestep_limiter: bool = False  # SWIFT --limiter: cap active bins
    # at min_ngb+2 and wake inactive particles whose neighbours got fast
    # (runner_do_limiter, runner_time_integration.c:1324)
    # --- gather backend (ops/gather_pairs.py) -------------------------------
    ngb_cap: int = 128        # candidate-list capacity per particle; the
    # engine refuses a step whose build found more (no silent loss)
    nbr_h_slack: float = 0.1  # h budget the list stays valid for (the
    # ghost may grow h by this factor between rebuilds)
    nbr_skin_frac: float = 0.18  # Verlet skin as a fraction of the
    # slack-inflated reach (caps the candidate volume at ~2.2 kernel balls)


class RegridNeeded(RuntimeError):
    """A step hit a capacity/coverage wall (cell overflow or h outgrowing
    the cell edge): the host must rebuild the grid and retry — the analog
    of space_regrid (space.c) resizing the top grid when h grows."""

    def __init__(self, reason: str, h_reach: float = 0.0):
        super().__init__(reason)
        self.reason = reason
        self.h_reach = h_reach


def _call_gravity(gravity_fn, s):
    """gravity_fn may return acc or (acc, potential)."""
    out = gravity_fn(s)
    if isinstance(out, tuple):
        return out
    return out, None


def make_external_gravity_fn(grid, potential):
    """Wrap an external potential (models/potentials.py) as a
    single-species gravity_fn over the padded tiles — the
    external_gravity_acceleration runner (runner_others.c:114)."""
    corners = jnp.asarray(np.asarray(grid.cell_corners()), F32)

    def fn(s):
        pos = corners[:, None, :] + s["off"]
        acc, pot = potential(pos)
        m = s["mask"] > 0
        return acc * m[..., None], pot * m
    return fn


def compose_gravity_fns(self_fn, ext_fn):
    """Sum a self-gravity fn and an external-potential fn (both
    state -> (acc, pot)); either may be None."""
    if self_fn is None:
        return ext_fn
    if ext_fn is None:
        return self_fn

    def fn(s):
        a1, p1 = _call_gravity(self_fn, s)
        a2, p2 = _call_gravity(ext_fn, s)
        return a1 + a2, (p2 if p1 is None else p1 + p2)
    return fn


def bin_from_dt(dt: jnp.ndarray, time_base_inv: float) -> jnp.ndarray:
    """Largest bin with 2^(b+1)*time_base <= dt (timeline.h get_time_bin).

    Uses frexp for an exact floor(log2) on f32 — no transcendental
    imprecision at power-of-two boundaries.
    """
    dti = jnp.maximum(dt * jnp.float32(time_base_inv), 2.0)
    _, e = jnp.frexp(dti)  # dti = m * 2^e, m in [0.5, 1)
    return (e - 2).astype(I32)


# ---------------------------------------------------------------------------
# The jitted hydro step
# ---------------------------------------------------------------------------

class _ScanStencil:
    """stencil loops with use_scan=True (GSPMD-friendly small graphs)."""

    @staticmethod
    def density_loop(grid, s, p):
        return stencil.density_loop(grid, s, p, use_scan=True)

    @staticmethod
    def gradient_loop(grid, s, p, cosmo):
        return stencil.gradient_loop(grid, s, p, cosmo, use_scan=True)

    @staticmethod
    def force_loop(grid, s, p, cosmo):
        return stencil.force_loop(grid, s, p, cosmo, use_scan=True)


def _loops(cfg: EngineConfig):
    """Select the neighbour-loop backend (ops/gather_pairs, ops/stencil or
    ops/hydro_pallas)."""
    if cfg.backend == "gather":
        return gather_pairs
    if cfg.backend == "flat":
        if cfg.shard_n > 0:
            return _ShardedFlat(cfg.shard_n)
        return _FlatPallas           # column/z-sorted engine (pallas_flat)
    if cfg.backend == "pallas":
        return hydro_pallas          # packed-j engine (pallas_packed.py)
    if cfg.backend == "pallas_ring":
        return _RingPallas           # ring-buffer DMA engine (round 1)
    if cfg.stencil_scan:
        return _ScanStencil
    return stencil


class _FlatPallas:
    """hydro_pallas loops on the column/z-sorted flat kernel."""

    # the flat kernel can skip fully-converged i-tiles via zeroed range
    # words (ghost subset re-runs, runner_ghost.c:1085)
    SUPPORTS_ACTIVE_I = True

    @staticmethod
    def density_loop(grid, s, p, active_i=None):
        return hydro_pallas.density_loop(grid, s, p, engine="flat",
                                         active_i=active_i)

    @staticmethod
    def gradient_loop(grid, s, p, cosmo, active_i=None):
        return hydro_pallas.gradient_loop(grid, s, p, cosmo, engine="flat",
                                          active_i=active_i)

    @staticmethod
    def force_loop(grid, s, p, cosmo, active_i=None):
        return hydro_pallas.force_loop(grid, s, p, cosmo, engine="flat",
                                       active_i=active_i)

    @staticmethod
    def force_gravity_loop(grid, s, p, cosmo, fuse_spec, active_i=None):
        return hydro_pallas.force_gravity_loop(grid, s, p, cosmo,
                                               **fuse_spec,
                                               active_i=active_i)


class _ShardedFlat:
    """Flat pair passes under shard_map with ppermute column-slab halos
    (parallel/flat.py shard_flat_call); everything else stays GSPMD."""

    def __init__(self, n: int, axis: str = "x"):
        self.n = n
        self.axis = axis

    def density_loop(self, grid, s, p):
        from .parallel.flat import shard_flat_call
        return shard_flat_call(
            grid, self.n, self.axis,
            lambda g, st: hydro_pallas.density_loop(g, st, p,
                                                    engine="flat"), s)

    def gradient_loop(self, grid, s, p, cosmo):
        from .parallel.flat import shard_flat_call
        return shard_flat_call(
            grid, self.n, self.axis,
            lambda g, st: hydro_pallas.gradient_loop(g, st, p, cosmo,
                                                     engine="flat"), s)

    def force_loop(self, grid, s, p, cosmo):
        from .parallel.flat import shard_flat_call
        return shard_flat_call(
            grid, self.n, self.axis,
            lambda g, st: hydro_pallas.force_loop(g, st, p, cosmo,
                                                  engine="flat"), s)

    def force_gravity_loop(self, grid, s, p, cosmo, fuse_spec,
                           active_i=None):
        # fused hydro force + P2P gravity under shard_map: the one-slab
        # ppermute halo already covers max(gamma*h, r_cut) — the grid's
        # column width is sized by that same max when self-gravity is on
        from .parallel.flat import shard_flat_call
        return shard_flat_call(
            grid, self.n, self.axis,
            lambda g, st: hydro_pallas.force_gravity_loop(
                g, st, p, cosmo, **fuse_spec), s)


class _RingPallas:
    """hydro_pallas loops on the original ring-buffer DMA kernel."""

    @staticmethod
    def density_loop(grid, s, p):
        return hydro_pallas.density_loop(grid, s, p, engine="ring")

    @staticmethod
    def gradient_loop(grid, s, p, cosmo):
        return hydro_pallas.gradient_loop(grid, s, p, cosmo, engine="ring")

    @staticmethod
    def force_loop(grid, s, p, cosmo):
        return hydro_pallas.force_loop(grid, s, p, cosmo, engine="ring")


def _nbr_rebuild(grid: CellGrid, cfg: EngineConfig, p: SPHENIXParams,
                 s: Dict) -> Dict:
    """(Re)build the gather backend's candidate lists + validity budgets.

    Called right after every rebucket (slot indices are only stable between
    rebuckets).  Sets:
      h_cap        per-particle h budget the lists stay complete for
      nbr_dbudget  per-particle displacement budget before a rebuild
      nbr_maxcount worst-case candidate count (host refuses > ngb_cap)
    """
    mask_b = s["mask"] > 0
    gamma = float(p.kernel.gamma)
    min_edge = float(min(grid.edge))
    cap_limit = jnp.float32(min(float(p.h_max), min_edge / gamma))
    h_cap = jnp.maximum(
        jnp.minimum(s["h"] * (1.0 + cfg.nbr_h_slack), cap_limit), s["h"])
    h_cap = jnp.where(mask_b, h_cap, 0.0)
    reach = jnp.max(h_cap) * jnp.float32(gamma)
    skin = jnp.minimum(jnp.float32(cfg.rebucket_safety)
                       * (jnp.float32(min_edge) - reach),
                       jnp.float32(cfg.nbr_skin_frac) * reach)
    skin = jnp.maximum(skin, 0.0)
    idx, code, maxc, maxt = gather_pairs.build_nbr_list(
        grid, s["off"], s["mask"], h_cap, p, cfg.ngb_cap, skin)
    # skin-candidate overflow is harmless (true pairs outrank skin ones in
    # the build) but voids the drift budget: rebuild every step instead
    dbudget = jnp.where(maxc > cfg.ngb_cap, 0.0,
                        jnp.float32(0.5) * skin)
    return {**s, "nbr_idx": idx, "nbr_code": code, "h_cap": h_cap,
            "nbr_dbudget": dbudget, "nbr_maxcount": maxt}


def _ghost_density(grid: CellGrid, p: SPHENIXParams, cosmo: CosmoFactors,
                   s: Dict, active: jnp.ndarray, max_iter: int,
                   loops=stencil, unroll: bool = False):
    """Density loop + smoothing-length iteration (the ghost).

    The reference re-runs subset pair loops on unconverged particles
    (runner_ghost.c:1085); here a `lax.while_loop` re-runs the full masked
    density pass until every active particle's h satisfies the Newton/
    bisection update — data-dependent trip count, static shapes.
    """
    kroot = jnp.float32(p.kernel.root)

    extra_keys = tuple(getattr(p.mod, "DENSITY_EXTRA_KEYS", ()))
    # flat engine: re-run only i-tiles holding unconverged particles
    # (the reference's unconverged-subset loops, runner_ghost.c:1085);
    # exact because rho_i depends on h_i only, so skipped tiles' old
    # values stay valid and mixed tiles recompute in full
    subset = getattr(loops, "SUPPORTS_ACTIVE_I", False)

    def density_pass(h, act=None):
        kw = {"active_i": act} if (act is not None and subset) else {}
        dens = loops.density_loop(grid, {**s, "h": h}, p, **kw)
        full = p.mod.end_density(p, {**s, "h": h, **dens}, cosmo)
        return {k: full[k] for k in
                ("rho", "rho_dh", "wcount", "wcount_dh", "div_v", "rot_v")
                + extra_keys}

    # gather backend: the candidate lists are only complete up to h_cap, so
    # the iteration is clamped there; a pinned particle triggers a rebuild
    # next step, which raises the cap (see _nbr_rebuild)
    h_cap = s.get("h_cap")

    def h_update(h, d, left, right):
        has_ngb = d["wcount"] * h ** 3 > kroot * (1.0 + 1e-5)
        h_new, left, right, conv = p.mod.ghost_h_update(
            p, h, d["wcount"], d["wcount_dh"], left, right, has_ngb)
        if h_cap is not None:
            hit = h_new >= h_cap
            h_new = jnp.minimum(h_new, h_cap)
            conv = conv | hit
        return h_new, left, right, conv

    h0 = s["h"]
    left0 = jnp.zeros_like(h0)
    right0 = (jnp.full_like(h0, p.h_max) if h_cap is None
              else jnp.minimum(h_cap, p.h_max))
    # tiles with no ACTIVE particle skip even the first pass: their old
    # densities are kept by _gas_loops' active-masked merge
    d0 = density_pass(h0, act=active)
    _, _, _, conv0 = h_update(h0, d0, left0, right0)
    conv0 = conv0 | ~active

    if max_iter == 0:
        # ghost-free mode: one Newton h-update + one re-density.  Used by
        # the multi-chip dry run — GSPMD sharding propagation through a
        # while_loop with a ~40-leaf carry is pathologically slow, and a
        # straight-line step exercises the same collectives.
        h1, _, _, _ = h_update(h0, d0, left0, right0)
        h1 = jnp.where(active, h1, h0)
        d1 = density_pass(h1)
        return h1, d1, jnp.int32(1)

    def cond(c):
        h, d, left, right, conv, it = c
        return (it < max_iter) & jnp.any(~conv)

    def body(c):
        h, d, left, right, conv, it = c
        h_new, left, right, c_new = h_update(h, d, left, right)
        upd = active & ~conv
        h = jnp.where(upd, h_new, h)
        d_new = density_pass(h, act=upd)
        if subset:
            C, W = h.shape
            tflag = jnp.any(upd.reshape(C, W // 128, 128), axis=2)
            fp = jnp.broadcast_to(
                tflag[:, :, None], (C, W // 128, 128)).reshape(C, W)
            d = {k: jnp.where(fp[..., None] if d[k].ndim == 3 else fp,
                              d_new[k], d[k]) for k in d}
        else:
            d = d_new
        h2_new, _, _, c2 = h_update(h, d, left, right)
        conv = conv | ~upd | (upd & c2)
        return (h, d, left, right, conv, it + 1)

    if unroll:
        # straight-line version for GSPMD-sharded compiles: sharding
        # propagation through a while_loop with this many carries is
        # pathologically slow, and the unconverged-only masking makes the
        # unrolled body a no-op once converged, so results match the
        # while_loop whenever it converges within max_iter.
        c = (h0, d0, left0, right0, conv0, jnp.int32(0))
        for _ in range(max_iter):
            c = body(c)
        h, d, _, _, _, n_iter = c
        return h, d, n_iter

    h, d, left, right, conv, n_iter = jax.lax.while_loop(
        cond, body, (h0, d0, left0, right0, conv0, jnp.int32(0)))
    return h, d, n_iter


def _gas_loops(grid: CellGrid, p: SPHENIXParams, cfg: EngineConfig,
               cosmo: CosmoFactors, s: Dict, active, dt_alpha_table,
               fuse_spec: Optional[Dict] = None):
    """The SPH loop chain on gas tiles: density+ghost -> gradient -> force.

    Shared by the single-species hydro_step and the multi-species engine.
    Updates only active particles; returns (state, n_ghost_iter).

    ``fuse_spec`` (flat backend only): gravity literals
    {G, H_soft, r_s, r_cut, periodic_truncation} — the force loop then
    also computes short-range P2P self-gravity in the SAME pair pass
    (hydro_pallas.force_gravity_loop) and merges a_grav/pot here; the
    caller skips its separate gravity_fn call.
    """
    tb = jnp.clip(s["time_bin"], 0, NBINS)
    loops = _loops(cfg)
    # flat backend: i-tiles with no active particle skip the pair loops
    # entirely (zeroed range words) — the active-masked merges below keep
    # their old values, so hierarchical-timestep steps cost O(active)
    akw = ({"active_i": active}
           if getattr(loops, "SUPPORTS_ACTIVE_I", False) else {})
    h_new, dens, n_ghost_iter = _ghost_density(
        grid, p, cosmo, s, active, cfg.max_ghost_iterations, loops,
        unroll=cfg.ghost_unroll)
    s = {**s, "h": jnp.where(active, h_new, s["h"])}
    for k, v in dens.items():
        act = active[..., None] if v.ndim == 3 else active
        s = {**s, k: jnp.where(act, v, s[k])}
    s_fb = p.mod.no_neighbours_fallback(p, s)
    fb_keys = ("rho", "v_sig", "wcount", "rho_dh", "wcount_dh",
               "div_v", "laplace_u", "rot_v") \
        + tuple(getattr(p.mod, "DENSITY_EXTRA_KEYS", ()))
    s = {**s, **{k: jnp.where(active if s[k].ndim == 2 else active[..., None],
                              s_fb[k], s[k])
                 for k in fb_keys}}

    # --- prepare gradient + gradient loop ----------------------------------
    prep = p.mod.prepare_gradient(p, s, cosmo)
    rg = p.mod.reset_gradient(prep)
    pg_keys = getattr(p.mod, "PREPARE_GRADIENT_KEYS",
                      ("f_gradh", "pressure", "soundspeed", "balsara"))
    for k in pg_keys + ("v_sig", "alpha_visc_max_ngb"):
        s = {**s, k: jnp.where(active, rg[k], s[k])}
    if getattr(cfg, "pressure_floor", None) is not None:
        s = {**s, **cfg.pressure_floor.apply(s, cosmo, active)}

    if getattr(p.mod, "HAS_GRADIENT_LOOP", True):
        grad = loops.gradient_loop(grid, s, p, cosmo, **akw)
        for k, v in grad.items():
            s = {**s, k: jnp.where(active, v, s[k])}
        eg = p.mod.end_gradient(s)
        for k in getattr(p.mod, "GRADIENT_END_KEYS", ("laplace_u",)):
            s = {**s, k: jnp.where(active, eg[k], s[k])}

    # --- prepare force (alpha evolution) + force loop -----------------------
    dt_alpha = dt_alpha_table[tb]
    pf = p.mod.prepare_force(p, s, cosmo, dt_alpha)
    pf_keys = getattr(p.mod, "PREPARE_FORCE_KEYS",
                      ("alpha_visc", "div_v_prev", "alpha_diff"))
    for k in pf_keys:
        s = {**s, k: jnp.where(active, pf[k], s[k])}
    ra = p.mod.reset_acceleration(s)
    for k in ("a_hydro", "u_dt", "h_dt"):
        v = ra[k]
        act = active[..., None] if v.ndim == 3 else active
        s = {**s, k: jnp.where(act, v, s[k])}

    if fuse_spec is not None:
        force = loops.force_gravity_loop(grid, s, p, cosmo, fuse_spec,
                                         **akw)
        a_grav = force.pop("a_grav")
        pot = force.pop("pot")
        s = {**s, "a_grav": jnp.where(active[..., None], a_grav,
                                      s["a_grav"])}
        if "pot" in s:
            s = {**s, "pot": jnp.where(active, pot, s["pot"])}
    else:
        force = loops.force_loop(grid, s, p, cosmo, **akw)
    for k, v in force.items():
        act = active[..., None] if v.ndim == 3 else active
        s = {**s, k: jnp.where(act, v, s[k])}
    ef = p.mod.end_force(p, s)
    # u_dt too: entropy schemes convert the raw force-loop sum here
    # (Gadget2 hydro_end_force, hydro.h:868)
    s = {**s, "h_dt": jnp.where(active, ef["h_dt"], s["h_dt"]),
         "u_dt": jnp.where(active, ef["u_dt"], s["u_dt"])}
    return s, n_ghost_iter


def hydro_step(grid: CellGrid, p: SPHENIXParams, cfg: EngineConfig,
               gravity_fn: Optional[Callable],
               cosmo: CosmoFactors, s: Dict, T: StepTables,
               cooling_fn: Optional[Callable] = None,
               rt_fn: Optional[Callable] = None):
    """One full engine step (drift -> loops -> KDK) for the gas.

    Returns (new_state, diagnostics).  Mirrors engine_step (engine.c:2245)
    with all 64-bit timeline logic hoisted to the host via ``T``.
    """
    if "drift_accum" not in s:  # older checkpoints: force a rebucket
        s = {**s, "drift_accum": jnp.float32(1e30)}
    if "a_grav_mesh" not in s:  # pre-split-mesh checkpoints
        s = {**s, "a_grav_mesh": jnp.zeros_like(s["a_grav"]),
             "pot_mesh": jnp.zeros_like(s["m"])}
    mask_b = s["mask"] > 0
    tb = jnp.clip(s["time_bin"], 0, NBINS)
    active = mask_b & T.active[tb]

    # --- drift all (drift.h:144 drift_part) --------------------------------
    a_tot = s["a_hydro"] + s["a_grav"] + s["a_grav_mesh"]
    s = {**s,
         "off": s["off"] + s["v_full"] * T.dt_drift * s["mask"][..., None],
         "v": s["v"] + a_tot * T.dt_drift}
    s = p.mod.predict_extra(p, s, cosmo, T.dt_drift, T.dt_therm_drift)
    s = mhd.predict_extra(p, s, cosmo, T.dt_drift, T.dt_therm_drift)

    # --- rebucket (space_rebuild analog) ------------------------------------
    reach = jnp.maximum(
        jnp.max(jnp.where(mask_b, s["h"], 0.0))
        * jnp.float32(p.kernel.gamma),
        jnp.float32(cfg.p2p_reach))
    s, n_overflow = _rebucket_phase(grid, cfg, s, T, reach, p)
    mask_b = s["mask"] > 0
    tb = jnp.clip(s["time_bin"], 0, NBINS)
    active = mask_b & T.active[tb]

    # --- density/ghost/gradient/force loops (active only) -------------------
    # flat backend + a gravity_fn that advertises its P2P literals: run
    # short-range gravity INSIDE the force pass (one traversal, shared
    # j-windows) instead of as a separate pair loop
    # (sharded runs fuse too: _ShardedFlat.force_gravity_loop carries
    # the pass under shard_map with the same one-slab halo)
    fuse_spec = (getattr(gravity_fn, "fuse_spec", None)
                 if cfg.backend == "flat" else None)
    s, n_ghost_iter = _gas_loops(grid, p, cfg, cosmo, s, active,
                                 T.dt_alpha, fuse_spec=fuse_spec)

    # --- gravity ------------------------------------------------------------
    if gravity_fn is not None and fuse_spec is None:
        a_grav, pot = _call_gravity(gravity_fn, s)
        s = {**s, "a_grav": jnp.where(active[..., None], a_grav,
                                      s["a_grav"])}
        if pot is not None and "pot" in s:
            s = {**s, "pot": jnp.where(active, pot, s["pot"])}

    # --- cooling: rewrite u_dt before kick2 integrates it --------------------
    # (runner_do_cooling, runner_others.c; cooling_cool_part semantics)
    if cooling_fn is not None:
        upd = cooling_fn(s, cosmo, T.dt_therm_full[tb])
        for k, v in upd.items():
            s = {**s, k: jnp.where(active, v, s[k])}

    # --- radiative transfer: subcycled inject/transport/thermochem ----------
    # (the RT task chain of runner_main.c between the hydro force and the
    # kicks; radiation advances globally over the step's drift interval)
    if rt_fn is not None:
        s = rt_fn(grid, s, T)

    s, too_small, n_woken = _gas_kdk(grid, p, cfg, cosmo, s, T, active,
                                     mask_b, tb)

    # --- diagnostics ---------------------------------------------------------
    bins_masked = jnp.where(mask_b, jnp.clip(s["time_bin"], 0, NBINS),
                            NBINS + 5)
    bin_counts = jnp.bincount(bins_masked.reshape(-1), length=NBINS + 6)
    diag = {
        "bin_counts": bin_counts[:NBINS + 1],
        "n_overflow": n_overflow,
        "n_dt_too_small": jnp.sum(too_small),
        "n_ghost_iter": n_ghost_iter,
        "n_active": jnp.sum(active),
        "n_woken": n_woken,
        "h_max_active": jnp.max(jnp.where(active, s["h"], 0.0)),
        "nbr_maxcount": s.get("nbr_maxcount", jnp.int32(0)),
        # particle-splitting trigger (engine_split_gas_particles)
        "m_max_gas": jnp.max(jnp.where(mask_b, s["m"], 0.0)),
        # fullest live cell — the occupancy re-grid trigger input
        "k_max_live": jnp.max(jnp.sum(mask_b, axis=1)),
    }
    return s, diag


_NBR_KEYS = ("nbr_idx", "nbr_code", "h_cap", "nbr_dbudget", "nbr_maxcount")


def _rebucket_phase(grid: CellGrid, cfg: EngineConfig, s: Dict,
                    T: StepTables, reach, p: Optional[SPHENIXParams] = None):
    """Counting-sort rebuild, either unconditional or trigger-based.

    Trigger: after cumulative per-particle drift D, a true pair can only
    straddle >1 cell when 2*D + reach >= min_edge — rebucket before that,
    like SWIFT's rebuild triggers (engine.c:2392-2448) tied to cell width
    >= h_max (space_regrid, space.c).  ``reach`` is the largest pair
    interaction range of this species (gamma*h_max and/or the P2P r_cut).

    In gather mode (``p`` given, cfg.backend == 'gather') the same trigger
    also protects the Verlet lists: the drift budget is the skin stored at
    build, a particle whose h pinned at its list cap forces a rebuild, and
    every rebucket is followed by a list rebuild (slot indices shift).
    """
    gather = cfg.backend == "gather" and p is not None

    def _rebucket(st):
        skip = ("mask", "off", "drift_accum") + (_NBR_KEYS if gather else ())
        carried = {k: v for k, v in st.items() if k not in skip}
        new_fields, new_mask, new_off, nov = rebucket_offsets(
            grid, st["mask"], st["off"], carried,
            zsort=cfg.backend == "flat")
        ns = {"mask": new_mask, "off": new_off,
              "drift_accum": jnp.zeros_like(st["drift_accum"]),
              **new_fields}
        if gather:
            ns = _nbr_rebuild(grid, cfg, p, ns)
        return ns, nov

    if cfg.rebucket_every_step:
        return _rebucket(s)
    if not cfg.rebucket_trigger:
        return s, jnp.int32(0)
    mask_b = s["mask"] > 0
    v_norm = jnp.sqrt(jnp.sum(s["v_full"] ** 2, -1))
    step_disp = jnp.max(jnp.where(mask_b, v_norm, 0.0)) \
        * jnp.abs(T.dt_drift)
    accum = s["drift_accum"] + step_disp
    if gather:
        gamma = float(p.kernel.gamma)
        min_edge = float(min(grid.edge))
        cap_limit = jnp.float32(min(float(p.h_max), min_edge / gamma))
        pinned = jnp.any(mask_b & (s["h"] >= 0.999 * s["h_cap"])
                         & (s["h_cap"] < 0.999 * cap_limit))
        need = (accum >= s["nbr_dbudget"]) | pinned
        if cfg.p2p_reach > 0.0:
            margin_p2p = jnp.float32(0.5 * cfg.rebucket_safety) \
                * (jnp.float32(min_edge) - jnp.float32(cfg.p2p_reach))
            need = need | (accum >= margin_p2p)
    else:
        margin = jnp.float32(0.5 * cfg.rebucket_safety) \
            * (jnp.float32(min(grid.edge)) - reach)
        need = accum >= margin
    s = {**s, "drift_accum": accum}
    return jax.lax.cond(need, _rebucket,
                        lambda st: (st, jnp.int32(0)), s)


def _gas_kdk(grid: CellGrid, p: SPHENIXParams, cfg: EngineConfig,
             cosmo: CosmoFactors, s: Dict, T: StepTables,
             active, mask_b, tb):
    """kick2 -> timestep -> kick1 -> limiter for the gas (kick.h kick_part,
    runner_do_timestep, runner_do_limiter).  Returns (s, too_small, woken).
    """
    # --- kick2: second half of the step that just ended ----------------------
    dt_k2 = T.dt_kick2[tb]
    dt_t2 = T.dt_therm2[tb]
    a_tot = s["a_hydro"] + s["a_grav"]
    v_full = s["v_full"] + a_tot * dt_k2[..., None]
    s = {**s, "v_full": jnp.where(active[..., None], v_full, s["v_full"])}
    ke = p.mod.kick_extra(p, s, cosmo, dt_t2)
    for k in getattr(p.mod, "KICK_EXTRA_KEYS", ("u_full", "u_dt")):
        s = {**s, k: jnp.where(active, ke[k], s[k])}
    s = mhd.kick_extra(p, s, cosmo, dt_t2)  # kick.h:277 (no-op under None)

    # reset predicted values at the kick point (runner_time_integration:463)
    rp = p.mod.reset_predicted_values(p, s)
    for k in ("v", "u", "pressure", "soundspeed", "v_sig"):
        v = rp[k]
        act = active[..., None] if v.ndim == 3 else active
        s = {**s, k: jnp.where(act, v, s[k])}
    if getattr(cfg, "pressure_floor", None) is not None:
        # the reference's floor wraps EVERY comoving-pressure read,
        # including hydro_reset_predicted_values (pressure_floor.h:71)
        s = {**s, **cfg.pressure_floor.apply(s, cosmo, active)}

    # --- timestep: pick the new bin (runner_do_timestep, timestep.h) --------
    dt_cfl = p.mod.compute_timestep(p, s, cosmo)
    dt_h = p.mod.timestep_h_change_limit(p, s)
    new_dt = jnp.minimum(dt_cfl, dt_h)
    if cfg.with_self_gravity or cfg.with_external_gravity:
        a_norm = jnp.sqrt(jnp.sum(
            (s["a_hydro"] + s["a_grav"] + s["a_grav_mesh"]) ** 2, -1))
        eps = s.get("softening", jnp.float32(cfg.eps_soft))
        dt_grav = jnp.sqrt(2.0 * cfg.eta_grav * eps
                           / jnp.maximum(a_norm, 1e-30))
        new_dt = jnp.minimum(new_dt, dt_grav)
    new_dt = jnp.minimum(new_dt, jnp.float32(cfg.dt_max))

    too_small = active & (new_dt < cfg.dt_min)
    want_bin = bin_from_dt(new_dt, T.time_base_inv)
    want_bin = jnp.minimum(want_bin, T.max_bin)
    if cfg.with_timestep_limiter:
        # neighbour cap from the force-loop min reduction
        # (make_integer_timestep, timestep.h:58)
        want_bin = jnp.minimum(want_bin, s["min_ngb_time_bin"] + 2)
    want_bin = jnp.clip(want_bin, 1, NBINS)
    cur_bin = tb
    up_ok = T.aligned_up[jnp.clip(cur_bin, 0, NBINS)]
    new_bin = jnp.where(
        (want_bin > cur_bin) & (cur_bin > 0),
        jnp.where(up_ok, jnp.minimum(want_bin, cur_bin + 1), cur_bin),
        want_bin)
    s = {**s, "time_bin": jnp.where(active, new_bin, s["time_bin"])}

    # --- kick1: first half of the new step ----------------------------------
    tb1 = jnp.clip(s["time_bin"], 0, NBINS)
    dt_k1 = T.dt_kick1[tb1]
    dt_t1 = T.dt_therm1[tb1]
    a_tot = s["a_hydro"] + s["a_grav"]
    v_full = s["v_full"] + a_tot * dt_k1[..., None]
    s = {**s, "v_full": jnp.where(active[..., None], v_full, s["v_full"])}
    ke1 = p.mod.kick_extra(p, s, cosmo, dt_t1)
    for k in getattr(p.mod, "KICK_EXTRA_KEYS", ("u_full", "u_dt")):
        s = {**s, k: jnp.where(active, ke1[k], s[k])}

    # --- timestep limiter: wake inactive particles near fast ones -----------
    # (runner_do_limiter + timestep_limit_part; the woken particle's long
    # half-kick is undone and replaced by the short-step kicks via the
    # host-built wake tables)
    n_woken = jnp.int32(0)
    if cfg.with_timestep_limiter:
        tb_now = jnp.clip(s["time_bin"], 0, NBINS)
        sub = {"mask": s["mask"], "off": s["off"], "h": s["h"],
               "time_bin": s["time_bin"], "active": active.astype(F32)}
        if cfg.backend == "gather":
            sub.update(nbr_idx=s["nbr_idx"], nbr_code=s["nbr_code"])
            mnb = gather_pairs.timebin_loop(grid, sub, p)
        elif cfg.backend == "flat":
            if cfg.shard_n > 0:
                # pallas_call can't be GSPMD-partitioned: ride the same
                # shard_map + ppermute halo as the other flat passes
                from .parallel.flat import shard_flat_call
                mnb = shard_flat_call(
                    grid, cfg.shard_n, "x",
                    lambda g, st: {"mnb": hydro_pallas.timebin_loop(
                        g, st, p, engine="flat")}, sub)["mnb"]
            else:
                mnb = hydro_pallas.timebin_loop(grid, sub, p,
                                                engine="flat")
        else:
            mnb = stencil.timebin_loop(grid, sub, p,
                                       use_scan=cfg.stencil_scan)
        wake = (mask_b & ~active & (s["time_bin"] > 0)
                & (s["time_bin"] > mnb + 2))
        new_bin_w = jnp.clip(mnb + 2, 1, tb_now)
        s = apply_wake(p, cosmo, s, T, wake, new_bin_w)
        n_woken = jnp.sum(wake)

    return s, too_small, n_woken


def apply_wake(p: SPHENIXParams, cosmo: CosmoFactors, s: Dict,
               T: StepTables, wake, new_bin_w):
    """Re-bin an inactive particle mid-flight: undo its long half-kick and
    replace it by the short-step kicks via the host wake tables
    (timestep_limit_part, timestep_limiter.h:64; also the sync machinery
    of runner_do_sync which shares the same surgery)."""
    tb_now = jnp.clip(s["time_bin"], 0, NBINS)
    iw = jnp.clip(new_bin_w, 0, NBINS)
    dv = T.wake_dv[tb_now, iw]
    du = T.wake_du[tb_now, iw]
    a_tot = s["a_hydro"] + s["a_grav"]
    v_w = s["v_full"] + a_tot * dv[..., None]
    s = {**s, "v_full": jnp.where(wake[..., None], v_w, s["v_full"])}
    ke_w = p.mod.kick_extra(p, s, cosmo, du)
    for k in getattr(p.mod, "KICK_EXTRA_KEYS", ("u_full", "u_dt")):
        s = {**s, k: jnp.where(wake, ke_w[k], s[k])}
    return {**s, "time_bin": jnp.where(wake, new_bin_w, s["time_bin"])}


# ---------------------------------------------------------------------------
# Host-side driver
# ---------------------------------------------------------------------------

class Engine:
    """Host orchestrator: owns the timeline, builds per-step tables,
    launches the jitted step, collects end-of-step statistics.

    The analog of the reference's struct engine + main loop (swift.c:1683).
    """

    def __init__(self, grid: CellGrid, sph: SPHENIXParams,
                 cfg: EngineConfig, time_begin: float, time_end: float,
                 cosmo: Optional[CosmoFactors] = None,
                 gravity_fn: Optional[Callable] = None,
                 cosmology=None, cooling_fn: Optional[Callable] = None,
                 mesh_fn: Optional[Callable] = None,
                 mesh_dt_scale: float = 0.0,
                 external_potential=None,
                 rt_fn: Optional[Callable] = None):
        self.cooling_fn = cooling_fn
        # radiative transfer closure (rt/gear.py make_rt_fn): subcycled
        # inject/transport/thermochemistry inside the jitted step
        self.rt_fn = rt_fn
        # external potential (models/potentials.py): composed into
        # gravity_fn and re-composed after every re-grid
        self.external_potential = external_potential
        if external_potential is not None:
            gravity_fn = self._compose_external(gravity_fn, grid)
        # split PM mesh: when mesh_fn is given, gravity_fn must be the
        # short-range part only; the mesh field lives on its own longer
        # timestep with separate kicks (kick.h:255, engine.c:2406 ti_mesh)
        self.mesh_fn = mesh_fn
        self.mesh_dt_scale = float(mesh_dt_scale)
        self.ti_mesh_end = None
        self.ti_mesh_mid = None
        self.n_mesh_updates = 0
        self.grid = grid
        self.sph = sph
        self.cfg = cfg
        self.cosmology = cosmology  # models.cosmology.Cosmology or None
        if cosmology is not None:
            # cosmological runs: the integer timeline lives in log(a)
            self.timeline = tl.Timeline(cosmology.log_a_begin,
                                        cosmology.log_a_end)
            self.cosmo = cosmology.factors_at(0)
        else:
            self.timeline = tl.Timeline(time_begin, time_end)
            self.cosmo = cosmo or CosmoFactors.no_cosmo()
        # identity-cosmology runs use the literal-folding jit wrappers
        self._nc = cosmology is None and cosmo is None
        self.gravity_fn = gravity_fn
        self.state: Dict = {}
        self.step_count = 0

    # --- setup ----------------------------------------------------------------
    def load_particles(self, pos, m, v, u, h, pid=None, Z=None,
                       elem_frac=None, extra_fields=None):
        """Bucket raw particle arrays into the tiled state (IC ingestion).

        Uses the native (C++/OpenMP) counting sort when available — the
        analog of the reference's threadpooled space_rebuild — and falls
        back to the jitted path otherwise.  ``Z``/``elem_frac`` are the
        optional chemistry carriers (subgrid/chemistry.py);
        ``extra_fields`` is a dict of additional (N,) per-particle arrays
        bucketed alongside (e.g. the Planetary scheme's MaterialIDs,
        planetary hydro_io.h)."""
        n = len(pos)
        if pid is None:
            pid = np.arange(n, dtype=np.int32)
        np_fields = {
            "pid": np.asarray(pid, np.int32),
            "m": np.asarray(m, np.float32),
            "v": np.asarray(v, np.float32),
            "v_full": np.asarray(v, np.float32),
            "h": np.asarray(h, np.float32),
            "u": np.asarray(u, np.float32),
            "u_full": np.asarray(u, np.float32),
        }
        if Z is not None:
            np_fields["Z"] = np.asarray(Z, np.float32)
        if elem_frac is not None:
            np_fields["elem_frac"] = np.asarray(elem_frac, np.float32)
        int_keys = set(getattr(self.sph.mod, "EXTRA_STATE_INT_KEYS", ()))
        for k, arr in (extra_fields or {}).items():
            np_fields[k] = np.asarray(
                arr, np.int32 if k in int_keys else np.float32)
        from . import native
        if self.cfg.backend == "flat":
            # column layout needs the z-subsorted jitted bucketing
            fields = {k: jnp.asarray(v) for k, v in np_fields.items()}
            out, mask, off, n_over = bucket_fields(
                self.grid, jnp.asarray(pos), fields, zsort=True)
        elif native.available():
            out_np, mask_np, off_np, n_over = native.bucket_fields_native(
                self.grid, np.asarray(pos, np.float64), np_fields)
            out = {k: jnp.asarray(v) for k, v in out_np.items()}
            mask, off = jnp.asarray(mask_np), jnp.asarray(off_np)
        else:
            fields = {k: jnp.asarray(v) for k, v in np_fields.items()}
            out, mask, off, n_over = bucket_fields(
                self.grid, jnp.asarray(pos), fields)
        if int(n_over) != 0:
            raise RuntimeError(
                f"{int(n_over)} particles overflowed cell capacity "
                f"K={self.grid.K}; rebuild the grid with more headroom")
        C, K = self.grid.C, self.grid.K
        z = lambda: jnp.zeros((C, K), F32)
        z3 = lambda: jnp.zeros((C, K, 3), F32)
        self.state = {
            "mask": mask, "off": off, **out,
            "u_dt": z(), "rho": z(), "wcount": z(), "wcount_dh": z(),
            "rho_dh": z(), "div_v": z(), "rot_v": z3(),
            "alpha_visc": jnp.full((C, K), self.sph.viscosity_alpha) * mask,
            "v_sig": z(), "div_v_prev": z(),
            "alpha_diff": jnp.full((C, K), self.sph.diffusion_alpha) * mask,
            "laplace_u": z(), "f_gradh": z(), "pressure": z(),
            "soundspeed": z(), "balsara": z(),
            "alpha_visc_max_ngb": z(), "a_hydro": z3(), "h_dt": z(),
            "a_grav": z3(), "a_grav_mesh": z3(), "pot": z(),
            "pot_mesh": z(),
            "time_bin": jnp.zeros((C, K), I32),
            "min_ngb_time_bin": jnp.full((C, K), NBINS, I32),
            "drift_accum": jnp.float32(0.0),
        }
        # scheme-specific state (e.g. PressureEnergy's smoothed pressure);
        # keys already bucketed from extra_fields keep their loaded values
        for k in getattr(self.sph.mod, "EXTRA_STATE_KEYS", ()):
            if k not in self.state:
                self.state[k] = (jnp.zeros((C, K), I32)
                                 if k in int_keys else z())
        if self.cfg.backend == "gather":
            # placeholders: _init_pass builds the real lists first thing
            self.state.update(
                nbr_idx=jnp.zeros((C, K, self.cfg.ngb_cap), I32),
                nbr_code=jnp.zeros((C, K, self.cfg.ngb_cap), jnp.int8),
                h_cap=jnp.zeros((C, K), F32),
                nbr_dbudget=jnp.float32(0.0),
                nbr_maxcount=jnp.int32(0))
        self.n_particles = n

    # --- split PM-mesh timestep (kick.h:255, engine.c:2406) ----------------
    def _kick_fac(self, lo: int, hi: int) -> float:
        c = self.cosmology
        if c is None:
            return (hi - lo) * self.timeline.time_base
        return float(c.grav_kick_factor(lo, hi))

    def _pick_mesh_dti(self, amax: float) -> int:
        """Largest aligned power-of-2 interval under the mesh timestep
        dt = sqrt(2 eta r_s / |a_mesh|max) (get_mesh_timestep analog)."""
        t = self.timeline
        c = self.cosmology
        ti = t.ti_current
        L = self.mesh_dt_scale if self.mesh_dt_scale > 0 else 1e-3
        dt = float(np.sqrt(2.0 * self.cfg.eta_grav * L
                           / max(amax, 1e-30)))
        # global ceiling, like any bin (TimeIntegration:dt_max)
        dt = min(dt, self.cfg.mesh_dt_max or self.cfg.dt_max)
        b = 1
        while b < NBINS:
            dti_n = tl.get_integer_timestep(b + 1)
            if ti % dti_n:
                break
            if c is None:
                if dti_n * t.time_base > dt:
                    break
            else:
                if c.delta_time(ti, min(ti + dti_n,
                                        tl.MAX_NR_TIMESTEPS)) > dt:
                    break
            b += 1
        return tl.get_integer_timestep(b)

    def _mesh_boundary(self):
        """Close the old mesh half-kick, recompute the PM field, size the
        next mesh step and open its first half-kick."""
        t = self.timeline
        ti = t.ti_current
        dt_close = (0.0 if self.ti_mesh_mid is None
                    else self._kick_fac(self.ti_mesh_mid, ti))
        self.state, amax = _JIT_MESH(self.mesh_fn, self.state,
                                     jnp.float32(dt_close),
                                     jnp.float32(0.0))
        dti = self._pick_mesh_dti(float(amax))
        self.ti_mesh_end = min(ti + dti, tl.MAX_NR_TIMESTEPS)
        self.ti_mesh_mid = min(ti + dti // 2, tl.MAX_NR_TIMESTEPS)
        dt_open = self._kick_fac(ti, self.ti_mesh_mid)
        self.state = _JIT_MESH_OPEN(self.state, jnp.float32(dt_open))
        self.n_mesh_updates += 1

    def init_particles(self):
        return self._with_regrid_retry(self._init_particles_once)

    def _init_particles_once(self):
        """First density/ghost/force pass + initial bins + first kick1.

        Mirrors engine_init_particles (engine.c:1893): a density-only
        launch, then a fake 0th step computing forces and timesteps.
        """
        if self.mesh_fn is not None:
            self._mesh_boundary()
        T = self._tables()

        def init_once():
            if getattr(self, "_nc", False):
                return _JIT_INIT_NC(self.grid, self.sph, self.cfg,
                                    self.gravity_fn, self.state, T)
            return _JIT_INIT(self.grid, self.sph, self.cfg,
                             self.gravity_fn, self.cosmo, self.state, T)

        self.state, diag = init_once()
        # gather backend: the first ghost pass may pin h at the list cap
        # (IC h too small); rebuilding ratchets the cap up by the slack
        # factor, so retry until no particle is pinned.
        for _ in range(16):
            if int(diag.get("nbr_pinned", 0)) == 0:
                break
            self.state, diag = init_once()
        self._post_step(diag)
        return diag

    # --- stepping ---------------------------------------------------------------
    def _tables(self, dt_drift: float = 0.0,
                ti_drift_start: Optional[int] = None) -> StepTables:
        t = self.timeline
        c = self.cosmology
        active = t.active_bins_mask()
        dt_k1 = np.zeros(NBINS + 1, np.float32)
        dt_k2 = np.zeros(NBINS + 1, np.float32)
        dt_t1 = np.zeros(NBINS + 1, np.float32)
        dt_t2 = np.zeros(NBINS + 1, np.float32)
        dt_full = np.zeros(NBINS + 1, np.float32)
        dt_tf = np.zeros(NBINS + 1, np.float32)
        aligned_up = np.zeros(NBINS + 1, bool)
        ti = t.ti_current
        for b in range(1, NBINS + 1):
            dti = tl.get_integer_timestep(b)
            if c is None:
                dt_k1[b] = dt_k2[b] = dt_t1[b] = dt_t2[b] =                     0.5 * dti * t.time_base
                dt_full[b] = dti * t.time_base
                dt_tf[b] = dt_full[b]
            else:
                # kick2 closes [ti - dti/2, ti]; kick1 opens [ti, ti + dti/2]
                # using the cosmology integral tables (kick.h semantics)
                lo2 = max(ti - dti // 2, 0)
                hi1 = min(ti + dti // 2, tl.MAX_NR_TIMESTEPS)
                dt_k2[b] = c.grav_kick_factor(lo2, ti)
                dt_k1[b] = c.grav_kick_factor(ti, hi1)
                dt_t2[b] = c.therm_kick_factor(lo2, ti)
                dt_t1[b] = c.therm_kick_factor(ti, hi1)
                dt_full[b] = c.delta_time(max(ti - dti, 0), ti)
                dt_tf[b] = c.therm_kick_factor(max(ti - dti, 0), ti)
            up = tl.get_integer_timestep(min(b + 1, NBINS))
            aligned_up[b] = (ti % up) == 0
        if c is None:
            max_bin = 1
            while (max_bin < NBINS and
                   tl.get_integer_timestep(max_bin + 1) * t.time_base
                   <= self.cfg.dt_max):
                max_bin += 1
            tb_inv = t.time_base_inv
            dt_therm_drift = dt_drift
        else:
            # dt_max is a physical time: find the largest bin whose span
            # stays under it
            max_bin = 1
            while (max_bin < NBINS and
                   c.delta_time(ti, min(ti + tl.get_integer_timestep(
                       max_bin + 1), tl.MAX_NR_TIMESTEPS)) <= self.cfg.dt_max):
                max_bin += 1
            # physical dt -> Delta log(a): multiply by H (the reference's
            # cosmology->time_step_factor, timestep.h)
            a_now = c.a_of_ti(ti)
            tb_inv = float(c.H(a_now)) * t.time_base_inv
            self.cosmo = c.factors_at(ti)
            if ti_drift_start is not None:
                dt_drift = c.drift_factor(ti_drift_start, ti)
                dt_therm_drift = c.therm_kick_factor(ti_drift_start, ti)
            else:
                dt_therm_drift = dt_drift
        wake_dv, wake_du = self._wake_tables(ti)
        return StepTables(
            active=jnp.asarray(active),
            dt_kick1=jnp.asarray(dt_k1),
            dt_kick2=jnp.asarray(dt_k2),
            dt_therm1=jnp.asarray(dt_t1),
            dt_therm2=jnp.asarray(dt_t2),
            dt_alpha=jnp.asarray(dt_full),
            dt_therm_full=jnp.asarray(dt_tf),
            aligned_up=jnp.asarray(aligned_up),
            dt_drift=jnp.float32(dt_drift),
            dt_therm_drift=jnp.float32(dt_therm_drift),
            max_bin=jnp.int32(max_bin),
            min_bin=jnp.int32(1),
            time_base_inv=jnp.float32(tb_inv),
            wake_dv=jnp.asarray(wake_dv),
            wake_du=jnp.asarray(wake_du),
            max_active_bin=jnp.int32(t.max_active_bin()),
            ti_lo=jnp.int32(ti & 0x7FFFFFFF),
            ti_hi=jnp.int32((ti >> 31) & 0x7FFFFFFF),
            birth_time=jnp.float32(
                c.a_of_ti(ti) if c is not None else t.time_of(ti)),
        )

    def _wake_tables(self, ti: int):
        """(old_bin, new_bin) -> net wake kick, timestep_limit_part
        (timestep_limiter.h:64).

        A woken particle had received kick1 over [beg_old, beg_old+dti_o/2];
        the limiter (i) reverses it, (ii) kicks over [beg_old, beg_new]
        (beg_new = last dti_n-aligned tick <= ti), (iii) applies the new
        step's kick1 [beg_new, beg_new+dti_n/2].  The three merged into one
        net dt per (old, new) bin pair, separately for the velocity (grav
        factor) and thermal kicks.
        """
        wake_dv = np.zeros((NBINS + 1, NBINS + 1), np.float32)
        wake_du = np.zeros((NBINS + 1, NBINS + 1), np.float32)
        if not self.cfg.with_timestep_limiter or ti <= 0:
            return wake_dv, wake_du
        c = self.cosmology
        tb = self.timeline.time_base
        for bo in range(2, NBINS + 1):
            dto = tl.get_integer_timestep(bo)
            beg_o = dto * ((ti - 1) // dto)
            half_o = beg_o + dto // 2
            for bn in range(1, bo):
                dtn = tl.get_integer_timestep(bn)
                beg_n = dtn * (ti // dtn)
                half_n = beg_n + dtn // 2
                if c is None:
                    dv = du = ((beg_n - half_o) + (half_n - beg_n)) * tb
                else:
                    dv = (-c.grav_kick_factor(beg_o, half_o)
                          + c.grav_kick_factor(beg_o, beg_n)
                          + c.grav_kick_factor(beg_n, half_n))
                    du = (-c.therm_kick_factor(beg_o, half_o)
                          + c.therm_kick_factor(beg_o, beg_n)
                          + c.therm_kick_factor(beg_n, half_n))
                wake_dv[bo, bn] = dv
                wake_du[bo, bn] = du
        return wake_dv, wake_du

    def step(self):
        # host-side pre-step hook (rebuild-cadence work that must not
        # trace: e.g. GravitySolver.update_adaptive_promotion rebuilding
        # the static MAC stencil — the engine_maketasks-at-rebuild analog)
        hook = getattr(self, "pre_step_hook", None)
        if hook is not None:
            hook(self)
        diag = self._with_regrid_retry(self._step_once)
        # --- gas particle splitting (engine_split_gas_particles,
        # engine.c:268; SPH:particle_splitting) — checked from the step
        # diagnostics, applied host-side like the reference's
        # rebuild-time split pass
        thr = float(getattr(self, "split_mass_threshold", 0.0) or 0.0)
        if thr > 0.0 and float(diag.get("m_max_gas", 0.0)) > thr:
            self.n_split_total = (getattr(self, "n_split_total", 0)
                                  + self.split_gas_particles(thr))
        # --- occupancy re-grid (the engine.c:1781 repartition analog;
        # see EngineConfig.regrid_shrink_trigger): when the distribution
        # dispersed and the tiles are mostly padding, rebuild tighter
        trig = self.cfg.regrid_shrink_trigger
        k_need = float(diag.get("k_max_live", 0.0))
        if (trig > 0 and k_need > 0 and self.grid.K > 128
                and 1.7 * k_need < trig * self.grid.K):
            # engine start counts as the last re-grid: manual grids with
            # deliberate K headroom get a full cooldown before shrinking
            last = getattr(self, "_last_shrink_step", 0)
            if self.step_count - last >= self.cfg.regrid_cooldown:
                self.regrid()
                self._last_shrink_step = self.step_count
                self.n_shrink_regrids = getattr(self, "n_shrink_regrids",
                                                0) + 1
        return diag

    # --- particle splitting (engine_split_gas_particles, engine.c:268) ----
    def _split_arrays(self, gas_state, thr: float, frac: float = 0.2):
        """Halve every gas particle heavier than ``thr`` into two copies
        displaced +-frac*h along a deterministic per-pid direction, both
        with h/2^(1/3) (each carries half the mass).  Intensive fields
        (u, rho, rt_E, Z, ...) are copied; only the mass is extensive.
        Returns (pos_all, fields, n_split) or None when nothing splits."""
        pos, fields = self._extract_particles(gas_state)
        m = fields["m"]
        hot = m > thr
        n = int(hot.sum())
        if n == 0:
            return None
        # deterministic per-pid unit directions (the reference draws
        # random3d from the particle ID too, engine.c:376 random_unit)
        pid = fields["pid"][hot].astype(np.uint64)
        x = pid * np.uint64(0x9E3779B97F4A7C15)
        y = pid * np.uint64(0xC2B2AE3D27D4EB4F) \
            + np.uint64(0x165667B19E3779F9)
        u1 = (x >> np.uint64(11)).astype(np.float64) / 2.0 ** 53
        u2 = (y >> np.uint64(11)).astype(np.float64) / 2.0 ** 53
        cth = 2.0 * u1 - 1.0
        sth = np.sqrt(np.maximum(1.0 - cth * cth, 0.0))
        phi = 2.0 * np.pi * u2
        dirs = np.stack([sth * np.cos(phi), sth * np.sin(phi), cth], -1)

        h_hot = fields["h"][hot] if "h" in fields else \
            np.full(n, 0.01, np.float32)
        disp = (frac * h_hot)[:, None] * dirs
        box = np.asarray(self.grid.box, np.float64)
        clone_pos = np.mod(pos[hot] + disp, box)
        pos = pos.copy()
        pos[hot] = np.mod(pos[hot] - disp, box)

        clone = {k: v[hot].copy() for k, v in fields.items()}
        fields = {k: v.copy() for k, v in fields.items()}
        fields["m"][hot] *= 0.5
        clone["m"] = fields["m"][hot].copy()
        if "h" in fields:
            shrink = np.float32(2.0 ** (-1.0 / 3.0))
            fields["h"][hot] *= shrink
            clone["h"] *= shrink
        next_pid = int(fields["pid"].max()) + 1
        clone["pid"] = np.arange(next_pid, next_pid + n, dtype=np.int32)

        pos_all = np.concatenate([pos, clone_pos])
        merged = {k: np.concatenate([fields[k], clone[k]])
                  for k in fields}
        return pos_all, merged, n

    def split_gas_particles(self, thr: float) -> int:
        """Split overweight gas in place; re-grids if the split overflows
        the current cell capacity.  Returns the number of splits."""
        r = self._split_arrays(self.state, thr)
        if r is None:
            return 0
        pos_all, merged, n = r
        try:
            self.state = self._rebucket_species(self.grid, pos_all, merged)
        except RuntimeError:
            new_grid = self._build_grid(pos_all, self._grid_reach())
            self.state = self._rebucket_species(new_grid, pos_all, merged)
            self.grid = new_grid
            if self.gravity_fn is not None or self.mesh_fn is not None:
                self._rebind_gravity(new_grid)
        return n

    def _step_once(self):
        """Advance to the next ti_end_min (engine_step, engine.c:2245)."""
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
        if getattr(self, "_nc", False):
            self.state, diag = _JIT_STEP_NC(
                self.grid, self.sph, self.cfg, self.gravity_fn,
                self.state, T, self.cooling_fn, self.rt_fn)
        else:
            self.state, diag = _JIT_STEP(
                self.grid, self.sph, self.cfg, self.gravity_fn,
                self.cosmo, self.state, T, self.cooling_fn, self.rt_fn)
        self._post_step(diag)
        self.step_count += 1
        if self.mesh_fn is not None and t.ti_current >= self.ti_mesh_end:
            self._mesh_boundary()
        return diag

    # --- automatic re-gridding (space_regrid, space.c) ---------------------
    def _with_regrid_retry(self, fn, max_attempts: int = 3):
        """Run a step; on a capacity/coverage wall restore the pre-step
        state, rebuild the grid from the live particles, and retry —
        SWIFT's space_regrid-at-rebuild, done reactively (the jitted step
        is pure, so the pre-step state is untouched by a failed attempt).
        """
        for attempt in range(max_attempts):
            saved = (self.state, self.timeline.ti_current,
                     getattr(self, "_ti_end_min", 0), self.step_count,
                     self.ti_mesh_end, self.ti_mesh_mid)
            try:
                return fn()
            except RegridNeeded as e:
                (self.state, self.timeline.ti_current, self._ti_end_min,
                 self.step_count, self.ti_mesh_end, self.ti_mesh_mid) \
                    = saved
                self.regrid(h_reach=e.h_reach)
        raise RuntimeError(
            f"re-grid did not converge after {max_attempts} attempts")

    def _grid_reach(self, h_reach: float = 0.0) -> float:
        """Interaction range a rebuilt grid must cover."""
        reach = float(self.cfg.p2p_reach)
        if "h" in self.state:
            mask = np.asarray(self.state["mask"]) > 0
            if mask.any():
                h_now = float(np.asarray(self.state["h"])[mask].max())
                reach = max(reach, h_now * self.sph.kernel.gamma * 1.05)
        return max(reach, h_reach * 1.05)

    def _extract_particles(self, state):
        """Live particles of a tiled species state -> (pos_f64, fields)."""
        from .grid.cellgrid import global_positions
        mask = np.asarray(state["mask"]) > 0
        pos = global_positions(self.grid, np.asarray(state["off"]))[mask]
        fields = {}
        K = state["mask"].shape[1]
        for k, v in state.items():
            if k in ("mask", "off") or k in _NBR_KEYS:
                continue
            arr = np.asarray(v)
            if arr.ndim >= 2 and arr.shape[:2] == (self.grid.C, K):
                fields[k] = arr[mask]
        return pos, fields

    def _rebucket_species(self, grid, pos, fields, extra_slots: int = 0):
        """Bucket extracted particles onto a new grid (+ free slots)."""
        jfields = {k: jnp.asarray(v) for k, v in fields.items()}
        out, mask, off, n_over = bucket_fields(
            grid, jnp.asarray(pos), jfields,
            zsort=self.cfg.backend == "flat")
        if int(n_over) != 0:
            raise RuntimeError(
                f"{int(n_over)} particles overflow even the rebuilt grid")
        if extra_slots > 0:
            C, K0 = mask.shape

            def pad(a, fill=0.0):
                shape = (C, extra_slots) + a.shape[2:]
                return jnp.concatenate(
                    [a, jnp.full(shape, fill, a.dtype)], axis=1)

            out = {k: pad(v, -1 if k == "pid" else 0)
                   for k, v in out.items()}
            mask, off = pad(mask), pad(off)
        state = {"mask": mask, "off": off, **out,
                 "drift_accum": jnp.float32(0.0)}
        if self.cfg.backend == "gather":
            C, K = mask.shape
            state.update(
                nbr_idx=jnp.zeros((C, K, self.cfg.ngb_cap), I32),
                nbr_code=jnp.zeros((C, K, self.cfg.ngb_cap), jnp.int8),
                h_cap=jnp.zeros((C, K), F32),
                nbr_dbudget=jnp.float32(0.0),   # forces a list rebuild
                nbr_maxcount=jnp.int32(0))
        return state

    def _build_grid(self, pos_all, reach: float) -> CellGrid:
        if self.cfg.backend == "flat":
            # preserve x-slab divisibility (and re-balance the slabs)
            # across auto-regrids when the pair passes run sharded
            return CellGrid.build_columns(self.grid.box, reach, pos_all,
                                          n_shards=self.cfg.shard_n)
        return CellGrid.build_for_positions(self.grid.box, reach, pos_all,
                                            headroom=1.6)

    def regrid(self, h_reach: float = 0.0):
        """Rebuild the grid from the live state and re-bucket everything.

        Triggered by cell overflow (clustering outgrew K) or by h
        outgrowing the cell edge; the new grid re-derives cdim and K from
        the ACTUAL particle distribution — space_regrid + space_rebuild.
        """
        reach = self._grid_reach(h_reach)
        pos, fields = self._extract_particles(self.state)
        new_grid = self._build_grid(pos, reach)
        self.state = self._rebucket_species(new_grid, pos, fields)
        self.grid = new_grid
        if self.gravity_fn is not None or self.mesh_fn is not None:
            self._rebind_gravity(new_grid)

    def _rebind_gravity(self, new_grid):
        """Gravity closures capture the grid (cell corners, stencil
        geometry): rebuild them from ``solver_builder`` — a
        ``CellGrid -> GravitySolver`` factory the caller sets (the CLI
        always does)."""
        builder = getattr(self, "solver_builder", None)
        ext = getattr(self, "external_potential", None)
        if builder is None:
            if ext is not None and self.mesh_fn is None:
                # external-potential-only run: no solver to rebuild
                self.gravity_fn = self._compose_external(None, new_grid)
                return
            raise RuntimeError(
                "auto re-grid with gravity needs engine.solver_builder "
                "(a CellGrid -> GravitySolver factory): the old "
                "gravity_fn is bound to the replaced grid")
        self._bind_solver(builder(new_grid))

    def _bind_solver(self, solver):
        if self.mesh_fn is not None:
            if self.cfg.shard_n > 0 and self.cfg.backend == "flat":
                self.gravity_fn = solver.gas_short_range_sharded_fn(
                    self.cfg.shard_n)
            else:
                self.gravity_fn = solver.gas_short_range_fn()
            self.mesh_fn = solver.gas_mesh_fn()
            self.mesh_dt_scale = solver.pm.r_s
        else:
            self.gravity_fn = solver.gas_gravity_fn()
        if getattr(self, "external_potential", None) is not None:
            self.gravity_fn = self._compose_external(self.gravity_fn,
                                                     solver.grid)

    def _compose_external(self, gravity_fn, grid):
        """gravity_fn + external potential (overridden by MultiEngine
        for its list-of-species gravity signature)."""
        return compose_gravity_fns(
            gravity_fn,
            make_external_gravity_fn(grid, self.external_potential))

    def _post_step(self, diag):
        counts = np.asarray(diag["bin_counts"])
        self._ti_end_min = self.timeline.ti_end_min_from_bins(counts)
        if int(diag["n_overflow"]) != 0:
            raise RegridNeeded(
                f"cell overflow during rebucket at step {self.step_count}: "
                f"{int(diag['n_overflow'])} particles (grid too tight)")
        if int(diag["n_dt_too_small"]) != 0:
            raise RuntimeError(
                f"{int(diag['n_dt_too_small'])} particles want dt < dt_min")
        # h grew beyond stencil coverage -> would silently lose pairs
        h_reach = float(diag["h_max_active"]) * self.sph.kernel.gamma
        if h_reach > min(self.grid.edge) * (1 + 1e-5):
            raise RegridNeeded(
                f"smoothing length reach {h_reach:.4g} exceeds cell edge "
                f"{min(self.grid.edge):.4g} (space_regrid analog)",
                h_reach=h_reach)
        nbr_max = int(diag.get("nbr_maxcount", 0))
        if nbr_max > self.cfg.ngb_cap:
            raise RuntimeError(
                f"candidate list overflow: a particle has {nbr_max} "
                f"candidates > ngb_cap={self.cfg.ngb_cap}; raise "
                f"EngineConfig.ngb_cap (silent neighbour loss refused)")

    def run_fixed_dt(self, n_steps: int, per_launch: int = 8):
        """Advance n_steps with the global fixed timestep (= dt_max),
        batching per_launch steps per device launch.  Requires dt_max below
        every particle's CFL limit; raises if any particle disagrees.

        With a split PM mesh, the mesh field is recomputed at host-driven
        mesh-step boundaries between launches (its own longer interval,
        engine.c:2406) — launches are clamped so they never run past a
        mesh boundary."""
        t = self.timeline
        # everyone must already be in max_bin
        T = self._tables()
        b = int(T.max_bin)
        dti = tl.get_integer_timestep(b)
        T = self._tables(dt_drift=dti * t.time_base)
        if self.mesh_fn is not None and self.ti_mesh_end is None:
            self._mesh_boundary()
        done = 0
        deviations = []  # device scalars — checked once at the end so
        # launches pipeline without a blocking host read each round
        while done < n_steps:
            k = min(per_launch, n_steps - done)
            if self.mesh_fn is not None:
                k_mesh = max(1, (self.ti_mesh_end - t.ti_current) // dti)
                k = min(k, int(k_mesh))
            if getattr(self, "_nc", False):
                self.state, diag = _JIT_MULTI_NC(
                    self.grid, self.sph, self.cfg, self.gravity_fn, k,
                    self.state, T, self.cooling_fn)
            else:
                self.state, diag = _JIT_MULTI(
                    self.grid, self.sph, self.cfg, self.gravity_fn, k,
                    self.cosmo, self.state, T, self.cooling_fn)
            deviations.append(diag["bin_deviation"])
            t.ti_current += k * dti
            self.step_count += k
            done += k
            if (self.mesh_fn is not None
                    and t.ti_current >= self.ti_mesh_end):
                self._mesh_boundary()
        if any(bool(d) for d in np.asarray(jnp.stack(deviations))):
            raise RuntimeError(
                "fixed-dt run invalid: a particle left the maximal bin "
                "(CFL below dt_max) or a cell overflowed")
        counts = np.zeros(NBINS + 1, int)
        counts[b] = 1
        self._ti_end_min = self.timeline.ti_end_min_from_bins(counts)

    @property
    def time(self) -> float:
        return self.timeline.time_of(self.timeline.ti_current)

    def run(self, t_end: Optional[float] = None, max_steps: int = 10 ** 9):
        t_end = self.timeline.time_end if t_end is None else t_end
        ti_end = min(
            tl.MAX_NR_TIMESTEPS,
            int(round((t_end - self.timeline.time_begin)
                      / self.timeline.time_base)))
        steps = 0
        while self.timeline.ti_current < ti_end and steps < max_steps:
            self.step()
            steps += 1
        return steps


def _init_pass(grid, p, cfg, gravity_fn, cosmo, s, T):
    """engine_init_particles: density/ghost + force + first bins + kick1."""
    mask_b = s["mask"] > 0
    active = mask_b  # everyone is active at t=0

    if cfg.backend == "gather":
        s = _nbr_rebuild(grid, cfg, p, s)

    loops = _loops(cfg)
    h_new, dens, n_iter = _ghost_density(grid, p, cosmo, s, active,
                                         cfg.max_ghost_iterations, loops,
                                         unroll=cfg.ghost_unroll)
    s = {**s, "h": jnp.where(active, h_new, s["h"])}
    for k, v in dens.items():
        act = active[..., None] if v.ndim == 3 else active
        s = {**s, k: jnp.where(act, v, s[k])}
    s = p.mod.no_neighbours_fallback(p, s)
    s = p.mod.prepare_gradient(p, s, cosmo)
    s = p.mod.reset_gradient(s)
    if getattr(p.mod, "HAS_GRADIENT_LOOP", True):
        grad = loops.gradient_loop(grid, s, p, cosmo)
        s = {**s, **grad}
        s = p.mod.end_gradient(s)
    s = p.mod.prepare_force(p, s, cosmo, jnp.float32(0.0))
    s = p.mod.reset_acceleration(s)
    force = loops.force_loop(grid, s, p, cosmo)
    s = {**s, **force}
    s = p.mod.end_force(p, s)

    if gravity_fn is not None:
        a_grav, pot = _call_gravity(gravity_fn, s)
        s = {**s, "a_grav": a_grav}
        if pot is not None and "pot" in s:
            s = {**s, "pot": pot}

    # initial timestep + bins
    dt_cfl = p.mod.compute_timestep(p, s, cosmo)
    dt_h = p.mod.timestep_h_change_limit(p, s)
    new_dt = jnp.minimum(jnp.minimum(dt_cfl, dt_h), jnp.float32(cfg.dt_max))
    too_small = active & (new_dt < cfg.dt_min)
    new_bin = jnp.clip(bin_from_dt(new_dt, T.time_base_inv), 1, NBINS)
    new_bin = jnp.minimum(new_bin, T.max_bin)
    s = {**s, "time_bin": jnp.where(active, new_bin, 0)}

    # first half-kick
    dt_k1 = T.dt_kick1[jnp.clip(s["time_bin"], 0, NBINS)]
    a_tot = s["a_hydro"] + s["a_grav"]
    s = {**s, "v_full": s["v_full"] + a_tot * dt_k1[..., None]
         * s["mask"][..., None]}
    ke = p.mod.kick_extra(p, s, cosmo, dt_k1 * s["mask"])
    s = {**s, **{k: ke[k] for k in
                 getattr(p.mod, "KICK_EXTRA_KEYS", ("u_full", "u_dt"))}}

    bins_masked = jnp.where(mask_b, jnp.clip(s["time_bin"], 0, NBINS),
                            NBINS + 5)
    bin_counts = jnp.bincount(bins_masked.reshape(-1), length=NBINS + 6)
    diag = {
        "bin_counts": bin_counts[:NBINS + 1],
        "n_overflow": jnp.int32(0),
        "n_dt_too_small": jnp.sum(too_small),
        "n_ghost_iter": n_iter,
        "n_active": jnp.sum(active),
        "h_max_active": jnp.max(jnp.where(active, s["h"], 0.0)),
        "nbr_maxcount": s.get("nbr_maxcount", jnp.int32(0)),
        "nbr_pinned": _nbr_pinned_count(grid, p, cfg, s, mask_b),
    }
    return s, diag


def _nbr_pinned_count(grid, p, cfg, s, mask_b):
    """Particles whose h sits at the list cap (init must rebuild + retry)."""
    if cfg.backend != "gather":
        return jnp.int32(0)
    gamma = float(p.kernel.gamma)
    cap_limit = jnp.float32(min(float(p.h_max),
                                min(grid.edge) / gamma))
    return jnp.sum(mask_b & (s["h"] >= 0.999 * s["h_cap"])
                   & (s["h_cap"] < 0.999 * cap_limit)).astype(I32)


def multi_step(grid, p, cfg, gravity_fn, k, cosmo, s, T,
               cooling_fn=None):
    """k engine steps in one launch via lax.scan (fixed global timestep).

    Valid only while every particle stays in the same (maximal) time bin,
    so the per-step tables are constant — the all-active regime used for
    benchmarking.  A diagnostic flag records any bin deviation so the host
    can reject the result (it would mean the CFL dropped below the fixed
    dt and per-step host control is required).
    """
    def body(carry, _):
        s, bad = carry
        s2, diag = hydro_step(grid, p, cfg, gravity_fn, cosmo, s, T,
                              cooling_fn)
        bins = jnp.where(s2["mask"] > 0, s2["time_bin"], T.max_bin)
        bad = (bad | jnp.any(bins != T.max_bin) | (diag["n_overflow"] > 0)
               | (diag["nbr_maxcount"] > cfg.ngb_cap))
        return (s2, bad), diag["n_active"]

    (s, bad), n_active = jax.lax.scan(
        body, (s, jnp.bool_(False)), None, length=k)
    return s, {"bin_deviation": bad, "n_active_last": n_active[-1]}


def _dm_kdk(cfg: EngineConfig, eps_soft: float, s: Dict, T: StepTables,
            active, tb):
    """kick2 -> timestep -> kick1 for collisionless particles
    (kick_gpart kick.h:141, get_gpart_timestep timestep.h:95)."""
    dt_k2 = T.dt_kick2[tb]
    v_full = s["v_full"] + s["a_grav"] * dt_k2[..., None]
    s = {**s, "v_full": jnp.where(active[..., None], v_full, s["v_full"])}

    # timestep: dt = sqrt(2 eta eps / |a|) (incl. the split-mesh part)
    a_norm = jnp.sqrt(jnp.sum(
        (s["a_grav"] + s.get("a_grav_mesh", 0.0)) ** 2, -1))
    new_dt = jnp.sqrt(2.0 * cfg.eta_grav * eps_soft
                      / jnp.maximum(a_norm, 1e-30))
    new_dt = jnp.minimum(new_dt, jnp.float32(cfg.dt_max))
    too_small = active & (new_dt < cfg.dt_min)
    want_bin = jnp.clip(bin_from_dt(new_dt, T.time_base_inv), 1, NBINS)
    want_bin = jnp.minimum(want_bin, T.max_bin)
    up_ok = T.aligned_up[jnp.clip(tb, 0, NBINS)]
    new_bin = jnp.where(
        (want_bin > tb) & (tb > 0),
        jnp.where(up_ok, jnp.minimum(want_bin, tb + 1), tb), want_bin)
    s = {**s, "time_bin": jnp.where(active, new_bin, s["time_bin"])}

    # kick1 (first half of new step)
    tb1 = jnp.clip(s["time_bin"], 0, NBINS)
    dt_k1 = T.dt_kick1[tb1]
    v_full = s["v_full"] + s["a_grav"] * dt_k1[..., None]
    s = {**s, "v_full": jnp.where(active[..., None], v_full, s["v_full"])}
    return s, too_small


def dm_step(grid: CellGrid, cfg: EngineConfig, gravity_fn: Callable,
            eps_soft: float, s: Dict, T: StepTables):
    """Collisionless (dark-matter) step: drift -> rebucket -> gravity ->
    KDK, the analog of SWIFT's gravity-only pipeline (runner_doiact_grav +
    kick_gpart, kick.h:141)."""
    if "drift_accum" not in s:
        s = {**s, "drift_accum": jnp.float32(1e30)}
    mask_b = s["mask"] > 0
    tb = jnp.clip(s["time_bin"], 0, NBINS)
    active = mask_b & T.active[tb]

    # drift
    s = {**s, "off": s["off"] + s["v_full"] * T.dt_drift
         * s["mask"][..., None]}

    # rebucket (trigger-based; reach = the P2P r_cut)
    s, n_overflow = _rebucket_phase(grid, cfg, s, T,
                                    jnp.float32(cfg.p2p_reach))
    mask_b = s["mask"] > 0
    tb = jnp.clip(s["time_bin"], 0, NBINS)
    active = mask_b & T.active[tb]

    # gravity (all particles — inactive ones keep their old a_grav)
    acc, pot = _call_gravity(gravity_fn, s)
    s = {**s, "a_grav": jnp.where(active[..., None], acc, s["a_grav"])}
    if pot is not None and "pot" in s:
        s = {**s, "pot": jnp.where(active, pot, s["pot"])}

    s, too_small = _dm_kdk(cfg, eps_soft, s, T, active, tb)

    bins_masked = jnp.where(mask_b, jnp.clip(s["time_bin"], 0, NBINS),
                            NBINS + 5)
    bin_counts = jnp.bincount(bins_masked.reshape(-1), length=NBINS + 6)
    diag = {
        "bin_counts": bin_counts[:NBINS + 1],
        "n_overflow": n_overflow,
        "n_dt_too_small": jnp.sum(too_small),
        "n_ghost_iter": jnp.int32(0),
        "n_active": jnp.sum(active),
        "h_max_active": jnp.float32(0.0),
        "k_max_live": jnp.max(jnp.sum(mask_b, axis=1)),
    }
    return s, diag


def _dm_init(grid, cfg, gravity_fn, eps_soft, s, T):
    acc, pot = _call_gravity(gravity_fn, s)
    s = {**s, "a_grav": acc}
    if pot is not None and "pot" in s:
        s = {**s, "pot": pot}
    a_norm = jnp.sqrt(jnp.sum(acc ** 2, -1))
    new_dt = jnp.sqrt(2.0 * cfg.eta_grav * eps_soft
                      / jnp.maximum(a_norm, 1e-30))
    new_dt = jnp.minimum(new_dt, jnp.float32(cfg.dt_max))
    mask_b = s["mask"] > 0
    new_bin = jnp.clip(bin_from_dt(new_dt, T.time_base_inv), 1, NBINS)
    new_bin = jnp.minimum(new_bin, T.max_bin)
    s = {**s, "time_bin": jnp.where(mask_b, new_bin, 0)}
    dt_k1 = T.dt_kick1[jnp.clip(s["time_bin"], 0, NBINS)]
    s = {**s, "v_full": s["v_full"] + acc * dt_k1[..., None]
         * s["mask"][..., None]}
    bins_masked = jnp.where(mask_b, jnp.clip(s["time_bin"], 0, NBINS),
                            NBINS + 5)
    bin_counts = jnp.bincount(bins_masked.reshape(-1), length=NBINS + 6)
    diag = {"bin_counts": bin_counts[:NBINS + 1],
            "n_overflow": jnp.int32(0),
            "n_dt_too_small": jnp.sum(mask_b & (new_dt < cfg.dt_min)),
            "n_ghost_iter": jnp.int32(0), "n_active": jnp.sum(mask_b),
            "h_max_active": jnp.float32(0.0)}
    return s, diag


# Module-level jitted entry points: static on (grid, scheme, config,
# gravity_fn, cooling_fn) so engines with equal setups share one
# compilation — the analog of SWIFT compiling its runners once.
_JIT_STEP = jax.jit(hydro_step, static_argnums=(0, 1, 2, 3, 7, 8))
_JIT_INIT = jax.jit(_init_pass, static_argnums=(0, 1, 2, 3))
_JIT_MULTI = jax.jit(multi_step, static_argnums=(0, 1, 2, 3, 4, 8))

def _mesh_update(mesh_fn, s, dt_close, dt_open):
    """Separate PM-mesh kick at a mesh-step boundary (kick.h:255).

    Closes the previous mesh half-kick with the OLD field, recomputes the
    mesh field, opens the next half-kick with the NEW one.  Returns the
    updated state and max |a_mesh| (the host sizes the next mesh step
    from it, engine.c:2406 ti_mesh logic).
    """
    mb = s["mask"][..., None]
    v = s["v_full"] + s["a_grav_mesh"] * (dt_close * mb)
    acc_new, pot_new = mesh_fn({**s, "v_full": v})
    v = v + acc_new * (dt_open * mb)
    amax = jnp.max(jnp.sqrt(jnp.sum(acc_new * acc_new, -1)))
    return {**s, "v_full": v, "a_grav_mesh": acc_new * mb,
            "pot_mesh": pot_new * s["mask"]}, amax


def _mesh_open(s, dt):
    mb = s["mask"][..., None]
    return {**s, "v_full": s["v_full"] + s["a_grav_mesh"] * (dt * mb)}


_JIT_MESH = jax.jit(_mesh_update, static_argnums=(0,))
_JIT_MESH_OPEN = jax.jit(_mesh_open)


# Non-cosmological fast path: the identity cosmology factors ride as
# python-float literals so XLA/Mosaic fold every a/H multiplication at
# trace time (passing CosmoFactors.no_cosmo() as a runtime arg keeps them
# as traced scalars and defeats constant folding in the hot pair loops).
_NO_COSMO_LIT = CosmoFactors(a=1.0, H=0.0, a_inv2=1.0, fac_mu=1.0,
                             a_factor_sound_speed=1.0,
                             a_factor_Balsara_eps=1.0,
                             a_factor_internal_energy=1.0)


def _step_nc(grid, p, cfg, gravity_fn, s, T, cooling_fn=None, rt_fn=None):
    return hydro_step(grid, p, cfg, gravity_fn, _NO_COSMO_LIT, s, T,
                      cooling_fn, rt_fn)


def _init_nc(grid, p, cfg, gravity_fn, s, T):
    return _init_pass(grid, p, cfg, gravity_fn, _NO_COSMO_LIT, s, T)


def _multi_nc(grid, p, cfg, gravity_fn, k, s, T, cooling_fn=None):
    return multi_step(grid, p, cfg, gravity_fn, k, _NO_COSMO_LIT, s, T,
                      cooling_fn)


_JIT_STEP_NC = jax.jit(_step_nc, static_argnums=(0, 1, 2, 3, 6, 7))
_JIT_INIT_NC = jax.jit(_init_nc, static_argnums=(0, 1, 2, 3))
_JIT_MULTI_NC = jax.jit(_multi_nc, static_argnums=(0, 1, 2, 3, 4, 7))
_JIT_DM_STEP = jax.jit(dm_step, static_argnums=(0, 1, 2, 3))
_JIT_DM_INIT = jax.jit(_dm_init, static_argnums=(0, 1, 2, 3))


class DMEngine(Engine):
    """Gravity-only engine (EAGLE_DMO-style runs): same timeline/tables
    machinery, collisionless KDK stepping."""

    def __init__(self, grid, cfg: EngineConfig, time_begin, time_end,
                 gravity_fn: Callable, eps_soft: float,
                 cosmo=None, cosmology=None,
                 mesh_fn: Optional[Callable] = None,
                 mesh_dt_scale: float = 0.0,
                 external_potential=None):
        from .models.sph.sphenix import SPHENIXParams
        super().__init__(grid, SPHENIXParams(), cfg, time_begin, time_end,
                         cosmo=cosmo, gravity_fn=gravity_fn,
                         cosmology=cosmology, mesh_fn=mesh_fn,
                         mesh_dt_scale=mesh_dt_scale,
                         external_potential=external_potential)
        self.eps_soft = float(eps_soft)

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
            raise RuntimeError(f"{int(n_over)} particles overflow K")
        C, K = self.grid.C, self.grid.K
        self.state = {
            "mask": mask, "off": off, **out,
            "a_grav": jnp.zeros((C, K, 3), F32),
            "a_grav_mesh": jnp.zeros((C, K, 3), F32),
            "pot": jnp.zeros((C, K), F32),
            "pot_mesh": jnp.zeros((C, K), F32),
            "time_bin": jnp.zeros((C, K), I32),
            "drift_accum": jnp.float32(0.0),
        }
        self.n_particles = n

    def init_particles(self):
        return self._with_regrid_retry(self._init_particles_once)

    def _init_particles_once(self):
        if self.mesh_fn is not None:
            self._mesh_boundary()
        T = self._tables()
        self.state, diag = _JIT_DM_INIT(
            self.grid, self.cfg, self.gravity_fn, self.eps_soft,
            self.state, T)
        self._post_step(diag)
        return diag

    def _step_once(self):
        t = self.timeline
        ti_next = self._ti_end_min
        if self.mesh_fn is not None:
            if self.ti_mesh_end is None:
                self._mesh_boundary()
            ti_next = min(ti_next, self.ti_mesh_end)
        ti_old = t.ti_current
        dt_drift = (ti_next - ti_old) * t.time_base
        t.ti_current = ti_next
        # ti_drift_start makes cosmological runs use the proper
        # int dt/a^2 drift factor instead of the raw Delta(log a)
        T = self._tables(dt_drift=dt_drift, ti_drift_start=ti_old)
        self.state, diag = _JIT_DM_STEP(
            self.grid, self.cfg, self.gravity_fn, self.eps_soft,
            self.state, T)
        self._post_step(diag)
        self.step_count += 1
        if self.mesh_fn is not None and t.ti_current >= self.ti_mesh_end:
            self._mesh_boundary()
        return diag

    def _post_step(self, diag):
        counts = np.asarray(diag["bin_counts"])
        self._ti_end_min = self.timeline.ti_end_min_from_bins(counts)
        if int(diag["n_overflow"]) != 0:
            raise RegridNeeded("cell overflow during rebucket")
        if int(diag["n_dt_too_small"]) != 0:
            raise RuntimeError("dt below dt_min")
