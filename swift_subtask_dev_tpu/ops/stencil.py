"""27-stencil neighbour engine (XLA path).

This is the TPU replacement for SWIFT's sorted pseudo-Verlet pair loops
(src/runner_doiact_functions_hydro.h DOPAIR1/DOSELF1 + the 13-axis sort
machinery of sort_part.h): instead of sorting particles along pair axes, we
compute **dense masked pair tiles between each cell and its 27 neighbours**.
Each stencil offset becomes a static `jnp.roll` of the cell grid — under
GSPMD sharding these rolls compile to ICI collective-permutes, which is how
the halo exchange of SWIFT's proxies (src/proxy.c) happens here without any
explicit communication code.

All pairwise physics is delegated to scheme term-functions
(models/sph/sphenix.py) so the same formulas run in the brute-force checker
and in the Pallas fast path.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..grid.cellgrid import CellGrid
from ..models.sph import sphenix
from ..models.sph.sphenix import CosmoFactors, SPHENIXParams

F32 = jnp.float32

# "no neighbour" sentinel for time-bin min reductions (> any real bin,
# small enough that sentinel+2 can't overflow i32)
NBIN_SENTINEL = 64

# The 27 stencil offsets, self first (d=0 reuses the un-rolled arrays).
STENCIL_27 = [(0, 0, 0)] + [
    (dx, dy, dz)
    for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)
    if not (dx == 0 and dy == 0 and dz == 0)
]


def _grid_view(grid: CellGrid, arr: jnp.ndarray) -> jnp.ndarray:
    """(C, K, ...) -> (ncx, ncy, ncz, K, ...)."""
    return arr.reshape(grid.cdim + arr.shape[1:])


def _flat_view(grid: CellGrid, arr: jnp.ndarray) -> jnp.ndarray:
    return arr.reshape((grid.C,) + arr.shape[3:])


def _roll(arr: jnp.ndarray, d) -> jnp.ndarray:
    """rolled[c] = arr[c + d] (periodic)."""
    if d == (0, 0, 0):
        return arr
    return jnp.roll(arr, shift=(-d[0], -d[1], -d[2]), axis=(0, 1, 2))


def _sanitize(mask, x, fill=1.0):
    """Replace empty-slot values so masked pairs stay finite.

    Every pair contribution is multiplied by the pair mask before reduction,
    but NaN*0 = NaN — so any field that appears in a denominator must carry a
    harmless value in empty slots.
    """
    return jnp.where(mask > 0, x, jnp.float32(fill))


def _bi(x):  # broadcast i-side: (..., K) -> (..., K, 1)
    return x[..., :, None]


def _bj(x):  # broadcast j-side: (..., K) -> (..., 1, K)
    return x[..., None, :]


def _pair_geometry_shift(off_i, off_j_rolled, shift):
    """dx components and r2 for all (a, b) slot pairs; shift = d*edge."""
    dx = tuple(
        _bi(off_i[..., k]) - _bj(off_j_rolled[..., k]) - shift[k]
        for k in range(3))
    r2 = dx[0] * dx[0] + dx[1] * dx[1] + dx[2] * dx[2]
    return dx, r2

# ---------------------------------------------------------------------------
# Offset application.  Two modes:
#
# * packed (default, single-chip): all 27 rolled j-views are concatenated
#   along the slot axis into ONE (…, K_i, 27*K) masked pair tile.  With
#   K a multiple of 8 this keeps the TPU's 128-lane axis ~99% occupied,
#   where per-offset (…, K, K) tiles pad K→128 lanes (2.3x waste at K=56).
#   The stencil shift is folded into the packed j offsets, so the pair
#   math sees shift = 0.
#
# * lax.scan over pre-rolled stacks (27x smaller graph — used for GSPMD-
#   sharded compiles, where sharding propagation over an unrolled program
#   is very slow, and the per-offset rolls become ICI collective-permutes).
# ---------------------------------------------------------------------------

def _apply_offsets(grid: CellGrid, j_fields: Dict[str, jnp.ndarray],
                   acc0, accumulate, use_scan: bool):
    """accumulate(acc, j_rolled: dict, shift: (3,) f32 or tuple) -> acc."""
    edge = grid.edge
    if not use_scan:
        packed = {}
        for k, v in j_fields.items():
            rolls = [_roll(v, d) for d in STENCIL_27]
            if k == "off":
                # fold the periodic stencil shift into the j offsets
                rolls = [r + jnp.asarray(
                    [d[0] * edge[0], d[1] * edge[1], d[2] * edge[2]], F32)
                    for r, d in zip(rolls, STENCIL_27)]
            packed[k] = jnp.concatenate(rolls, axis=3)
        zero = (jnp.float32(0.0),) * 3
        return accumulate(acc0, packed, zero)
    stacked = {k: jnp.stack([_roll(v, d) for d in STENCIL_27])
               for k, v in j_fields.items()}
    shifts = jnp.asarray(
        [[d[0] * edge[0], d[1] * edge[1], d[2] * edge[2]]
         for d in STENCIL_27], jnp.float32)

    def body(acc, xs):
        jf, sh = xs
        return accumulate(acc, jf, (sh[0], sh[1], sh[2])), None

    acc, _ = jax.lax.scan(body, acc0, (stacked, shifts))
    return acc



# ---------------------------------------------------------------------------
# Hydro loops
# ---------------------------------------------------------------------------

def density_loop(grid: CellGrid, s: Dict[str, jnp.ndarray],
                 p: SPHENIXParams, use_scan: bool = False
                 ) -> Dict[str, jnp.ndarray]:
    """SPH density sums for every particle (SWIFT density SELF+PAIR tasks).

    Consumes: mask, off, v, h, m.  Produces raw accumulators (rho, rho_dh,
    wcount, wcount_dh, div_v, rot_v) BEFORE end_density h-factors.
    """
    g = lambda name: _grid_view(grid, s[name])
    mask, off, v, m = g("mask"), g("off"), g("v"), g("m")
    h = _sanitize(mask, g("h"))
    hinv = 1.0 / h

    gamma2 = jnp.float32(p.kernel.gamma2)
    hi = _bi(h)
    hinv_i = _bi(hinv)
    range2 = gamma2 * hi * hi

    # scheme extras: e.g. PressureEnergy's u-weighted sums
    # (hydro/PressureEnergy/hydro_iact.h:92 pressure_bar terms)
    extra_keys = tuple(getattr(p.mod, "DENSITY_EXTRA_KEYS", ()))
    needs_u = getattr(p.mod, "DENSITY_NEEDS_U", False)
    keys = ("rho", "rho_dh", "wcount", "wcount_dh", "div_v",
            "rot_v0", "rot_v1", "rot_v2") + extra_keys
    acc0 = {k: jnp.zeros_like(h) for k in keys}
    j_fields = {"off": off, "v": v, "m": m, "mask": mask}
    if needs_u:
        j_fields["u"] = g("u")

    def accumulate(acc, jf, shift):
        dx, r2 = _pair_geometry_shift(off, jf["off"], shift)
        pair_ok = (_bj(jf["mask"]) > 0) & (r2 > 0) & (r2 < range2)
        w = pair_ok.astype(F32)
        dv = tuple(_bi(v[..., k]) - _bj(jf["v"][..., k]) for k in range(3))
        uj = (_bj(jf["u"]),) if needs_u else ()
        terms = p.mod.density_terms(p, dx, r2, hinv_i, _bj(jf["m"]), dv,
                                    *uj)
        return {k: acc[k] + jnp.sum(terms[k] * w, axis=-1) for k in keys}

    acc = _apply_offsets(grid, j_fields, acc0, accumulate, use_scan)
    out = {k: _flat_view(grid, a) * s["mask"] for k, a in acc.items()}
    res = {
        "rho": out["rho"], "rho_dh": out["rho_dh"],
        "wcount": out["wcount"], "wcount_dh": out["wcount_dh"],
        "div_v": out["div_v"],
        "rot_v": jnp.stack([out["rot_v0"], out["rot_v1"], out["rot_v2"]],
                           axis=-1),
    }
    for k in extra_keys:
        res[k] = out[k]
    return res


def gradient_loop(grid: CellGrid, s: Dict[str, jnp.ndarray],
                  p: SPHENIXParams, cosmo: CosmoFactors,
                  use_scan: bool = False) -> Dict[str, jnp.ndarray]:
    """Gradient loop (v_sig max, alpha_visc_max_ngb + per-scheme sums).

    Per-scheme extensions ride module attributes: ``GRADIENT_SUM_KEYS``
    names the summed outputs (default SPHENIX's laplace_u), and
    ``GRADIENT_J_EXTRA`` names state keys whose (i, j) values are
    appended as positional args to ``gradient_terms`` — e.g. Gasoline's
    shock_indicator/tensor_norm (hydro/Gasoline/hydro_iact.h:191)."""
    g = lambda name: _grid_view(grid, s[name])
    mask, off, v, m = g("mask"), g("off"), g("v"), g("m")
    h = _sanitize(mask, g("h"))
    hinv = 1.0 / h
    u, cs, av = g("u"), g("soundspeed"), g("alpha_visc")
    rhoinv = 1.0 / jnp.maximum(_sanitize(mask, g("rho")), 1e-30)

    sum_keys = tuple(getattr(p.mod, "GRADIENT_SUM_KEYS", ("laplace_u",)))
    j_extra = tuple(getattr(p.mod, "GRADIENT_J_EXTRA", ()))
    # extra masked-max reductions beyond v_sig/alpha_visc_max_ngb — e.g.
    # Gizmo's cell-wide slope-limiter min/max of neighbour primitives
    # (hydro_slope_limiters_cell.h:58; minima ride as max of the negation)
    max_keys = tuple(getattr(p.mod, "GRADIENT_MAX_KEYS", ()))

    gamma2 = jnp.float32(p.kernel.gamma2)
    hi = _bi(h)
    hinv_i = _bi(hinv)
    range2 = gamma2 * hi * hi

    NEG_BIG = jnp.float32(-1e30)
    acc0 = (tuple(jnp.zeros_like(h) for _ in sum_keys),
            _grid_view(grid, s["v_sig"]),
            _grid_view(grid, s["alpha_visc_max_ngb"]),
            tuple(jnp.full_like(h, NEG_BIG) for _ in max_keys))
    j_fields = {"off": off, "v": v, "m": m, "mask": mask,
                "u": u, "rhoinv": rhoinv, "cs": cs, "av": av}
    for k in j_extra:
        j_fields[k] = g(k)

    def accumulate(acc, jf, shift):
        sums, v_sig, a_max, xmaxs = acc
        dx, r2 = _pair_geometry_shift(off, jf["off"], shift)
        pair_ok = (_bj(jf["mask"]) > 0) & (r2 > 0) & (r2 < range2)
        w = pair_ok.astype(F32)
        dv = tuple(_bi(v[..., k]) - _bj(jf["v"][..., k]) for k in range(3))
        extra = []
        for k in j_extra:
            extra += [_bi(j_fields[k]), _bj(jf[k])]
        t = p.mod.gradient_terms(
            p, dx, r2, hinv_i, _bj(jf["m"]), dv,
            _bi(u), _bj(jf["u"]), _bj(jf["rhoinv"]),
            _bi(cs), _bj(jf["cs"]), _bj(jf["av"]), *extra, cosmo=cosmo)
        sums = tuple(a + jnp.sum(t["sum"][k] * w, axis=-1)
                     for a, k in zip(sums, sum_keys))
        v_sig = jnp.maximum(v_sig, jnp.max(
            jnp.where(pair_ok, t["max"]["v_sig"], -jnp.inf), axis=-1))
        a_max = jnp.maximum(a_max, jnp.max(
            jnp.where(pair_ok, t["max"]["alpha_visc_max_ngb"], -jnp.inf),
            axis=-1))
        xmaxs = tuple(jnp.maximum(a, jnp.max(
            jnp.where(pair_ok, t["max"][k], NEG_BIG), axis=-1))
            for a, k in zip(xmaxs, max_keys))
        return (sums, v_sig, a_max, xmaxs)

    sums, v_sig, a_max, xmaxs = _apply_offsets(grid, j_fields, acc0,
                                               accumulate, use_scan)
    out = {k: _flat_view(grid, a) * s["mask"]
           for k, a in zip(sum_keys, sums)}
    out["v_sig"] = _flat_view(grid, v_sig)
    out["alpha_visc_max_ngb"] = _flat_view(grid, a_max)
    for k, a in zip(max_keys, xmaxs):
        out[k] = _flat_view(grid, a)
    return out


def force_loop(grid: CellGrid, s: Dict[str, jnp.ndarray],
               p: SPHENIXParams, cosmo: CosmoFactors,
               use_scan: bool = False) -> Dict[str, jnp.ndarray]:
    """SPHENIX force loop: a_hydro, u_dt, h_dt sums + v_sig max.

    Pair range is symmetric: r < gamma*max(h_i, h_j) (DOPAIR2 semantics).
    Also reduces min_ngb_time_bin over neighbours (the reference folds
    runner_iact_timebin into the force loop — timestep_limiter_iact.h:40).
    """
    g = lambda name: _grid_view(grid, s[name])
    mask, off, v = g("mask"), g("off"), g("v")
    h = _sanitize(mask, g("h"))
    m = _sanitize(mask, g("m"))
    rho = jnp.maximum(_sanitize(mask, g("rho")), 1e-30)
    P = _sanitize(mask, g("pressure"))
    cs = _sanitize(mask, g("soundspeed"), fill=0.0)
    f_gh = _sanitize(mask, g("f_gradh"), fill=0.0)
    bal = _sanitize(mask, g("balsara"), fill=0.0)
    al = _sanitize(mask, g("alpha_visc"), fill=0.0)
    ad = _sanitize(mask, g("alpha_diff"), fill=0.0)
    u = _sanitize(mask, g("u"), fill=0.0)
    # hoisted per-particle reciprocals (force_terms takes no per-pair divs)
    hinv = 1.0 / h
    minv = 1.0 / m
    rhoinv = 1.0 / rho
    pr2 = P * rhoinv * rhoinv

    gamma2 = jnp.float32(p.kernel.gamma2)
    hi = _bi(h)
    hinv_i = _bi(hinv)

    tb = (_grid_view(grid, s["time_bin"].astype(F32))
          if "time_bin" in s else jnp.zeros_like(mask))
    big_bin = jnp.float32(1e9)

    # per-scheme extensions: extra (i, j) state fields appended as
    # positional args to force_terms (e.g. Gizmo's volume/B-matrix/
    # primitive gradients, hydro/Gizmo/hydro_iact.h:226-240), and extra
    # summed outputs beyond the SPH five (e.g. MFV's mass flux m_dt)
    j_extra = tuple(getattr(p.mod, "FORCE_J_EXTRA", ()))
    extra_sum = tuple(getattr(p.mod, "FORCE_EXTRA_SUM_KEYS", ()))

    keys = ("a_hydro0", "a_hydro1", "a_hydro2", "u_dt", "h_dt") + extra_sum
    acc0 = ({k: jnp.zeros_like(h) for k in keys}, g("v_sig"),
            jnp.full_like(h, big_bin))
    j_fields = {"off": off, "v": v, "m": m, "mask": mask, "h": h, "u": u,
                "rho": rho, "P": P, "cs": cs, "f_gh": f_gh, "bal": bal,
                "al": al, "ad": ad, "tb": tb, "hinv": hinv, "minv": minv,
                "rhoinv": rhoinv, "pr2": pr2}
    for k in j_extra:
        j_fields[k] = g(k)

    def accumulate(acc, jf, shift):
        sums, v_sig, min_tb = acc
        h_j = _bj(jf["h"])
        dx, r2 = _pair_geometry_shift(off, jf["off"], shift)
        range2 = gamma2 * jnp.maximum(hi, h_j) ** 2
        pair_ok = (_bj(jf["mask"]) > 0) & (r2 > 0) & (r2 < range2)
        w = pair_ok.astype(F32)
        tb_j = _bj(jf["tb"])
        min_tb = jnp.minimum(min_tb, jnp.min(
            jnp.where(pair_ok & (tb_j > 0), tb_j, big_bin), axis=-1))
        dv = tuple(_bi(v[..., k]) - _bj(jf["v"][..., k]) for k in range(3))
        extra = []
        for k in j_extra:
            extra += [_bi(j_fields[k]), _bj(jf[k])]
        t = p.mod.force_terms(
            p, dx, r2, hinv_i, _bj(jf["hinv"]), _bi(m), _bj(jf["m"]),
            _bi(minv), _bj(jf["minv"]), dv,
            _bi(rho), _bj(jf["rho"]), _bi(rhoinv), _bj(jf["rhoinv"]),
            _bi(pr2), _bj(jf["pr2"]),
            _bi(P), _bj(jf["P"]), _bi(cs), _bj(jf["cs"]),
            _bi(f_gh), _bj(jf["f_gh"]), _bi(bal), _bj(jf["bal"]),
            _bi(al), _bj(jf["al"]), _bi(ad), _bj(jf["ad"]),
            _bi(u), _bj(jf["u"]), *extra, cosmo=cosmo)
        sums = {k: sums[k] + jnp.sum(t["sum"][k] * w, axis=-1)
                for k in keys}
        v_sig = jnp.maximum(v_sig, jnp.max(
            jnp.where(pair_ok, t["max"]["v_sig"], -jnp.inf), axis=-1))
        return (sums, v_sig, min_tb)

    sums, v_sig, min_tb = _apply_offsets(grid, j_fields, acc0, accumulate,
                                         use_scan)
    out = {k: _flat_view(grid, a) * s["mask"] for k, a in sums.items()}
    res = {
        "a_hydro": jnp.stack([out["a_hydro0"], out["a_hydro1"],
                              out["a_hydro2"]], axis=-1),
        "u_dt": out["u_dt"],
        "h_dt": out["h_dt"],
        "v_sig": _flat_view(grid, v_sig),
        "min_ngb_time_bin": jnp.minimum(
            _flat_view(grid, min_tb), jnp.float32(NBIN_SENTINEL)
        ).astype(jnp.int32),
    }
    for k in extra_sum:
        res[k] = out[k]
    return res


def timebin_loop(grid: CellGrid, s: Dict[str, jnp.ndarray],
                 p: SPHENIXParams, use_scan: bool = False) -> jnp.ndarray:
    """Min time bin over *active* neighbours (the wake-up scan).

    The reference's limiter loop (runner_iact_nonsym_limiter,
    timestep_limiter_iact.h:106): an active particle i flags any inactive
    neighbour j within gamma*h_i whose bin exceeds bin_i + 2.  Inverted
    j-centric here: every particle reduces the min new bin over the active
    neighbours whose kernel covers it.

    Needs in ``s``: mask, off, h, time_bin (post-timestep), active (f32).
    Returns (C, K) i32 (NUM_TIME_BINS+9 where no active neighbour).
    """
    g = lambda name: _grid_view(grid, s[name])
    mask, off = g("mask"), g("off")
    h = _sanitize(mask, g("h"))
    tb = g("time_bin").astype(F32)
    act = g("active")

    gamma2 = jnp.float32(p.kernel.gamma2)
    big_bin = jnp.float32(1e9)

    acc0 = jnp.full(mask.shape, big_bin, F32)
    j_fields = {"off": off, "h": h, "tb": tb, "act": act, "mask": mask}

    def accumulate(acc, jf, shift):
        dx, r2 = _pair_geometry_shift(off, jf["off"], shift)
        h_j = _bj(jf["h"])
        tb_j = _bj(jf["tb"])
        ok = ((_bj(jf["mask"]) > 0) & (_bj(jf["act"]) > 0) & (r2 > 0)
              & (r2 < gamma2 * h_j * h_j) & (tb_j > 0))
        return jnp.minimum(acc, jnp.min(
            jnp.where(ok, tb_j, big_bin), axis=-1))

    acc = _apply_offsets(grid, j_fields, acc0, accumulate, use_scan)
    return jnp.minimum(_flat_view(grid, acc),
                       jnp.float32(NBIN_SENTINEL)).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Cross-species loops (stars <-> gas) for the feedback pipeline.
# The i and j species live on the same top grid but carry different slot
# capacities; the pair tile is (..., K_i, 27*K_j).
# ---------------------------------------------------------------------------

def star_ngb_mass_loop(grid: CellGrid, star_s: Dict, gas_s: Dict,
                       p: SPHENIXParams, use_scan: bool = False):
    """For every star: sum of gas neighbour masses within gamma*h_star.

    The feedback normalisation sum of stars_density
    (reference src/stars/EAGLE + feedback EAGLE: ngb_mass accumulated in
    the stars density loop, feedback.h feedback_props).
    Needs star_s: mask/off/h; gas_s: mask/off/m.  Returns (C, K_s) f32.
    """
    gm = lambda n: _grid_view(grid, star_s[n])
    smask, soff = gm("mask"), gm("off")
    h = _sanitize(smask, gm("h"))
    hinv_i = _bi(1.0 / h)

    gamma2 = jnp.float32(p.kernel.gamma2)
    acc0 = jnp.zeros(smask.shape, F32)
    j_fields = {"off": _grid_view(grid, gas_s["off"]),
                "m": _grid_view(grid, gas_s["m"]),
                "mask": _grid_view(grid, gas_s["mask"])}

    def accumulate(acc, jf, shift):
        dx, r2 = _pair_geometry_shift(soff, jf["off"], shift)
        ok = (_bj(jf["mask"]) > 0) & (r2 * hinv_i ** 2 < gamma2)
        return acc + jnp.sum(jnp.where(ok, _bj(jf["m"]), 0.0), axis=-1)

    acc = _apply_offsets(grid, j_fields, acc0, accumulate, use_scan)
    return _flat_view(grid, acc) * star_s["mask"]


def _pair_hash_uniform(id_i, id_j, ti_lo, ti_hi, salt: int):
    """Deterministic per-(gas, star, step) uniform draw — the analog of
    random_unit_interval_two_IDs (random.h:211): a cheap integer mix of
    both particle IDs, the step tick, and a purpose salt."""
    x = (id_i.astype(jnp.uint32) * jnp.uint32(0x9E3779B9)
         ^ id_j.astype(jnp.uint32) * jnp.uint32(0x85EBCA6B))
    x = x ^ (ti_lo.astype(jnp.uint32) * jnp.uint32(0xC2B2AE35))
    x = x ^ (ti_hi.astype(jnp.uint32) + jnp.uint32(salt))
    # xorshift-multiply finalizer (murmur3 fmix32)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    return x.astype(F32) * jnp.float32(1.0 / 4294967296.0)


def feedback_apply_loop(grid: CellGrid, gas_s: Dict, star_s: Dict,
                        p: SPHENIXParams, ti_lo, ti_hi,
                        du_heat: float, use_scan: bool = False):
    """EAGLE stochastic thermal feedback: every gas particle inside a
    flagged star's kernel is heated by du_heat with probability
    E_star / (du_heat * ngb_mass_star) (feedback/EAGLE/feedback_iact.h
    runner_iact_nonsym_feedback_apply; eq. 7 of Dalla Vecchia & Schaye
    2012).  Returns (du_add (C,K_gas), n_heating_events (C,K_gas) i32).

    star_s needs: mask/off/h/pid/fb_energy (energy to inject this step,
    0 for unflagged stars) and fb_ngb_mass (from star_ngb_mass_loop).
    """
    gm = lambda n: _grid_view(grid, gas_s[n])
    gmask, goff = gm("mask"), gm("off")
    gpid = _grid_view(grid, gas_s["pid"])

    sv = lambda n: _grid_view(grid, star_s[n])
    prob_full = star_s["fb_energy"] / jnp.maximum(
        star_s["fb_ngb_mass"] * jnp.float32(du_heat), 1e-30)
    j_fields = {"off": sv("off"),
                "h": _sanitize(sv("mask"), sv("h")),
                "mask": sv("mask"),
                "pid": sv("pid"),
                "prob": _grid_view(grid, prob_full)}

    gamma2 = jnp.float32(p.kernel.gamma2)
    acc0 = (jnp.zeros(gmask.shape, F32), jnp.zeros(gmask.shape, F32))

    def accumulate(acc, jf, shift):
        du, nev = acc
        dx, r2 = _pair_geometry_shift(goff, jf["off"], shift)
        h_j = _bj(jf["h"])
        ok = ((_bi(gmask) > 0) & (_bj(jf["mask"]) > 0)
              & (r2 < gamma2 * h_j * h_j)
              & (_bj(jf["prob"]) > 0))
        draw = _pair_hash_uniform(
            _bi(gpid).astype(jnp.uint32),
            _bj(jf["pid"]).astype(jnp.uint32),
            ti_lo, ti_hi, 0x5bd1e995)
        heat = ok & (draw < _bj(jf["prob"]))
        hf = heat.astype(F32)
        return (du + jnp.sum(hf, axis=-1) * jnp.float32(du_heat),
                nev + jnp.sum(hf, axis=-1))

    du, nev = _apply_offsets(grid, j_fields, acc0, accumulate, use_scan)
    return (_flat_view(grid, du) * gas_s["mask"],
            _flat_view(grid, nev).astype(jnp.int32))


def star_kernel_weight_loop(grid: CellGrid, star_s: Dict, gas_s: Dict,
                            p: SPHENIXParams, use_scan: bool = False):
    """Per-star Sigma m_j W(r_ij, h_star) over gas neighbours — the
    enrichment normalisation (feedback_iact.h nonsym density:
    si->feedback_data.enrichment_weight_inv denominator).  Returns
    (C, K_star) f32 (unnormalised by h^-3: shares are ratios, so the
    common factor cancels)."""
    gm = lambda n: _grid_view(grid, star_s[n])
    smask, soff = gm("mask"), gm("off")
    h = _sanitize(smask, gm("h"))
    hinv_i = _bi(1.0 / h)

    gamma2 = jnp.float32(p.kernel.gamma2)
    acc0 = jnp.zeros(smask.shape, F32)
    j_fields = {"off": _grid_view(grid, gas_s["off"]),
                "m": _grid_view(grid, gas_s["m"]),
                "mask": _grid_view(grid, gas_s["mask"])}

    def accumulate(acc, jf, shift):
        dx, r2 = _pair_geometry_shift(soff, jf["off"], shift)
        u2 = r2 * hinv_i ** 2
        ok = (_bj(jf["mask"]) > 0) & (u2 < gamma2)
        w_kern, _ = p.kernel.deval(jnp.sqrt(u2))
        return acc + jnp.sum(
            jnp.where(ok, _bj(jf["m"]) * w_kern, 0.0), axis=-1)

    acc = _apply_offsets(grid, j_fields, acc0, accumulate, use_scan)
    return _flat_view(grid, acc) * star_s["mask"]


def enrichment_apply_loop(grid: CellGrid, gas_s: Dict, star_s: Dict,
                          p: SPHENIXParams, use_scan: bool = False):
    """Distribute stellar ejecta kernel-weighted over gas neighbours
    (feedback_iact.h runner_iact_nonsym_feedback_apply mass/metal
    transfer): gas i receives share = m_i W(r, h_s) / norm_s of every
    neighbour star's per-step ejecta.

    star_s needs: mask/off/h, ej_m (ejected mass this step), ej_mZ
    (metal mass), ej_elem (…, 9) element masses, v_full, and ej_norm
    (from star_kernel_weight_loop; <=0 suppresses the star).
    Returns dict of per-gas receives: dm, dmZ, delem (C,K,9), dp (C,K,3).
    """
    from ..subgrid.chemistry import N_ELEMENTS

    gm = lambda n: _grid_view(grid, gas_s[n])
    gmask, goff = gm("mask"), gm("off")
    gmass = gm("m")

    sv = lambda n: _grid_view(grid, star_s[n])
    norm_inv_full = jnp.where(star_s["ej_norm"] > 0,
                              1.0 / jnp.maximum(star_s["ej_norm"], 1e-30),
                              0.0)
    j_fields = {"off": sv("off"),
                "h": _sanitize(sv("mask"), sv("h")),
                "mask": sv("mask"),
                "ej_m": _grid_view(grid, star_s["ej_m"]),
                "ej_mZ": _grid_view(grid, star_s["ej_mZ"]),
                "ej_elem": _grid_view(grid, star_s["ej_elem"]),
                "v": _grid_view(grid, star_s["v_full"]),
                "ninv": _grid_view(grid, norm_inv_full)}

    gamma2 = jnp.float32(p.kernel.gamma2)
    keys = (["dm", "dmZ"] + [f"de{k}" for k in range(N_ELEMENTS)]
            + ["dp0", "dp1", "dp2"])
    acc0 = {k: jnp.zeros(gmask.shape, F32) for k in keys}

    def accumulate(acc, jf, shift):
        dx, r2 = _pair_geometry_shift(goff, jf["off"], shift)
        hinv_j = 1.0 / _bj(jf["h"])
        u2 = r2 * hinv_j * hinv_j
        ok = ((_bi(gmask) > 0) & (_bj(jf["mask"]) > 0) & (u2 < gamma2)
              & (_bj(jf["ej_m"]) > 0))
        w_kern, _ = p.kernel.deval(jnp.sqrt(u2))
        share = jnp.where(ok, _bi(gmass) * w_kern * _bj(jf["ninv"]), 0.0)
        out = dict(acc)
        dm_r = share * _bj(jf["ej_m"])
        out["dm"] = acc["dm"] + jnp.sum(dm_r, axis=-1)
        out["dmZ"] = acc["dmZ"] + jnp.sum(share * _bj(jf["ej_mZ"]), -1)
        for k in range(N_ELEMENTS):
            out[f"de{k}"] = acc[f"de{k}"] + jnp.sum(
                share * _bj(jf["ej_elem"][..., k]), axis=-1)
        for k in range(3):
            out[f"dp{k}"] = acc[f"dp{k}"] + jnp.sum(
                dm_r * _bj(jf["v"][..., k]), axis=-1)
        return out

    acc = _apply_offsets(grid, j_fields, acc0, accumulate, use_scan)
    flat = {k: _flat_view(grid, v) * gas_s["mask"] for k, v in
            acc.items()}
    return {"dm": flat["dm"], "dmZ": flat["dmZ"],
            "delem": jnp.stack([flat[f"de{k}"]
                                for k in range(N_ELEMENTS)], -1),
            "dp": jnp.stack([flat["dp0"], flat["dp1"], flat["dp2"]],
                            -1)}


def chemistry_smooth_loop(grid: CellGrid, s: Dict, p: SPHENIXParams,
                          use_scan: bool = False):
    """Kernel-smoothed metal mass fractions over gas neighbours
    (chemistry/EAGLE/chemistry_iact.h runner_iact_nonsym_chemistry +
    chemistry_end_density): for the total Z and each element k,

        Z_sm_i = (sum_j m_j Z_j W(r_ij, h_i) + m_i Z_i W(0)) h_i^-3 / rho_i

    — the kernel-weighted metal density over the SPH density.  The
    reference accumulates these inside its density loop; here it is a
    separate pass run after the ghost (h and rho are final), which
    yields exactly the end-of-density result without threading ten more
    channels through every backend's density loop.

    Needs s: mask/off/m/h/rho/Z/elem_frac.  Returns
    (Z_smooth (C, K), elem_frac_smooth (C, K, 9)).
    """
    from ..subgrid.chemistry import N_ELEMENTS

    g = lambda name: _grid_view(grid, s[name])
    mask, off, m = g("mask"), g("off"), g("m")
    h = _sanitize(mask, g("h"))
    hinv_i = _bi(1.0 / h)
    gamma2 = jnp.float32(p.kernel.gamma2)

    keys = ("mZ",) + tuple(f"me{k}" for k in range(N_ELEMENTS))
    acc0 = {k: jnp.zeros(mask.shape, F32) for k in keys}
    j_fields = {"off": off, "m": m, "mask": mask, "Z": g("Z"),
                "ef": g("elem_frac")}

    def accumulate(acc, jf, shift):
        dx, r2 = _pair_geometry_shift(off, jf["off"], shift)
        u2 = r2 * hinv_i * hinv_i
        ok = (_bj(jf["mask"]) > 0) & (r2 > 0) & (u2 < gamma2)
        w_kern, _ = p.kernel.deval(jnp.sqrt(u2))
        mw = jnp.where(ok, _bj(jf["m"]) * w_kern, 0.0)
        out = dict(acc)
        out["mZ"] = acc["mZ"] + jnp.sum(mw * _bj(jf["Z"]), axis=-1)
        for k in range(N_ELEMENTS):
            out[f"me{k}"] = acc[f"me{k}"] + jnp.sum(
                mw * _bj(jf["ef"][..., k]), axis=-1)
        return out

    acc = _apply_offsets(grid, j_fields, acc0, accumulate, use_scan)
    flat = {k: _flat_view(grid, v) for k, v in acc.items()}

    kroot = jnp.float32(p.kernel.root)
    h_flat = jnp.where(s["mask"] > 0, s["h"], 1.0)
    h_inv_dim = (1.0 / h_flat) ** 3
    fac = h_inv_dim / jnp.maximum(s["rho"], 1e-30) * s["mask"]
    Z_sm = (flat["mZ"] + s["m"] * s["Z"] * kroot) * fac
    ef_sm = jnp.stack(
        [(flat[f"me{k}"] + s["m"] * s["elem_frac"][..., k] * kroot) * fac
         for k in range(N_ELEMENTS)], axis=-1)
    return Z_sm, ef_sm


def star_energy_apply_loop(grid: CellGrid, gas_s: Dict, star_s: Dict,
                           p: SPHENIXParams, use_scan: bool = False):
    """Continuous kernel-weighted energy deposition (GEAR feedback):
    gas i receives du_i = W(r_ij, h_s) / norm_s * E_s from every firing
    neighbour star (feedback/GEAR/feedback.c feedback_reset_part +
    runner_iact_nonsym_feedback_apply: energy shares follow the same
    m_i W / Sigma m W weights as the ejecta, so dE_i = share_i * E and
    du_i = dE_i / m_i = W ninv E).

    star_s needs: mask/off/h, fb_energy (energy to deposit this step),
    ej_norm (from star_kernel_weight_loop).  Returns du (C, K_gas) f32.
    """
    gm = lambda n: _grid_view(grid, gas_s[n])
    gmask, goff = gm("mask"), gm("off")

    sv = lambda n: _grid_view(grid, star_s[n])
    ninv_full = jnp.where(star_s["ej_norm"] > 0,
                          1.0 / jnp.maximum(star_s["ej_norm"], 1e-30),
                          0.0)
    j_fields = {"off": sv("off"),
                "h": _sanitize(sv("mask"), sv("h")),
                "mask": sv("mask"),
                "E": _grid_view(grid, star_s["fb_energy"]),
                "ninv": _grid_view(grid, ninv_full)}

    gamma2 = jnp.float32(p.kernel.gamma2)
    acc0 = jnp.zeros(gmask.shape, F32)

    def accumulate(acc, jf, shift):
        dx, r2 = _pair_geometry_shift(goff, jf["off"], shift)
        hinv_j = 1.0 / _bj(jf["h"])
        u2 = r2 * hinv_j * hinv_j
        ok = ((_bi(gmask) > 0) & (_bj(jf["mask"]) > 0) & (u2 < gamma2)
              & (_bj(jf["E"]) > 0))
        w_kern, _ = p.kernel.deval(jnp.sqrt(u2))
        du = jnp.where(ok, w_kern * _bj(jf["ninv"]) * _bj(jf["E"]), 0.0)
        return acc + jnp.sum(du, axis=-1)

    acc = _apply_offsets(grid, j_fields, acc0, accumulate, use_scan)
    return _flat_view(grid, acc) * gas_s["mask"]


def kinetic_ray_select_loop(grid: CellGrid, star_s: Dict, gas_s: Dict,
                            p: SPHENIXParams, use_scan: bool = False):
    """EAGLE kinetic feedback ray selection: for every firing star with
    an isotropic random direction d, find the gas neighbour best aligned
    with +d and with -d (feedback/EAGLE_kinetic/feedback_iact.h:102-126 —
    the reference minimises the arclength to the ray and its mirror;
    maximising cos(angle) selects the same pair).

    star_s needs: mask/off/h/fire (bool: fires this step) and ray_dir
    (C, K_s, 3) unit vectors.  gas_s needs mask/off/pid/m.
    Returns per-star (pid_plus, m_plus, pid_minus, m_minus); pid = -1
    where no neighbour was found in that hemisphere.
    """
    sm = lambda n: _grid_view(grid, star_s[n])
    smask, soff = sm("mask"), sm("off")
    fire = _grid_view(grid, star_s["fire"])
    d = _grid_view(grid, star_s["ray_dir"])
    di = tuple(_bi(d[..., k]) for k in range(3))
    h = _sanitize(smask, sm("h"))
    hinv_i = _bi(1.0 / h)
    gamma2 = jnp.float32(p.kernel.gamma2)

    j_fields = {"off": _grid_view(grid, gas_s["off"]),
                "mask": _grid_view(grid, gas_s["mask"]),
                "pid": _grid_view(grid, gas_s["pid"]),
                "m": _grid_view(grid, gas_s["m"])}

    NEG = jnp.float32(-3.0)
    zf = jnp.full(smask.shape, NEG, F32)
    zi = jnp.full(smask.shape, -1, jnp.int32)
    zm = jnp.zeros(smask.shape, F32)
    acc0 = {"cp": zf, "pp": zi, "mp": zm, "cm": zf, "pm": zi, "mm": zm}

    def accumulate(acc, jf, shift):
        dx, r2 = _pair_geometry_shift(soff, jf["off"], shift)
        ok = ((_bi(fire)) & (_bj(jf["mask"]) > 0) & (r2 > 0)
              & (r2 * hinv_i ** 2 < gamma2))
        rinv = jax.lax.rsqrt(jnp.maximum(r2, 1e-30))
        # direction star -> gas is -dx (dx = x_star - x_gas)
        cos = -(dx[0] * di[0] + dx[1] * di[1] + dx[2] * di[2]) * rinv
        pid_b = jnp.broadcast_to(_bj(jf["pid"]), cos.shape)
        m_b = jnp.broadcast_to(_bj(jf["m"]), cos.shape)
        out = dict(acc)
        for key, blk in (("p", jnp.where(ok, cos, NEG)),
                         ("m", jnp.where(ok, -cos, NEG))):
            idx = jnp.argmax(blk, axis=-1)[..., None]
            best = jnp.take_along_axis(blk, idx, axis=-1)[..., 0]
            bpid = jnp.take_along_axis(pid_b, idx, axis=-1)[..., 0]
            bm = jnp.take_along_axis(m_b, idx, axis=-1)[..., 0]
            upd = best > acc[f"c{key}"]
            out[f"c{key}"] = jnp.where(upd, best, acc[f"c{key}"])
            out[f"p{key}"] = jnp.where(upd, bpid, acc[f"p{key}"])
            out[f"m{key}"] = jnp.where(upd, bm, acc[f"m{key}"])
        return out

    acc = _apply_offsets(grid, j_fields, acc0, accumulate, use_scan)
    fl = {k: _flat_view(grid, v) for k, v in acc.items()}
    found = (fl["cp"] > NEG) & (fl["cm"] > NEG) & (fl["pp"] != fl["pm"])
    return (jnp.where(found, fl["pp"], -1), fl["mp"],
            jnp.where(found, fl["pm"], -1), fl["mm"])


def kinetic_kick_apply_loop(grid: CellGrid, gas_s: Dict, star_s: Dict,
                            p: SPHENIXParams, use_scan: bool = False):
    """Apply the paired kicks: gas i whose pid matches a neighbour star's
    pid_plus (pid_minus) receives momentum +q d (-q d)
    (feedback_iact.h:128-190 — two gas particles kicked in exactly
    opposite directions; q chosen so the pair carries the event energy
    while conserving momentum exactly).

    star_s needs: mask/off/h/ray_dir/pid_plus/pid_minus and either a
    shared ``kick_q`` or per-side ``kick_q_plus``/``kick_q_minus``
    (SPIN_JET jets kick different masses in the two hemispheres).
    Returns dp (C, K_gas, 3) — momentum received.
    """
    gm = lambda n: _grid_view(grid, gas_s[n])
    gmask, goff = gm("mask"), gm("off")
    gpid = _grid_view(grid, gas_s["pid"])

    sv = lambda n: _grid_view(grid, star_s[n])
    qp = star_s.get("kick_q_plus", star_s.get("kick_q"))
    qm = star_s.get("kick_q_minus", star_s.get("kick_q"))
    j_fields = {"off": sv("off"),
                "mask": sv("mask"),
                "pp": _grid_view(grid, star_s["pid_plus"]),
                "pm": _grid_view(grid, star_s["pid_minus"]),
                "qp": _grid_view(grid, qp),
                "qm": _grid_view(grid, qm),
                "d": _grid_view(grid, star_s["ray_dir"])}

    acc0 = tuple(jnp.zeros(gmask.shape, F32) for _ in range(3))

    def accumulate(acc, jf, shift):
        ok = (_bi(gmask) > 0) & (_bj(jf["mask"]) > 0)
        qs = (jnp.where(ok & (_bi(gpid) == _bj(jf["pp"]))
                        & (_bj(jf["qp"]) > 0), _bj(jf["qp"]), 0.0)
              - jnp.where(ok & (_bi(gpid) == _bj(jf["pm"]))
                          & (_bj(jf["qm"]) > 0), _bj(jf["qm"]), 0.0))
        return tuple(acc[k] + jnp.sum(qs * _bj(jf["d"][..., k]), axis=-1)
                     for k in range(3))

    acc = _apply_offsets(grid, j_fields, acc0, accumulate, use_scan)
    return jnp.stack([_flat_view(grid, a) * gas_s["mask"] for a in acc],
                     axis=-1)


def chemistry_shear_diff_loop(grid: CellGrid, s: Dict, p: SPHENIXParams,
                              C_diff: float, cosmo,
                              use_scan: bool = False):
    """Smagorinsky metal-diffusion coefficient from the velocity shear
    (chemistry/GEAR_DIFFUSION/chemistry_iact.h:80 accumulates
    S_ab = Σ_j m_j (v_j - v_i)_b dx_a dW_i/du / r; chemistry.h:243-291
    finishes: physical units, Hubble flow on the diagonal, symmetrize,
    remove the trace, D = C |S| (a h)^2).

    Needs s: mask/off/m/h/rho/v.  Returns diff_coef (C, K) in physical
    units.
    """
    g = lambda name: _grid_view(grid, s[name])
    mask, off, m = g("mask"), g("off"), g("m")
    h = _sanitize(mask, g("h"))
    hinv_i = _bi(1.0 / h)
    v = g("v")
    vi = tuple(_bi(v[..., k]) for k in range(3))
    gamma2 = jnp.float32(p.kernel.gamma2)

    keys = tuple(f"S{a}{b}" for a in range(3) for b in range(3))
    acc0 = {k: jnp.zeros(mask.shape, F32) for k in keys}
    j_fields = {"off": off, "m": m, "mask": mask, "v": v}

    def accumulate(acc, jf, shift):
        dx, r2 = _pair_geometry_shift(off, jf["off"], shift)
        u2 = r2 * hinv_i * hinv_i
        ok = (_bj(jf["mask"]) > 0) & (r2 > 0) & (u2 < gamma2)
        u = jnp.sqrt(jnp.maximum(u2, 1e-30))
        _, dw = p.kernel.deval(u)
        rinv = jax.lax.rsqrt(jnp.maximum(r2, 1e-30))
        mj_wi_dr = jnp.where(ok, _bj(jf["m"]) * dw * rinv, 0.0)
        dv = tuple(_bj(jf["v"][..., k]) - vi[k] for k in range(3))
        out = dict(acc)
        for a in range(3):
            for b in range(3):
                out[f"S{a}{b}"] = acc[f"S{a}{b}"] + jnp.sum(
                    dv[b] * dx[a] * mj_wi_dr, axis=-1)
        return out

    acc = _apply_offsets(grid, j_fields, acc0, accumulate, use_scan)
    S = {k: _flat_view(grid, vv) for k, vv in acc.items()}

    h_flat = jnp.where(s["mask"] > 0, s["h"], 1.0)
    # physical shear: h^-(d+1) / rho_com * a^-2 (chemistry.h:243)
    fac = (1.0 / h_flat) ** 4 / jnp.maximum(s["rho"], 1e-30) \
        * cosmo.a_inv2
    H = jnp.float32(getattr(cosmo, "H", 0.0))
    trace_3 = ((S["S00"] + S["S11"] + S["S22"]) * fac + 3.0 * H) / 3.0
    norm2 = jnp.zeros_like(trace_3)
    for a in range(3):
        for b in range(3):
            st = 0.5 * (S[f"S{a}{b}"] + S[f"S{b}{a}"]) * fac
            if a == b:
                st = st + H - trace_3
            norm2 = norm2 + st * st
    h_phys = cosmo.a * h_flat
    return (jnp.float32(C_diff) * jnp.sqrt(norm2) * h_phys * h_phys
            * s["mask"])


def chemistry_diffusion_loop(grid: CellGrid, s: Dict, p: SPHENIXParams,
                             cosmo, use_scan: bool = False):
    """Turbulent metal exchange between neighbours
    (chemistry/GEAR_DIFFUSION/chemistry_iact.h runner_iact_diffusion):

        d(frac_i)/dt = Σ_j [2 (D_i + D_j)/(rho_i + rho_j)]
                       (m_j/m_i) (dW_i/dr / r) (frac_i - frac_j)

    with physical densities and the per-particle Smagorinsky D from
    chemistry_shear_diff_loop (carried in s['diff_coef']).  The kernel
    gradient carries the full h_i^-(d+1) factor (the reference's iact
    omits it — dimensionally we keep it).  dW/dr < 0 inside the kernel,
    so metal-rich particles lose and poor ones gain; the pairwise
    exchange conserves total metal mass up to h_i != h_j asymmetry
    (same as the reference's nonsym loops).

    Needs s: mask/off/m/h/rho/Z/elem_frac/diff_coef.  Returns
    (dZ_dt (C, K), dfrac_dt (C, K, 9)) in physical 1/time.
    """
    from ..subgrid.chemistry import N_ELEMENTS

    g = lambda name: _grid_view(grid, s[name])
    mask, off, m = g("mask"), g("off"), g("m")
    h = _sanitize(mask, g("h"))
    hinv_i = _bi(1.0 / h)
    rho_fac = jnp.float32(cosmo.a_inv2) / jnp.float32(cosmo.a)
    rho_phys = _grid_view(grid, s["rho"]) * rho_fac
    D = _grid_view(grid, s["diff_coef"])
    Z = g("Z")
    ef = g("elem_frac")
    gamma2 = jnp.float32(p.kernel.gamma2)

    keys = ("dZ",) + tuple(f"de{k}" for k in range(N_ELEMENTS))
    acc0 = {k: jnp.zeros(mask.shape, F32) for k in keys}
    j_fields = {"off": off, "m": m, "mask": mask, "rho": rho_phys,
                "D": D, "Z": Z, "ef": ef}

    def accumulate(acc, jf, shift):
        dx, r2 = _pair_geometry_shift(off, jf["off"], shift)
        u2 = r2 * hinv_i * hinv_i
        ok = ((_bj(jf["mask"]) > 0) & (r2 > 0) & (u2 < gamma2)
              & (_bi(D) > 0) & (_bj(jf["D"]) > 0))
        u = jnp.sqrt(jnp.maximum(u2, 1e-30))
        _, dw = p.kernel.deval(u)
        rinv = jax.lax.rsqrt(jnp.maximum(r2, 1e-30))
        wi_dr = dw * rinv * hinv_i ** 4      # h_i^-(d+1) dW/du / r
        coef = 2.0 * (_bi(D) + _bj(jf["D"])) \
            / jnp.maximum(_bi(rho_phys) + _bj(jf["rho"]), 1e-30)
        t = jnp.where(ok, coef * _bj(jf["m"]) * wi_dr, 0.0)
        out = dict(acc)
        out["dZ"] = acc["dZ"] + jnp.sum(t * (_bi(Z) - _bj(jf["Z"])),
                                        axis=-1)
        for k in range(N_ELEMENTS):
            out[f"de{k}"] = acc[f"de{k}"] + jnp.sum(
                t * (_bi(ef[..., k]) - _bj(jf["ef"][..., k])), axis=-1)
        return out

    acc = _apply_offsets(grid, j_fields, acc0, accumulate, use_scan)
    flat = {k: _flat_view(grid, v) * s["mask"] for k, v in acc.items()}
    dZ = flat["dZ"]
    dfrac = jnp.stack([flat[f"de{k}"] for k in range(N_ELEMENTS)],
                      axis=-1)
    return dZ, dfrac
