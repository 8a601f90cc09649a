"""SPHENIX hydro loops on the Pallas pair engine (single-chip fast path).

Same contracts as ops/stencil.py density/gradient/force_loop — the engine
picks a backend.  The physics callbacks reuse models/sph/sphenix.py term
functions verbatim, so XLA path, Pallas path and brute force can never
drift apart.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from ..grid.cellgrid import CellGrid
from ..models.sph import sphenix
from ..models.sph.sphenix import CosmoFactors, SPHENIXParams
from . import pallas_flat
from . import pallas_packed
from . import pallas_pairs
from . import stencil

# selectable pair engines sharing one callback protocol; 'packed' is the
# fast single-chip path (see pallas_packed.py), 'ring' the original
# ring-buffer DMA kernel kept for comparison/fallback
ENGINES = {"packed": pallas_packed.pair_apply,
           "ring": pallas_pairs.pair_apply,
           "flat": pallas_flat.pair_apply}


def _cosmo_scalars(cosmo: CosmoFactors):
    return tuple(cosmo)


def _cosmo_from(sc):
    return CosmoFactors(*sc[:7])


def _cosmo_binding(cosmo: CosmoFactors):
    """(scalars, resolver): python-float factors (the engine's
    non-cosmological literal) are closed over so the kernels fold them at
    trace time; traced factors ship through SMEM as before."""
    if all(isinstance(x, (int, float)) for x in tuple(cosmo)):
        return (), (lambda sc: cosmo)
    return _cosmo_scalars(cosmo), _cosmo_from

F32 = jnp.float32


def _vec(fields: Dict, s: Dict, name: str):
    for k in range(3):
        fields[f"{name}{k}"] = s[name][..., k]


def _common_fields(s: Dict) -> Dict[str, jnp.ndarray]:
    f = {"mask": s["mask"]}
    _vec(f, s, "off")
    return f


def _san(s, key, fill=1.0):
    return jnp.where(s["mask"] > 0, s[key], jnp.float32(fill))


def density_loop(grid: CellGrid, s: Dict, p: SPHENIXParams,
                 interpret: bool = False, engine: str = "packed",
                 active_i: jnp.ndarray = None) -> Dict[str, jnp.ndarray]:
    fields = _common_fields(s)
    _vec(fields, s, "v")
    fields["h"] = _san(s, "h")
    fields["hinv"] = 1.0 / fields["h"]
    fields["m"] = s["m"]
    extra_keys = tuple(getattr(p.mod, "DENSITY_EXTRA_KEYS", ()))
    needs_u = getattr(p.mod, "DENSITY_NEEDS_U", False)
    if needs_u:
        fields["u"] = _san(s, "u", 0.0)
    order = list(fields)
    gamma2 = float(p.kernel.gamma2)

    def pair_fn(sf, nf, dx, r2, sc):
        h_i = sf("h")
        ok = r2 < gamma2 * h_i * h_i
        dv = tuple(sf(f"v{k}") - nf(f"v{k}") for k in range(3))
        uj = (nf("u"),) if needs_u else ()
        t = p.mod.density_terms(p, dx, r2, sf("hinv"), nf("m"), dv, *uj)
        sums = [t["rho"], t["rho_dh"], t["wcount"], t["wcount_dh"],
                t["div_v"], t["rot_v0"], t["rot_v1"], t["rot_v2"]]
        sums += [t[k] for k in extra_keys]
        return ok, sums, []

    # tile-level unconverged-subset masking: only the flat engine's
    # range words support skipping (other engines ignore the hint and
    # recompute everything — still exact, the caller's merge is a no-op)
    mask_kw = ({"active_i": active_i}
               if active_i is not None and engine == "flat" else {})
    sums, _ = ENGINES[engine](
        grid, fields, order, pair_fn, n_sum=8 + len(extra_keys), n_max=0,
        shifts_scale=grid.edge, pad_fills={"h": 1.0},
        interpret=interpret, range_scale=float(p.kernel.gamma),
        **mask_kw)
    m = s["mask"]
    res = {
        "rho": sums[0] * m, "rho_dh": sums[1] * m, "wcount": sums[2] * m,
        "wcount_dh": sums[3] * m, "div_v": sums[4] * m,
        "rot_v": jnp.stack([sums[5] * m, sums[6] * m, sums[7] * m], -1),
    }
    for i, k in enumerate(extra_keys):
        res[k] = sums[8 + i] * m
    return res


def gradient_loop(grid: CellGrid, s: Dict, p: SPHENIXParams,
                  cosmo: CosmoFactors, interpret: bool = False,
                  engine: str = "packed",
                  active_i: jnp.ndarray = None) -> Dict[str, jnp.ndarray]:
    fields = _common_fields(s)
    _vec(fields, s, "v")
    fields["h"] = _san(s, "h")
    fields["hinv"] = 1.0 / fields["h"]
    fields["m"] = s["m"]
    fields["u"] = s["u"]
    fields["rhoinv"] = 1.0 / jnp.maximum(_san(s, "rho"), 1e-30)
    fields["cs"] = _san(s, "soundspeed", 0.0)
    fields["av"] = _san(s, "alpha_visc", 0.0)
    sum_keys = tuple(getattr(p.mod, "GRADIENT_SUM_KEYS", ("laplace_u",)))
    j_extra = tuple(getattr(p.mod, "GRADIENT_J_EXTRA", ()))
    for k in j_extra:
        fields[k] = _san(s, k, 0.0)
    order = list(fields)
    gamma2 = float(p.kernel.gamma2)
    scal, getcf = _cosmo_binding(cosmo)

    def pair_fn(sf, nf, dx, r2, sc):
        h_i = sf("h")
        ok = r2 < gamma2 * h_i * h_i
        dv = tuple(sf(f"v{k}") - nf(f"v{k}") for k in range(3))
        extra = []
        for k in j_extra:
            extra += [sf(k), nf(k)]
        t = p.mod.gradient_terms(
            p, dx, r2, sf("hinv"), nf("m"), dv, sf("u"), nf("u"),
            nf("rhoinv"), sf("cs"), nf("cs"), nf("av"), *extra,
            cosmo=getcf(sc))
        return ok, [t["sum"][k] for k in sum_keys], \
            [t["max"]["v_sig"], t["max"]["alpha_visc_max_ngb"]]

    mask_kw = ({"active_i": active_i}
               if active_i is not None and engine == "flat" else {})
    sums, maxes = ENGINES[engine](
        grid, fields, order, pair_fn, n_sum=len(sum_keys), n_max=2,
        shifts_scale=grid.edge, scalars=scal,
        pad_fills={"h": 1.0, "rho": 1.0}, interpret=interpret,
        range_scale=float(p.kernel.gamma), **mask_kw)
    m = s["mask"]
    out = {k: sums[i] * m for i, k in enumerate(sum_keys)}
    out["v_sig"] = jnp.maximum(s["v_sig"], maxes[0])
    out["alpha_visc_max_ngb"] = jnp.maximum(s["alpha_visc_max_ngb"],
                                            maxes[1])
    return out


def force_loop(grid: CellGrid, s: Dict, p: SPHENIXParams,
               cosmo: CosmoFactors, interpret: bool = False,
               engine: str = "packed",
               active_i: jnp.ndarray = None) -> Dict[str, jnp.ndarray]:
    fields = _common_fields(s)
    _vec(fields, s, "v")
    fields["h"] = _san(s, "h")
    fields["m"] = _san(s, "m")
    fields["u"] = _san(s, "u", 0.0)
    fields["rho"] = jnp.maximum(_san(s, "rho"), 1e-30)
    fields["P"] = _san(s, "pressure")
    fields["cs"] = _san(s, "soundspeed", 0.0)
    fields["fgh"] = _san(s, "f_gradh", 0.0)
    fields["bal"] = _san(s, "balsara", 0.0)
    fields["al"] = _san(s, "alpha_visc", 0.0)
    fields["ad"] = _san(s, "alpha_diff", 0.0)
    fields["tb"] = s["time_bin"].astype(F32)
    fields["hinv"] = 1.0 / fields["h"]
    fields["minv"] = 1.0 / fields["m"]
    fields["rhoinv"] = 1.0 / fields["rho"]
    fields["pr2"] = fields["P"] * fields["rhoinv"] * fields["rhoinv"]
    order = list(fields)
    gamma2 = float(p.kernel.gamma2)
    big_bin = float(stencil.NBIN_SENTINEL)
    scal, getcf = _cosmo_binding(cosmo)

    def pair_fn(sf, nf, dx, r2, sc):
        h_i, h_j = sf("h"), nf("h")
        ok = r2 < gamma2 * jnp.maximum(h_i, h_j) ** 2
        dv = tuple(sf(f"v{k}") - nf(f"v{k}") for k in range(3))
        t = p.mod.force_terms(
            p, dx, r2, sf("hinv"), nf("hinv"), sf("m"), nf("m"),
            sf("minv"), nf("minv"), dv,
            sf("rho"), nf("rho"), sf("rhoinv"), nf("rhoinv"),
            sf("pr2"), nf("pr2"),
            sf("P"), nf("P"), sf("cs"), nf("cs"),
            sf("fgh"), nf("fgh"), sf("bal"), nf("bal"),
            sf("al"), nf("al"), sf("ad"), nf("ad"), sf("u"), nf("u"),
            getcf(sc))
        sums = [t["sum"]["a_hydro0"], t["sum"]["a_hydro1"],
                t["sum"]["a_hydro2"], t["sum"]["u_dt"], t["sum"]["h_dt"]]
        # min neighbour bin as a max of the negated bin (pair_apply only
        # reduces maxes); empty bins excluded (timestep_limiter_iact.h:40)
        neg_tb = jnp.where(nf("tb") > 0, -nf("tb"), -jnp.float32(big_bin))
        return ok, sums, [t["max"]["v_sig"], neg_tb]

    mask_kw = ({"active_i": active_i}
               if active_i is not None and engine == "flat" else {})
    sums, maxes = ENGINES[engine](
        grid, fields, order, pair_fn, n_sum=5, n_max=2,
        shifts_scale=grid.edge, scalars=scal,
        pad_fills={"h": 1.0, "m": 1.0, "rho": 1.0, "P": 1.0},
        interpret=interpret, range_scale=float(p.kernel.gamma),
        sym_range=True, **mask_kw)
    m = s["mask"]
    min_tb = jnp.minimum(-maxes[1], jnp.float32(big_bin))
    return {
        "a_hydro": jnp.stack([sums[0] * m, sums[1] * m, sums[2] * m], -1),
        "u_dt": sums[3] * m,
        "h_dt": sums[4] * m,
        "v_sig": jnp.maximum(s["v_sig"], maxes[0]),
        "min_ngb_time_bin": min_tb.astype(jnp.int32),
    }


def force_gravity_loop(grid: CellGrid, s: Dict, p: SPHENIXParams,
                       cosmo: CosmoFactors, G: float, H_soft: float,
                       r_s: float, r_cut: float,
                       periodic_truncation: bool = True,
                       interpret: bool = False,
                       active_i: jnp.ndarray = None) -> Dict:
    """Fused hydro force + short-range P2P self-gravity in ONE flat pass.

    The force loop and the P2P gravity loop walk the same column layout
    with near-identical reaches (gamma*h vs r_cut — the column width is
    sized by their max), so running them as one traversal halves the
    candidate-pair walks, j-window loads and accumulator collapses.  The
    reference keeps these as separate task types (runner_doiact_grav.c vs
    runner_doiact_functions_hydro.h) because its pair lists differ; here
    the window machinery is shared, so fusion is free parallelism.

    Per-output masking: hydro sums are pre-multiplied by the hydro
    acceptance (r2 < gamma^2 max(h_i,h_j)^2), gravity sums by r2 < r_cut^2,
    and the kernel-level mask is their union.  Max outputs (v_sig, the
    limiter's neighbour bin) are pre-masked to their identity outside the
    hydro range.  Results match force_loop + p2p_gravity_loop exactly.

    Returns the force_loop dict plus "a_grav" (C,W,3) and "pot" (C,W).
    """
    from . import p2p_gravity as pg

    fields = _common_fields(s)
    _vec(fields, s, "v")
    fields["h"] = _san(s, "h")
    fields["m"] = _san(s, "m")
    fields["u"] = _san(s, "u", 0.0)
    fields["rho"] = jnp.maximum(_san(s, "rho"), 1e-30)
    fields["P"] = _san(s, "pressure")
    fields["cs"] = _san(s, "soundspeed", 0.0)
    fields["fgh"] = _san(s, "f_gradh", 0.0)
    fields["bal"] = _san(s, "balsara", 0.0)
    fields["al"] = _san(s, "alpha_visc", 0.0)
    fields["ad"] = _san(s, "alpha_diff", 0.0)
    fields["tb"] = s["time_bin"].astype(F32)
    fields["hinv"] = 1.0 / fields["h"]
    fields["minv"] = 1.0 / fields["m"]
    fields["rhoinv"] = 1.0 / fields["rho"]
    fields["pr2"] = fields["P"] * fields["rhoinv"] * fields["rhoinv"]
    # gravity mass: zero in empty slots so padded lanes contribute nothing
    # (the hydro "m" is pad-filled to 1 for division safety)
    fields["gm"] = s["m"] * s["mask"]
    order = list(fields)
    gamma2 = float(p.kernel.gamma2)
    big_bin = float(stencil.NBIN_SENTINEL)
    scal, getcf = _cosmo_binding(cosmo)
    # gravity literals (Mosaic folds python floats at trace time)
    r_cut2 = float(r_cut) ** 2
    r_s_inv = 1.0 / float(r_s) if r_s > 0 else 0.0
    H_inv = 1.0 / float(H_soft)
    Gf = float(G)
    trunc = periodic_truncation and r_s > 0

    def pair_fn(sf, nf, dx, r2, sc):
        h_i, h_j = sf("h"), nf("h")
        ok_h = r2 < gamma2 * jnp.maximum(h_i, h_j) ** 2
        dv = tuple(sf(f"v{k}") - nf(f"v{k}") for k in range(3))
        t = p.mod.force_terms(
            p, dx, r2, sf("hinv"), nf("hinv"), sf("m"), nf("m"),
            sf("minv"), nf("minv"), dv,
            sf("rho"), nf("rho"), sf("rhoinv"), nf("rhoinv"),
            sf("pr2"), nf("pr2"),
            sf("P"), nf("P"), sf("cs"), nf("cs"),
            sf("fgh"), nf("fgh"), sf("bal"), nf("bal"),
            sf("al"), nf("al"), sf("ad"), nf("ad"), sf("u"), nf("u"),
            getcf(sc))
        wh = ok_h.astype(F32)
        ok_g = r2 < r_cut2
        F, P = pg.force_pot_factors(r2, H_inv, r_s_inv, trunc)
        gm = (Gf * ok_g.astype(F32)) * nf("gm")
        gmF = gm * F
        sums = [t["sum"]["a_hydro0"] * wh, t["sum"]["a_hydro1"] * wh,
                t["sum"]["a_hydro2"] * wh, t["sum"]["u_dt"] * wh,
                t["sum"]["h_dt"] * wh,
                -gmF * dx[0], -gmF * dx[1], -gmF * dx[2], -gm * P]
        neg_tb = jnp.where(ok_h & (nf("tb") > 0), -nf("tb"),
                           -jnp.float32(big_bin))
        v_sig = jnp.where(ok_h, t["max"]["v_sig"], -jnp.inf)
        return ok_h | ok_g, sums, [v_sig, neg_tb]

    mask_kw = {"active_i": active_i} if active_i is not None else {}
    sums, maxes = pallas_flat.pair_apply(
        grid, fields, order, pair_fn, n_sum=9, n_max=2,
        shifts_scale=grid.edge, scalars=scal,
        pad_fills={"h": 1.0, "m": 1.0, "rho": 1.0, "P": 1.0},
        interpret=interpret, range_scale=float(p.kernel.gamma),
        sym_range=True, reach_floor=float(r_cut), **mask_kw)
    m = s["mask"]
    min_tb = jnp.minimum(-maxes[1], jnp.float32(big_bin))
    return {
        "a_hydro": jnp.stack([sums[0] * m, sums[1] * m, sums[2] * m], -1),
        "u_dt": sums[3] * m,
        "h_dt": sums[4] * m,
        "v_sig": jnp.maximum(s["v_sig"], maxes[0]),
        "min_ngb_time_bin": min_tb.astype(jnp.int32),
        "a_grav": jnp.stack([sums[5] * m, sums[6] * m, sums[7] * m], -1),
        "pot": sums[8] * m,
    }


def p2p_gravity_loop(grid: CellGrid, s_i: Dict, species_j,
                     G: float, H_soft: float, r_s: float, r_cut: float,
                     periodic_truncation: bool = True,
                     interpret: bool = False, H_soft_j=None):
    """Short-range P2P gravity on the flat column layout.

    The column analog of ops/p2p_gravity.p2p_accelerations (reference
    runner_dopair_grav_pp_truncated, runner_doiact_grav.c:584): the 9
    neighbour columns cover x/y out to the column edge (>= r_cut by grid
    construction) and the z-block bitmask machinery windows the j-side to
    |dz| <= r_cut.  Pairs beyond r_cut are dropped exactly like the
    reference drops pairs beyond r_cut_max (gravity_properties.c) — the
    PM mesh owns that range.

    s_i: receiving species tiles; species_j: list of source species tiles
    (same column grid, each with its own capacity).  Returns
    (acc (Ncol,W,3), pot (Ncol,W)).
    """
    from . import p2p_gravity as pg

    def grav_fields(s):
        f = {"mask": s["mask"]}
        _vec(f, s, "off")
        f["h"] = jnp.full_like(s["mask"], jnp.float32(r_cut))
        f["m"] = s["m"]
        return f

    def pad_lanes(f):
        """Pad tile capacity to the kernel's 128-lane i-tiles.  Species
        tiles carry their own K (stars/BH/sink slots + SF headroom are
        not lane-aligned); padded slots have mask 0 so they contribute
        nothing, and the i-side pad is trimmed from the sums below."""
        W = f["mask"].shape[1]
        pad = (-W) % pallas_flat.LANES
        if pad == 0:
            return f
        return {k: jnp.concatenate(
            [v, jnp.zeros((v.shape[0], pad) + v.shape[2:], v.dtype)],
            axis=1) for k, v in f.items()}

    W_i = s_i["mask"].shape[1]
    fi = pad_lanes(grav_fields(s_i))
    order = list(fi)
    # python-float literals: the Pallas kernel must not close over traced
    # scalars (Mosaic folds these at trace time)
    r_cut2 = float(r_cut) ** 2
    r_s_inv = 1.0 / float(r_s) if r_s > 0 else 0.0
    H_i = float(H_soft)
    # per-source-species softening: a pair softens with max(H_i, H_j),
    # the reference's multi-softening rule (gravity_iact.h)
    H_js = ([float(h) for h in H_soft_j] if H_soft_j is not None
            else [H_i] * len(species_j))
    Gf = float(G)
    trunc = periodic_truncation and r_s > 0

    def make_pair_fn(H_pair):
        H_inv = 1.0 / H_pair   # python-float literal per species pair

        def pair_fn(sf, nf, dx, r2, sc):
            ok = r2 < r_cut2
            F, P = pg.force_pot_factors(r2, H_inv, r_s_inv, trunc)
            gm = Gf * nf("m")
            gmF = gm * F
            return ok, [-gmF * dx[0], -gmF * dx[1], -gmF * dx[2],
                        -gm * P], []
        return pair_fn

    acc0 = acc1 = acc2 = pot = 0.0
    for s_j, H_j in zip(species_j, H_js):
        same = s_j is s_i
        kw = {} if same else dict(fields_j=pad_lanes(grav_fields(s_j)),
                                  field_order_j=order)
        sums, _ = pallas_flat.pair_apply(
            grid, fi, order, make_pair_fn(max(H_i, H_j)), n_sum=4,
            n_max=0, shifts_scale=grid.edge, interpret=interpret,
            range_scale=1.0, **kw)
        acc0 = acc0 + sums[0][:, :W_i]
        acc1 = acc1 + sums[1][:, :W_i]
        acc2 = acc2 + sums[2][:, :W_i]
        pot = pot + sums[3][:, :W_i]
    m = s_i["mask"]
    return (jnp.stack([acc0 * m, acc1 * m, acc2 * m], -1), pot * m)


def timebin_loop(grid: CellGrid, s: Dict, p: SPHENIXParams,
                 interpret: bool = False, engine: str = "flat"
                 ) -> jnp.ndarray:
    """Min time bin over active neighbours (stencil.timebin_loop) on a
    Pallas pair engine — used by the limiter wake scan for backends whose
    grid has no 27-stencil (the flat column layout)."""
    fields = _common_fields(s)
    fields["h"] = _san(s, "h")
    fields["tb"] = s["time_bin"].astype(F32)
    fields["act"] = s["active"]
    order = list(fields)
    gamma2 = float(p.kernel.gamma2)
    big_bin = float(stencil.NBIN_SENTINEL)

    def pair_fn(sf, nf, dx, r2, sc):
        h_j = nf("h")
        ok = (nf("act") > 0) & (r2 < gamma2 * h_j * h_j) & (nf("tb") > 0)
        neg_tb = jnp.where(nf("tb") > 0, -nf("tb"), -jnp.float32(big_bin))
        return ok, [], [neg_tb]

    _, maxes = ENGINES[engine](
        grid, fields, order, pair_fn, n_sum=0, n_max=1,
        shifts_scale=grid.edge, pad_fills={"h": 1.0},
        interpret=interpret, range_scale=float(p.kernel.gamma),
        sym_range=True)
    min_tb = jnp.minimum(-maxes[0], jnp.float32(big_bin))
    return min_tb.astype(jnp.int32)
