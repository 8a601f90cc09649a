"""Gather-based Verlet neighbour-list engine (the fast TPU pair path).

The reference cuts its candidate-pair count with per-axis particle sorts and
pseudo-Verlet sweeps (src/sort_part.h:42, runner_doiact_functions_hydro.h:
1068 DOPAIR1): only particles whose sorted positions overlap along the pair
axis are tested.  The TPU-native equivalent built here is a **per-particle
candidate list**: at every rebuild (the counting-sort rebucket) each slot
stores the indices of the <= NGB candidates within an inflated interaction
radius  r_build = gamma*max(h_cap_i, h_cap_j) + skin,  where ``h_cap`` is a
slack-inflated smoothing length and ``skin`` a drift budget.  Between
rebuilds each pair pass is then a handful of HBM **gathers** of (C*K, NGB)
j-values — ~12x fewer candidates than the dense 27-stencil tile
(ops/stencil.py) — followed by the exact same masked term-function math.

Validity (the Verlet-list contract, mirroring SWIFT's rebuild triggers,
engine.c:2392-2448):
  * every particle's displacement since build is accumulated; the engine
    rebuilds once  2*max_disp >= skin  could make the list incomplete;
  * the ghost's h iteration is clamped at ``h_cap`` (the per-particle list
    budget); a particle pinned at its cap forces a rebuild next step, which
    raises the cap by the slack factor (geometric ratchet);
  * build-time candidate counts above NGB are reported to the host, which
    refuses the step (silent neighbour loss is never allowed).

All physics is delegated to the scheme term functions (p.mod), so this
backend, ops/stencil.py and the brute-force oracle share formulas.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..grid.cellgrid import CellGrid
from ..models.sph.sphenix import CosmoFactors, SPHENIXParams
from .stencil import NBIN_SENTINEL, STENCIL_27, _sanitize

F32 = jnp.float32
I32 = jnp.int32


# ---------------------------------------------------------------------------
# Static per-grid tables (host-built, jit constants)
# ---------------------------------------------------------------------------

def _nbr_cell_table(grid: CellGrid) -> np.ndarray:
    """(C, 27) i32: linear cell id of cell c shifted by each stencil offset."""
    cd = np.asarray(grid.cdim)
    ids = np.arange(grid.C)
    ix = ids // (cd[1] * cd[2])
    iy = (ids // cd[2]) % cd[1]
    iz = ids % cd[2]
    coords = np.stack([ix, iy, iz], -1)
    out = np.empty((grid.C, 27), np.int32)
    for o, d in enumerate(STENCIL_27):
        cc = np.mod(coords + np.asarray(d), cd)
        out[:, o] = (cc[:, 0] * cd[1] + cc[:, 1]) * cd[2] + cc[:, 2]
    return out


def _shift_table(grid: CellGrid) -> np.ndarray:
    """(27, 3) f32: the periodic position shift of each stencil offset."""
    e = grid.edge_arr
    return np.asarray([[d[0] * e[0], d[1] * e[1], d[2] * e[2]]
                       for d in STENCIL_27], np.float32)


def _build_chunk(C: int, K: int, budget_bytes: float = 1.6e8) -> int:
    """Largest divisor of C whose (B, K, 27K) f32 tile fits the budget."""
    limit = max(1, int(budget_bytes / (K * 27 * K * 4)))
    b = min(C, limit)
    while C % b:
        b -= 1
    return b


# ---------------------------------------------------------------------------
# List build (runs only at rebuild)
# ---------------------------------------------------------------------------

def build_nbr_list(grid: CellGrid, off: jnp.ndarray, mask: jnp.ndarray,
                   h_cap: jnp.ndarray, p: SPHENIXParams, ngb_cap: int,
                   skin):
    """Select <= ngb_cap candidates per slot from the 27-cell neighbourhood.

    Candidates are ranked by kernel-normalised distance
    r2 / max(h_cap_i, h_cap_j)^2, so *true* pairs (ratio < gamma^2) always
    outrank skin-only candidates: an overflow drops skin candidates first
    and is harmless as long as max_true <= ngb_cap (the engine then just
    rebuilds every step instead of using the drift budget).

    Returns (nbr_idx (C,K,NGB) i32 flat slot indices,
             nbr_code (C,K,NGB) i8 stencil-offset of each candidate,
             max_cand () i32  worst-case skin-inflated candidate count,
             max_true () i32  worst-case true-pair count — physics is lost
                              iff this exceeds ngb_cap).
    """
    C, K = mask.shape
    B = _build_chunk(C, K)
    gamma = jnp.float32(p.kernel.gamma)
    skin = jnp.asarray(skin, F32)

    nbr_cells = jnp.asarray(_nbr_cell_table(grid))          # (C, 27)
    shifts = jnp.asarray(_shift_table(grid))                # (27, 3)
    shifts_k = jnp.repeat(shifts, K, axis=0)                # (27K, 3)
    off_flat = off.reshape(C * K, 3)
    mask_flat = mask.reshape(C * K)
    hcap_flat = jnp.where(mask_flat > 0, h_cap.reshape(C * K), 0.0)

    offv = off.reshape(C, K, 3)
    hcapv = h_cap.reshape(C, K)

    def chunk(ci):
        cells = ci * B + jnp.arange(B, dtype=I32)           # (B,)
        cand = (nbr_cells[cells][:, :, None] * K
                + jnp.arange(K, dtype=I32)).reshape(B, 27 * K)
        off_j = jnp.take(off_flat, cand, axis=0)            # (B, 27K, 3)
        hcap_j = jnp.take(hcap_flat, cand, axis=0)          # (B, 27K)
        mask_j = jnp.take(mask_flat, cand, axis=0)
        pos_j = off_j + shifts_k[None]                      # (B, 27K, 3)

        off_i = offv[cells]                                 # (B, K, 3)
        hcap_i = hcapv[cells]                               # (B, K)
        self_idx = cells[:, None] * K + jnp.arange(K, dtype=I32)

        dx = off_i[:, :, None, :] - pos_j[:, None, :, :]    # (B, K, 27K, 3)
        r2 = jnp.sum(dx * dx, axis=-1)
        hmax = jnp.maximum(hcap_i[:, :, None], hcap_j[:, None, :])
        rcut = gamma * hmax + skin
        valid = ((mask_j[:, None, :] > 0)
                 & (cand[:, None, :] != self_idx[:, :, None]))
        ok = valid & (r2 < rcut * rcut)
        n_cand = jnp.sum(ok, axis=-1)                       # (B, K)
        n_true = jnp.sum(valid & (r2 < (gamma * hmax) ** 2), axis=-1)
        key = jnp.where(ok, r2 / jnp.maximum(hmax * hmax, 1e-30), jnp.inf)
        _, sel = jax.lax.top_k(-key, ngb_cap)               # (B, K, NGB)
        idx = jnp.take_along_axis(
            jnp.broadcast_to(cand[:, None, :], (B, K, 27 * K)), sel, axis=-1)
        code = (sel // K).astype(jnp.int8)
        return idx, code, jnp.max(n_cand), jnp.max(n_true)

    idx, code, maxc, maxt = jax.lax.map(chunk,
                                        jnp.arange(C // B, dtype=I32))
    return (idx.reshape(C, K, ngb_cap), code.reshape(C, K, ngb_cap),
            jnp.max(maxc).astype(I32), jnp.max(maxt).astype(I32))


# ---------------------------------------------------------------------------
# Pass-time helpers.
#
# Every pass is chunked over blocks of cells with lax.map: the j-side
# gathers index the *full* flat particle arrays, but only (B, K, NGB)
# pair tiles are ever live — XLA's peak HBM stays bounded no matter how
# large the problem (the analog of the reference walking cell pairs one
# task at a time instead of materialising all interactions).
# ---------------------------------------------------------------------------

def _pass_chunk(C: int, K: int, ngb: int,
                budget_elems: float = 4.0e6) -> int:
    """Largest divisor of C with B*K*NGB pair slots under the budget."""
    limit = max(1, int(budget_elems / (K * ngb)))
    b = min(C, limit)
    while C % b:
        b -= 1
    return b


def _map_cells(grid: CellGrid, s: Dict, fn):
    """Run ``fn(cells, take, shift)`` over cell chunks and stitch outputs.

    ``take(x)`` gathers j-side values for the chunk: (C,K[,3]) -> (B,K,NGB[,3]).
    ``shift``: (B,K,NGB,3) periodic position shift of each candidate.
    ``fn`` returns a pytree of (B, K, ...) arrays.
    """
    idx, code = s["nbr_idx"], s["nbr_code"]
    C, K, NGB = idx.shape
    M = C * K
    B = _pass_chunk(C, K, NGB)
    shifts = jnp.asarray(_shift_table(grid))

    def chunk(ci):
        cells = ci * B + jnp.arange(B, dtype=I32)
        idx_c = idx[cells]
        shift = shifts[code[cells].astype(I32)]

        def take(x):
            return jnp.take(x.reshape((M,) + x.shape[2:]), idx_c, axis=0)

        return fn(cells, take, shift)

    out = jax.lax.map(chunk, jnp.arange(C // B, dtype=I32))
    return jax.tree_util.tree_map(
        lambda x: x.reshape((C,) + x.shape[2:]), out)


def _geometry(off, cells, take, shift):
    """dx components and r2 for every (i, candidate) pair in the chunk."""
    off_i = off[cells]                                      # (B,K,3)
    off_j = take(off) + shift                               # (B,K,NGB,3)
    dx = tuple(off_i[..., None, k] - off_j[..., k] for k in range(3))
    r2 = dx[0] * dx[0] + dx[1] * dx[1] + dx[2] * dx[2]
    return dx, r2


# ---------------------------------------------------------------------------
# Hydro loops (same contracts as ops/stencil.py)
# ---------------------------------------------------------------------------

def density_loop(grid: CellGrid, s: Dict, p: SPHENIXParams,
                 use_scan: bool = False) -> Dict[str, jnp.ndarray]:
    """SPH density sums over the candidate lists (stencil.density_loop)."""
    mask, off, v = s["mask"], s["off"], s["v"]
    h = _sanitize(mask, s["h"])
    hinv = 1.0 / h
    gamma2 = jnp.float32(p.kernel.gamma2)

    extra_keys = tuple(getattr(p.mod, "DENSITY_EXTRA_KEYS", ()))
    needs_u = getattr(p.mod, "DENSITY_NEEDS_U", False)

    def fn(cells, take, shift):
        dx, r2 = _geometry(off, cells, take, shift)
        range2 = gamma2 * (h[cells] ** 2)[..., None]
        pair_ok = (take(mask) > 0) & (r2 > 0) & (r2 < range2)
        w = pair_ok.astype(F32)
        v_i = v[cells]
        v_j = take(v)
        dv = tuple(v_i[..., None, k] - v_j[..., k] for k in range(3))
        uj = (take(s["u"]),) if needs_u else ()
        terms = p.mod.density_terms(p, dx, r2, hinv[cells][..., None],
                                    take(s["m"]), dv, *uj)
        return {k: jnp.sum(t * w, axis=-1) for k, t in terms.items()}

    out = _map_cells(grid, s, fn)
    out = {k: v * mask for k, v in out.items()}
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


def gradient_loop(grid: CellGrid, s: Dict, p: SPHENIXParams,
                  cosmo: CosmoFactors, use_scan: bool = False
                  ) -> Dict[str, jnp.ndarray]:
    """Gradient loop (v_sig/alpha max + per-scheme GRADIENT_SUM_KEYS sums;
    GRADIENT_J_EXTRA state keys feed extra (i, j) args — see stencil)."""
    mask, off, v = s["mask"], s["off"], s["v"]
    h = _sanitize(mask, s["h"])
    hinv = 1.0 / h
    rhoinv = 1.0 / jnp.maximum(_sanitize(mask, s["rho"]), 1e-30)
    u, cs, av = s["u"], s["soundspeed"], s["alpha_visc"]
    gamma2 = jnp.float32(p.kernel.gamma2)
    sum_keys = tuple(getattr(p.mod, "GRADIENT_SUM_KEYS", ("laplace_u",)))
    j_extra = tuple(getattr(p.mod, "GRADIENT_J_EXTRA", ()))

    def fn(cells, take, shift):
        dx, r2 = _geometry(off, cells, take, shift)
        range2 = gamma2 * (h[cells] ** 2)[..., None]
        pair_ok = (take(mask) > 0) & (r2 > 0) & (r2 < range2)
        w = pair_ok.astype(F32)
        v_i = v[cells]
        v_j = take(v)
        dv = tuple(v_i[..., None, k] - v_j[..., k] for k in range(3))
        extra = []
        for k in j_extra:
            extra += [s[k][cells][..., None], take(s[k])]
        t = p.mod.gradient_terms(
            p, dx, r2, hinv[cells][..., None], take(s["m"]), dv,
            u[cells][..., None], take(u), take(rhoinv),
            cs[cells][..., None], take(cs), take(av), *extra,
            cosmo=cosmo)
        sums = tuple(jnp.sum(t["sum"][k] * w, axis=-1) for k in sum_keys)
        v_sig = jnp.maximum(s["v_sig"][cells], jnp.max(
            jnp.where(pair_ok, t["max"]["v_sig"], -jnp.inf), axis=-1))
        a_max = jnp.maximum(s["alpha_visc_max_ngb"][cells], jnp.max(
            jnp.where(pair_ok, t["max"]["alpha_visc_max_ngb"], -jnp.inf),
            axis=-1))
        return sums + (v_sig, a_max)

    res = _map_cells(grid, s, fn)
    out = {k: a * mask for k, a in zip(sum_keys, res[:len(sum_keys)])}
    out["v_sig"] = res[-2]
    out["alpha_visc_max_ngb"] = res[-1]
    return out


def force_loop(grid: CellGrid, s: Dict, p: SPHENIXParams,
               cosmo: CosmoFactors, use_scan: bool = False
               ) -> Dict[str, jnp.ndarray]:
    """SPHENIX force loop with symmetric r < gamma*max(h_i, h_j) range.

    Also reduces min_ngb_time_bin over neighbours (the reference folds
    runner_iact_timebin into the force loop — timestep_limiter_iact.h:40).
    """
    mask, off, v = s["mask"], s["off"], s["v"]
    h = _sanitize(mask, s["h"])
    m = _sanitize(mask, s["m"])
    rho = jnp.maximum(_sanitize(mask, s["rho"]), 1e-30)
    P = _sanitize(mask, s["pressure"])
    cs = _sanitize(mask, s["soundspeed"], fill=0.0)
    f_gh = _sanitize(mask, s["f_gradh"], fill=0.0)
    bal = _sanitize(mask, s["balsara"], fill=0.0)
    al = _sanitize(mask, s["alpha_visc"], fill=0.0)
    ad = _sanitize(mask, s["alpha_diff"], fill=0.0)
    u = _sanitize(mask, s["u"], fill=0.0)
    hinv = 1.0 / h
    minv = 1.0 / m
    rhoinv = 1.0 / rho
    pr2 = P * rhoinv * rhoinv
    gamma2 = jnp.float32(p.kernel.gamma2)
    big_bin = jnp.float32(1e9)
    tb = (s["time_bin"].astype(F32) if "time_bin" in s
          else jnp.zeros_like(mask))

    def fn(cells, take, shift):
        bi = lambda x: x[cells][..., None]
        dx, r2 = _geometry(off, cells, take, shift)
        h_j = take(h)
        range2 = gamma2 * jnp.maximum(bi(h), h_j) ** 2
        pair_ok = (take(mask) > 0) & (r2 > 0) & (r2 < range2)
        w = pair_ok.astype(F32)
        tb_j = take(tb)
        min_tb = jnp.min(jnp.where(pair_ok & (tb_j > 0), tb_j, big_bin),
                         axis=-1)
        v_i = v[cells]
        v_j = take(v)
        dv = tuple(v_i[..., None, k] - v_j[..., k] for k in range(3))
        t = p.mod.force_terms(
            p, dx, r2, bi(hinv), take(hinv), bi(m), take(m),
            bi(minv), take(minv), dv,
            bi(rho), take(rho), bi(rhoinv), take(rhoinv),
            bi(pr2), take(pr2),
            bi(P), take(P), bi(cs), take(cs),
            bi(f_gh), take(f_gh), bi(bal), take(bal),
            bi(al), take(al), bi(ad), take(ad),
            bi(u), take(u), cosmo)
        sums = {k: jnp.sum(x * w, axis=-1) for k, x in t["sum"].items()}
        v_sig = jnp.maximum(s["v_sig"][cells], jnp.max(
            jnp.where(pair_ok, t["max"]["v_sig"], -jnp.inf), axis=-1))
        return sums, v_sig, min_tb

    sums, v_sig, min_tb = _map_cells(grid, s, fn)
    sums = {k: x * mask for k, x in sums.items()}
    return {
        "a_hydro": jnp.stack([sums["a_hydro0"], sums["a_hydro1"],
                              sums["a_hydro2"]], axis=-1),
        "u_dt": sums["u_dt"],
        "h_dt": sums["h_dt"],
        "v_sig": v_sig,
        "min_ngb_time_bin": jnp.minimum(
            min_tb, jnp.float32(NBIN_SENTINEL)).astype(I32),
    }


def timebin_loop(grid: CellGrid, s: Dict, p: SPHENIXParams,
                 use_scan: bool = False) -> jnp.ndarray:
    """Min time bin over active neighbours (stencil.timebin_loop)."""
    mask, off = s["mask"], s["off"]
    h = _sanitize(mask, s["h"])
    tb = s["time_bin"].astype(F32)
    act = s["active"]
    gamma2 = jnp.float32(p.kernel.gamma2)
    big_bin = jnp.float32(1e9)

    def fn(cells, take, shift):
        dx, r2 = _geometry(off, cells, take, shift)
        h_j = take(h)
        ok = ((take(mask) > 0) & (take(act) > 0) & (r2 > 0)
              & (r2 < gamma2 * h_j * h_j) & (take(tb) > 0))
        return jnp.min(jnp.where(ok, take(tb), big_bin), axis=-1)

    acc = _map_cells(grid, s, fn)
    return jnp.minimum(acc, jnp.float32(NBIN_SENTINEL)).astype(I32)
