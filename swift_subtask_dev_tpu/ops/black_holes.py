"""Black-hole interaction loops (EAGLE AGN) over the 27-stencil.

Re-derivation of src/black_holes/EAGLE/black_holes_iact.h:

* ``bh_gas_density_loop`` — the bh_density task: kernel-smoothed gas
  density, neighbour mass, smoothed gas velocity and sound speed at each
  BH (feeds the Bondi rate).
* ``bh_swallow_target_loop`` — the swallow marking: each gas particle
  inside a BH kernel decides (deterministic pair hash, highest-priority
  BH wins) whether it is swallowed this step — the masked-scatter analog
  of part->black_holes_data.swallow_id (black_holes_iact.h:398).
* ``bh_swallow_collect_loop`` — the do_gas_swallow sweep: every BH sums
  the mass/momentum of gas particles that marked IT, mirroring
  runner_do_gas_swallow (runner_black_holes.c).

AGN heating reuses the stochastic kernel of stencil.feedback_apply_loop
(same Dalla Vecchia & Schaye machinery with the BH reservoir energy).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from ..grid.cellgrid import CellGrid
from .stencil import (_apply_offsets, _bi, _bj, _flat_view, _grid_view,
                      _pair_geometry_shift, _pair_hash_uniform, _sanitize)

F32 = jnp.float32
I32 = jnp.int32


def bh_gas_density_loop(grid: CellGrid, bh_s: Dict, gas_s: Dict, p,
                        use_scan: bool = False,
                        with_ang_mom: bool = False):
    """Per-BH gas sums (black_holes_iact.h runner_iact_nonsym_bh_gas_density).

    Returns dict of (C, K_bh): rho (Σ m W, un-normalised by h factors —
    the caller applies h^-3), ngb_mass (Σ m), mom{0,1,2} (Σ m W v_j),
    cs_w (Σ m W cs_j) and wcount (Σ W).  With ``with_ang_mom`` also
    L{0,1,2} = Σ m W (r_gas-r_bh) × (v_gas-v_bh) — the gas angular
    momentum around the BH feeding the SPIN_JET alignment criterion
    (SPIN_JET/black_holes_iact.h:125 spec_angular_momentum_gas).
    """
    gm = lambda n: _grid_view(grid, bh_s[n])
    bmask, boff = gm("mask"), gm("off")
    h = _sanitize(bmask, gm("h"))
    hinv_i = _bi(1.0 / h)
    vbh = _grid_view(grid, bh_s["v_full"]) if with_ang_mom else None

    gamma2 = jnp.float32(p.kernel.gamma2)
    keys = ("rho", "ngb_mass", "mom0", "mom1", "mom2", "cs_w", "wcount")
    if with_ang_mom:
        keys = keys + ("L0", "L1", "L2")
    acc0 = {k: jnp.zeros(bmask.shape, F32) for k in keys}
    j_fields = {"off": _grid_view(grid, gas_s["off"]),
                "m": _grid_view(grid, gas_s["m"]),
                "mask": _grid_view(grid, gas_s["mask"]),
                "v": _grid_view(grid, gas_s["v"]),
                "cs": _grid_view(grid, gas_s["soundspeed"])}

    def accumulate(acc, jf, shift):
        dx, r2 = _pair_geometry_shift(boff, jf["off"], shift)
        ui = (r2 * hinv_i ** 2) ** 0.5
        ok = (_bj(jf["mask"]) > 0) & (r2 * hinv_i ** 2 < gamma2)
        w_kern, _ = p.kernel.deval(ui)
        w = jnp.where(ok, 1.0, 0.0)
        mw = _bj(jf["m"]) * w_kern * w
        out = {
            "rho": acc["rho"] + jnp.sum(mw, axis=-1),
            "ngb_mass": acc["ngb_mass"]
            + jnp.sum(_bj(jf["m"]) * w, axis=-1),
            "mom0": acc["mom0"] + jnp.sum(mw * _bj(jf["v"][..., 0]),
                                          axis=-1),
            "mom1": acc["mom1"] + jnp.sum(mw * _bj(jf["v"][..., 1]),
                                          axis=-1),
            "mom2": acc["mom2"] + jnp.sum(mw * _bj(jf["v"][..., 2]),
                                          axis=-1),
            "cs_w": acc["cs_w"] + jnp.sum(mw * _bj(jf["cs"]), axis=-1),
            "wcount": acc["wcount"] + jnp.sum(w_kern * w, axis=-1),
        }
        if with_ang_mom:
            # r_rel = x_gas - x_bh = -dx; v_rel = v_gas - v_bh
            r = tuple(-dx[k] for k in range(3))
            vr = tuple(_bj(jf["v"][..., k]) - _bi(vbh[..., k])
                       for k in range(3))
            out["L0"] = acc["L0"] + jnp.sum(
                mw * (r[1] * vr[2] - r[2] * vr[1]), axis=-1)
            out["L1"] = acc["L1"] + jnp.sum(
                mw * (r[2] * vr[0] - r[0] * vr[2]), axis=-1)
            out["L2"] = acc["L2"] + jnp.sum(
                mw * (r[0] * vr[1] - r[1] * vr[0]), axis=-1)
        return out

    acc = _apply_offsets(grid, j_fields, acc0, accumulate, use_scan)
    return {k: _flat_view(grid, v) * bh_s["mask"] for k, v in acc.items()}


def bh_swallow_target_loop(grid: CellGrid, gas_s: Dict, bh_s: Dict, p,
                           ti_lo, ti_hi, use_scan: bool = False):
    """Each gas particle picks AT MOST ONE BH that swallows it this step.

    bh_s carries ``swallow_prob`` (per-BH per-neighbour probability this
    step, 0 when the BH has no mass deficit).  A gas particle inside
    several BH kernels resolves the tie by the LARGEST BH pid whose draw
    succeeded — the determinism contract of swallow_id marking
    (black_holes_iact.h:398-460; runner_black_holes.c lock ordering).

    Returns (swallow_bid (C,K_gas) i32: the winning BH pid, -1 if none).
    """
    gm = lambda n: _grid_view(grid, gas_s[n])
    gmask, goff = gm("mask"), gm("off")
    gpid = _grid_view(grid, gas_s["pid"])

    sv = lambda n: _grid_view(grid, bh_s[n])
    j_fields = {"off": sv("off"),
                "h": _sanitize(sv("mask"), sv("h")),
                "mask": sv("mask"),
                "pid": sv("pid"),
                "prob": sv("swallow_prob")}

    gamma2 = jnp.float32(p.kernel.gamma2)
    acc0 = jnp.full(gmask.shape, -1, I32)

    def accumulate(best, jf, shift):
        dx, r2 = _pair_geometry_shift(goff, jf["off"], shift)
        h_j = _bj(jf["h"])
        ok = ((_bi(gmask) > 0) & (_bj(jf["mask"]) > 0)
              & (r2 < gamma2 * h_j * h_j)
              & (_bj(jf["prob"]) > 0))
        draw = _pair_hash_uniform(
            _bi(gpid).astype(jnp.uint32),
            _bj(jf["pid"]).astype(jnp.uint32),
            ti_lo, ti_hi, 0x27d4eb2f)
        hit = ok & (draw < _bj(jf["prob"]))
        cand = jnp.where(hit, _bj(jf["pid"]), -1)
        return jnp.maximum(best, jnp.max(cand, axis=-1))

    best = _apply_offsets(grid, j_fields, acc0, accumulate, use_scan)
    return _flat_view(grid, best)


def bh_swallow_collect_loop(grid: CellGrid, bh_s: Dict, gas_s: Dict, p,
                            swallow_bid, use_scan: bool = False):
    """Per-BH sums over gas particles that marked it (runner_do_gas_swallow):
    returns dict of (C, K_bh): dm (swallowed mass), dp{0,1,2}
    (swallowed momentum)."""
    gm = lambda n: _grid_view(grid, bh_s[n])
    bmask = gm("mask")
    bpid = gm("pid")

    j_fields = {"m": _grid_view(grid, gas_s["m"]),
                "mask": _grid_view(grid, gas_s["mask"]),
                "v": _grid_view(grid, gas_s["v_full"]),
                "bid": _grid_view(grid, swallow_bid),
                "off": _grid_view(grid, gas_s["off"])}
    keys = ("dm", "dp0", "dp1", "dp2")
    acc0 = {k: jnp.zeros(bmask.shape, F32) for k in keys}

    def accumulate(acc, jf, shift):
        ok = ((_bj(jf["mask"]) > 0)
              & (_bj(jf["bid"]) == _bi(bpid)) & (_bi(bmask) > 0))
        w = ok.astype(F32)
        mj = _bj(jf["m"]) * w
        return {
            "dm": acc["dm"] + jnp.sum(mj, axis=-1),
            "dp0": acc["dp0"] + jnp.sum(mj * _bj(jf["v"][..., 0]),
                                        axis=-1),
            "dp1": acc["dp1"] + jnp.sum(mj * _bj(jf["v"][..., 1]),
                                        axis=-1),
            "dp2": acc["dp2"] + jnp.sum(mj * _bj(jf["v"][..., 2]),
                                        axis=-1),
        }

    acc = _apply_offsets(grid, j_fields, acc0, accumulate, use_scan)
    return {k: _flat_view(grid, v) * bh_s["mask"] for k, v in acc.items()}


def bh_reposition_loop(grid: CellGrid, bh_s: Dict, gas_s: Dict, p,
                       max_dist: float, v2_max_fac: float = 0.0,
                       v2_min_thresh: float = 0.0,
                       use_scan: bool = False):
    """Repositioning target: the gas neighbour at the minimum
    gravitational potential (black_holes_iact.h:290-375).

    Candidates must sit within ``max_dist`` (max_reposition_distance_
    ratio x softening) AND the BH kernel; with ``v2_max_fac`` > 0 the
    candidate's peculiar velocity relative to the BH must satisfy
    v^2 < max(v2_max_fac^2 cs_gas^2, v2_min_thresh^2) (the
    with_reposition_velocity_threshold gate).  ``bh_s`` needs mask/off/
    h/v_full and cs_gas (smoothed gas sound speed at the BH); ``gas_s``
    needs mask/off/v_full/pot.

    Returns (found (C,K_bh) bool, delta (C,K_bh,3)): the displacement to
    the best candidate.
    """
    gm = lambda n: _grid_view(grid, bh_s[n])
    bmask, boff = gm("mask"), gm("off")
    h = _sanitize(bmask, gm("h"))
    hinv_i = _bi(1.0 / h)
    vbh = _grid_view(grid, bh_s["v_full"])
    cs_i = _bi(_grid_view(grid, bh_s["cs_gas"]))
    gamma2 = jnp.float32(p.kernel.gamma2)
    md2 = jnp.float32(max_dist * max_dist)

    j_fields = {"off": _grid_view(grid, gas_s["off"]),
                "mask": _grid_view(grid, gas_s["mask"]),
                "v": _grid_view(grid, gas_s["v_full"]),
                "pot": _grid_view(grid, gas_s["pot"])}

    BIG = jnp.float32(3.4e38)
    acc0 = (jnp.full(bmask.shape, BIG, F32),
            tuple(jnp.zeros(bmask.shape, F32) for _ in range(3)))

    def accumulate(acc, jf, shift):
        best_pot, best_d = acc
        dx, r2 = _pair_geometry_shift(boff, jf["off"], shift)
        ok = ((_bi(bmask) > 0) & (_bj(jf["mask"]) > 0) & (r2 > 0)
              & (r2 < md2) & (r2 * hinv_i ** 2 < gamma2))
        if v2_max_fac > 0.0:
            v2 = sum((_bi(vbh[..., k]) - _bj(jf["v"][..., k])) ** 2
                     for k in range(3))
            v2_max = jnp.maximum(
                jnp.float32(v2_max_fac * v2_max_fac) * cs_i * cs_i,
                jnp.float32(v2_min_thresh * v2_min_thresh))
            ok = ok & (v2 < v2_max)
        pot = jnp.where(ok, _bj(jf["pot"]), BIG)
        idx = jnp.argmin(pot, axis=-1)[..., None]
        blk_pot = jnp.take_along_axis(pot, idx, axis=-1)[..., 0]
        blk_d = tuple(jnp.take_along_axis(
            jnp.broadcast_to(-dx[k], pot.shape), idx, axis=-1)[..., 0]
            for k in range(3))
        upd = blk_pot < best_pot
        return (jnp.where(upd, blk_pot, best_pot),
                tuple(jnp.where(upd, blk_d[k], best_d[k])
                      for k in range(3)))

    best_pot, best_d = _apply_offsets(grid, j_fields, acc0, accumulate,
                                      use_scan)
    found = _flat_view(grid, best_pot) < BIG
    delta = jnp.stack([_flat_view(grid, best_d[k]) for k in range(3)],
                      axis=-1)
    return found, jnp.where(found[..., None], delta, 0.0)


def bh_merger_mark_loop(grid: CellGrid, bh_s: Dict, p, max_dist: float,
                        G: float, threshold: str = "escape_velocity",
                        use_scan: bool = False) -> jnp.ndarray:
    """(C, K_bh) i32: pid of the BH that swallows each BH this step
    (-1 = none) — runner_iact_nonsym_bh_bh_swallow
    (EAGLE/black_holes_iact.h): the lighter (by subgrid mass, pid
    tie-break) merges onto the heavier when within
    min(max_merging_distance, kernel support of the bigger BH) and
    gravitationally bound per the chosen threshold:

    * ``escape_velocity``: v_pec^2 < 2 G M_heavy / r;
    * ``circular_velocity``: v_pec^2 < G M_heavy / (gamma h_heavy);
    * ``dynamical_escape_velocity``: v^2 < 2 G (m_i + m_j) / r.
    """
    sm = lambda n: _grid_view(grid, bh_s[n])
    smask, soff = sm("mask"), sm("off")
    spid, smsub = sm("pid"), sm("m_subgrid")
    smdyn = sm("m")
    h = _sanitize(smask, sm("h"))
    v = _grid_view(grid, bh_s["v_full"])
    gamma = jnp.float32(p.kernel.gamma)
    md2 = jnp.float32(max_dist * max_dist)
    Gf = jnp.float32(G)

    j_fields = {"off": soff, "mask": smask, "pid": spid, "ms": smsub,
                "m": smdyn, "h": h, "v": v}
    acc0 = (jnp.full(smask.shape, -jnp.inf, F32),
            jnp.full(smask.shape, -1, I32))

    def accumulate(acc, jf, shift):
        best_m, best_id = acc
        dx, r2 = _pair_geometry_shift(soff, jf["off"], shift)
        ms_i, ms_j = _bi(smsub), _bj(jf["ms"])
        id_i, id_j = _bi(spid), _bj(jf["pid"])
        heavier = (ms_j > ms_i) | ((ms_j == ms_i) & (id_j > id_i))
        M = jnp.maximum(ms_i, ms_j)
        h_big = jnp.where(ms_j > ms_i, _bj(jf["h"]), _bi(h))
        r = jnp.sqrt(jnp.maximum(r2, 1e-30))
        v2 = sum((_bi(v[..., k]) - _bj(jf["v"][..., k])) ** 2
                 for k in range(3))
        if threshold == "circular_velocity":
            v2_thr = Gf * M / (gamma * h_big)
        elif threshold == "dynamical_escape_velocity":
            v2_thr = 2.0 * Gf * (_bi(smdyn) + _bj(jf["m"])) / r
        else:  # escape_velocity
            v2_thr = 2.0 * Gf * M / r
        near = (r2 < md2) & (r2 < (gamma * h_big) ** 2)
        ok = ((_bi(smask) > 0) & (_bj(jf["mask"]) > 0) & (r2 > 0)
              & near & heavier & (v2 < v2_thr))
        cand_m = jnp.where(ok, ms_j, -jnp.inf)
        cand_id = jnp.where(ok, id_j, -1)
        pm = jnp.max(cand_m, axis=-1)
        pid_at = jnp.max(jnp.where(cand_m == pm[..., None], cand_id, -1),
                         axis=-1)
        upd = (pm > best_m) | ((pm == best_m) & (pid_at > best_id))
        return (jnp.where(upd, pm, best_m),
                jnp.where(upd, pid_at, best_id))

    _, best_id = _apply_offsets(grid, j_fields, acc0, accumulate,
                                use_scan)
    return _flat_view(grid, best_id)


def bh_merger_collect_loop(grid: CellGrid, bh_s: Dict, victim_bid,
                           not_victim, with_spin: bool = False,
                           use_scan: bool = False) -> Dict:
    """Per-BH sums over BHs that marked IT as their swallower
    (black_holes_swallow_bpart): dm (dynamical), dms (subgrid),
    dp{0,1,2}, n; with ``with_spin`` also the victims' mass-weighted
    spin vector dJ{0,1,2} = Σ m_sub a spin_dir (feeds the Barausse &
    Rezzolla remnant-spin update).  Chains defer like sink mergers.
    """
    sm = lambda n: _grid_view(grid, bh_s[n])
    smask, spid = sm("mask"), sm("pid")
    i_ok = _grid_view(grid, not_victim.astype(F32))

    j_fields = {"m": sm("m"), "ms": sm("m_subgrid"), "mask": smask,
                "v": _grid_view(grid, bh_s["v_full"]),
                "resv": _grid_view(grid, bh_s["energy_reservoir"]),
                "bid": _grid_view(grid, victim_bid),
                "off": sm("off")}
    keys = ["dm", "dms", "dp0", "dp1", "dp2", "dresv", "n"]
    if with_spin:
        j_fields["spin"] = _grid_view(grid, bh_s["spin"])
        j_fields["sd"] = _grid_view(grid, bh_s["spin_dir"])
        j_fields["jr"] = _grid_view(grid, bh_s["jet_reservoir"])
        keys += ["dJ0", "dJ1", "dJ2", "djet"]
    acc0 = {k: jnp.zeros(smask.shape, F32) for k in keys}

    def accumulate(acc, jf, shift):
        ok = ((_bj(jf["mask"]) > 0) & (_bi(i_ok) > 0)
              & (_bj(jf["bid"]) == _bi(spid)) & (_bi(smask) > 0))
        w = ok.astype(F32)
        mj = _bj(jf["m"]) * w
        out = {
            "dm": acc["dm"] + jnp.sum(mj, axis=-1),
            "dms": acc["dms"] + jnp.sum(_bj(jf["ms"]) * w, axis=-1),
            "dp0": acc["dp0"] + jnp.sum(mj * _bj(jf["v"][..., 0]), -1),
            "dp1": acc["dp1"] + jnp.sum(mj * _bj(jf["v"][..., 1]), -1),
            "dp2": acc["dp2"] + jnp.sum(mj * _bj(jf["v"][..., 2]), -1),
            "dresv": acc["dresv"] + jnp.sum(_bj(jf["resv"]) * w, -1),
            "n": acc["n"] + jnp.sum(w, axis=-1),
        }
        if with_spin:
            out["djet"] = acc["djet"] + jnp.sum(_bj(jf["jr"]) * w, -1)
        if with_spin:
            aw = _bj(jf["ms"]) * jnp.abs(_bj(jf["spin"])) * w
            for k in range(3):
                out[f"dJ{k}"] = acc[f"dJ{k}"] + jnp.sum(
                    aw * _bj(jf["sd"][..., k]) * jnp.sign(
                        _bj(jf["spin"])), axis=-1)
        return out

    acc = _apply_offsets(grid, j_fields, acc0, accumulate, use_scan)
    return {k: _flat_view(grid, v) * bh_s["mask"] for k, v in
            acc.items()}


def bh_merger_consumed_loop(grid: CellGrid, bh_s: Dict, victim_bid,
                            not_victim, use_scan: bool = False
                            ) -> jnp.ndarray:
    """(C, K_bh) bool: this victim's swallower is NOT itself a victim,
    so the merge completes this step (chain deferral, same dataflow as
    sink_merger_consumed_loop)."""
    sm = lambda n: _grid_view(grid, bh_s[n])
    smask = sm("mask")
    vic = _grid_view(grid, victim_bid)

    j_fields = {"mask": smask, "pid": sm("pid"),
                "ok": _grid_view(grid, not_victim.astype(F32)),
                "off": sm("off")}
    acc0 = jnp.zeros(smask.shape, bool)

    def accumulate(acc, jf, shift):
        hit = ((_bi(smask) > 0) & (_bj(jf["mask"]) > 0)
               & (_bi(vic) == _bj(jf["pid"])) & (_bj(jf["ok"]) > 0))
        return acc | jnp.any(hit, axis=-1)

    acc = _apply_offsets(grid, j_fields, acc0, accumulate, use_scan)
    return _flat_view(grid, acc)
