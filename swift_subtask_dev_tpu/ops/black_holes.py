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
