"""Sink-particle interaction loops (GEAR scheme) over the 27-stencil.

Re-derivation of src/sink/GEAR/sink_iact.h + src/runner_sinks.c:

* ``sink_formation_gate_loop`` — runner_iact_nonsym_sink
  (sink_iact.h:53): of any gas pair closer than the sink cut-off
  radius, the particle with the HIGHER gravitational potential may not
  form a sink — so at most the local potential minimum converts,
  preventing two sinks within one cut-off radius.
* ``sink_gas_swallow_mark_loop`` — runner_iact_nonsym_sinks_gas_swallow
  (sink_iact.h:135): every gas particle within a sink's r_cut is marked
  swallowed; competing sinks resolve by LARGEST sink pid
  (``swallow_id < si->id`` ordering).
* ``sink_gas_swallow_collect_loop`` — runner_do_gas_swallow: per-sink
  sums of swallowed mass, momentum and angular momentum about the sink
  (sink.h:241 sink_swallow_part).
* ``sink_merger_mark_loop`` / ``sink_merger_collect_loop`` —
  runner_iact_nonsym_sinks_sink_swallow (sink_iact.h:85) +
  runner_do_sink_swallow: the lighter sink of a pair within either
  cut-off is merged onto the heavier (pid tie-break), choosing the
  HEAVIEST candidate swallower; a sink that is itself being swallowed
  this step does not swallow (chains defer one step — the masked-
  dataflow analog of the reference's repeat-until-done cell loop).

All loops are masked dense pair evaluations on the padded (C, K) tiles
via the shared 27-offset machinery in ``ops.stencil``.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from ..grid.cellgrid import CellGrid
from .stencil import (_apply_offsets, _bi, _bj, _flat_view, _grid_view,
                      _pair_geometry_shift, _sanitize)

F32 = jnp.float32
I32 = jnp.int32


def _pot_total(s: Dict) -> jnp.ndarray:
    pot = s.get("pot")
    if pot is None:       # no gravity run: flat potential, gate passes
        return jnp.zeros_like(s["m"])
    if "pot_mesh" in s:
        pot = pot + s["pot_mesh"]
    return pot


def sink_formation_gate_loop(grid: CellGrid, gas_s: Dict, r_cut: float,
                             use_scan: bool = False) -> jnp.ndarray:
    """(C, K_gas) {0,1} gate: 1 = may form a sink (local potential
    minimum among gas within r_cut; sink_iact.h:53-73)."""
    gm = lambda n: _grid_view(grid, gas_s[n])
    gmask, goff = gm("mask"), gm("off")
    pot = _grid_view(grid, _pot_total(gas_s))
    r_cut2 = jnp.float32(r_cut * r_cut)

    j_fields = {"off": goff, "mask": gmask, "pot": pot}
    blocked0 = jnp.zeros(gmask.shape, bool)

    def accumulate(blocked, jf, shift):
        dx, r2 = _pair_geometry_shift(goff, jf["off"], shift)
        ok = ((_bi(gmask) > 0) & (_bj(jf["mask"]) > 0)
              & (r2 < r_cut2) & (r2 > 0))
        worse = ok & (_bi(pot) > _bj(jf["pot"]))
        return blocked | jnp.any(worse, axis=-1)

    blocked = _apply_offsets(grid, j_fields, blocked0, accumulate,
                             use_scan)
    return _flat_view(grid, (~blocked).astype(F32)) * gas_s["mask"]


def sink_gas_swallow_mark_loop(grid: CellGrid, gas_s: Dict, sink_s: Dict,
                               use_scan: bool = False) -> jnp.ndarray:
    """(C, K_gas) i32: pid of the sink swallowing each gas particle this
    step (-1 = none).  Largest-pid sink wins (sink_iact.h:149)."""
    gm = lambda n: _grid_view(grid, gas_s[n])
    gmask, goff = gm("mask"), gm("off")

    sv = lambda n: _grid_view(grid, sink_s[n])
    j_fields = {"off": sv("off"), "mask": sv("mask"), "pid": sv("pid"),
                "r_cut": _sanitize(sv("mask"), sv("r_cut"), fill=0.0)}
    acc0 = jnp.full(gmask.shape, -1, I32)

    def accumulate(best, jf, shift):
        dx, r2 = _pair_geometry_shift(goff, jf["off"], shift)
        rc = _bj(jf["r_cut"])
        ok = ((_bi(gmask) > 0) & (_bj(jf["mask"]) > 0)
              & (r2 < rc * rc))
        cand = jnp.where(ok, _bj(jf["pid"]), -1)
        return jnp.maximum(best, jnp.max(cand, axis=-1))

    best = _apply_offsets(grid, j_fields, acc0, accumulate, use_scan)
    return _flat_view(grid, best)


def sink_gas_swallow_collect_loop(grid: CellGrid, sink_s: Dict,
                                  gas_s: Dict, swallow_sid,
                                  a: float = 1.0, a_inv: float = 1.0,
                                  use_scan: bool = False) -> Dict:
    """Per-sink sums over gas that marked it (sink.h:241): dm, dp{0,1,2}
    (comoving momentum Σ m v) and dL{0,1,2} (physical angular momentum
    about the sink, Σ m (a·dx) × (dv/a))."""
    sm = lambda n: _grid_view(grid, sink_s[n])
    smask, soff = sm("mask"), sm("off")
    spid = sm("pid")
    sv = sm("v_full")

    j_fields = {"m": _grid_view(grid, gas_s["m"]),
                "mask": _grid_view(grid, gas_s["mask"]),
                "v": _grid_view(grid, gas_s["v_full"]),
                "sid": _grid_view(grid, swallow_sid),
                "off": _grid_view(grid, gas_s["off"])}
    keys = ("dm", "dp0", "dp1", "dp2", "dL0", "dL1", "dL2", "n")
    acc0 = {k: jnp.zeros(smask.shape, F32) for k in keys}
    af = jnp.float32(a)
    ai = jnp.float32(a_inv)

    def accumulate(acc, jf, shift):
        dx, r2 = _pair_geometry_shift(soff, jf["off"], shift)
        ok = ((_bj(jf["mask"]) > 0)
              & (_bj(jf["sid"]) == _bi(spid)) & (_bi(smask) > 0))
        w = ok.astype(F32)
        mj = _bj(jf["m"]) * w
        # physical separation and velocity difference (sink.h:254-261)
        dvx = (_bi(sv[..., 0]) - _bj(jf["v"][..., 0])) * ai
        dvy = (_bi(sv[..., 1]) - _bj(jf["v"][..., 1])) * ai
        dvz = (_bi(sv[..., 2]) - _bj(jf["v"][..., 2])) * ai
        px, py, pz = dx[0] * af, dx[1] * af, dx[2] * af
        return {
            "dm": acc["dm"] + jnp.sum(mj, axis=-1),
            "dp0": acc["dp0"] + jnp.sum(mj * _bj(jf["v"][..., 0]), -1),
            "dp1": acc["dp1"] + jnp.sum(mj * _bj(jf["v"][..., 1]), -1),
            "dp2": acc["dp2"] + jnp.sum(mj * _bj(jf["v"][..., 2]), -1),
            "dL0": acc["dL0"] + jnp.sum(mj * (py * dvz - pz * dvy), -1),
            "dL1": acc["dL1"] + jnp.sum(mj * (pz * dvx - px * dvz), -1),
            "dL2": acc["dL2"] + jnp.sum(mj * (px * dvy - py * dvx), -1),
            "n": acc["n"] + jnp.sum(w, axis=-1),
        }

    acc = _apply_offsets(grid, j_fields, acc0, accumulate, use_scan)
    return {k: _flat_view(grid, v) * sink_s["mask"] for k, v in
            acc.items()}


def sink_merger_mark_loop(grid: CellGrid, sink_s: Dict,
                          use_scan: bool = False) -> jnp.ndarray:
    """(C, K_sink) i32: pid of the sink that swallows each sink this step
    (-1 = none).  A sink is swallowed by the HEAVIEST candidate with
    larger mass (pid tie-break at equal mass), within either cut-off
    radius (sink_iact.h:85-114, runner_sinks.c:149)."""
    sm = lambda n: _grid_view(grid, sink_s[n])
    smask, soff = sm("mask"), sm("off")
    spid, smass = sm("pid"), sm("m")
    r_cut = _sanitize(smask, sm("r_cut"), fill=0.0)

    j_fields = {"off": soff, "mask": smask, "pid": spid, "m": smass,
                "r_cut": r_cut}
    # accumulate (best_mass, best_pid) of the swallower per sink
    acc0 = (jnp.full(smask.shape, -jnp.inf, F32),
            jnp.full(smask.shape, -1, I32))

    def accumulate(acc, jf, shift):
        best_m, best_id = acc
        dx, r2 = _pair_geometry_shift(soff, jf["off"], shift)
        rc_i = _bi(r_cut)
        rc_j = _bj(jf["r_cut"])
        near = (r2 < rc_i * rc_i) | (r2 < rc_j * rc_j)
        m_i, m_j = _bi(smass), _bj(jf["m"])
        id_i, id_j = _bi(spid), _bj(jf["pid"])
        # j swallows i when heavier (pid tie-break); i is the victim here
        heavier = (m_j > m_i) | ((m_j == m_i) & (id_j > id_i))
        ok = ((_bi(smask) > 0) & (_bj(jf["mask"]) > 0) & near
              & heavier & (r2 > 0))
        cand_m = jnp.where(ok, m_j, -jnp.inf)
        cand_id = jnp.where(ok, id_j, -1)
        # lexicographic (mass, pid) max over the pair axis: max mass,
        # then max pid among the candidates at that mass
        pm = jnp.max(cand_m, axis=-1)
        pid_at = jnp.max(jnp.where(cand_m == pm[..., None], cand_id, -1),
                         axis=-1)
        upd = (pm > best_m) | ((pm == best_m) & (pid_at > best_id))
        return (jnp.where(upd, pm, best_m),
                jnp.where(upd, pid_at, best_id))

    best_m, best_id = _apply_offsets(grid, j_fields, acc0, accumulate,
                                     use_scan)
    return _flat_view(grid, best_id)


def sink_merger_consumed_loop(grid: CellGrid, sink_s: Dict, victim_sid,
                              not_victim, use_scan: bool = False
                              ) -> jnp.ndarray:
    """(C, K_sink) bool: this victim's swallower is NOT itself a victim,
    so the merge completes this step.  Chains (A swallows B while B
    swallows C) defer the inner merge one step — the masked-dataflow
    analog of the reference's repeat-until-done cell sweep
    (runner_do_sink_swallow)."""
    sm = lambda n: _grid_view(grid, sink_s[n])
    smask = sm("mask")
    vic = _grid_view(grid, victim_sid)

    j_fields = {"mask": smask, "pid": sm("pid"),
                "ok": _grid_view(grid, not_victim.astype(F32)),
                "off": sm("off")}
    acc0 = jnp.zeros(smask.shape, bool)

    def accumulate(acc, jf, shift):
        hit = ((_bj(jf["mask"]) > 0) & (_bj(jf["ok"]) > 0)
               & (_bj(jf["pid"]) == _bi(vic)) & (_bi(vic) >= 0))
        return acc | jnp.any(hit, axis=-1)

    acc = _apply_offsets(grid, j_fields, acc0, accumulate, use_scan)
    return _flat_view(grid, acc)


def sink_merger_collect_loop(grid: CellGrid, sink_s: Dict, victim_sid,
                             not_victim, use_scan: bool = False) -> Dict:
    """Per-sink sums over sinks that marked IT as their swallower
    (runner_do_sink_swallow; sink.h:312 sink_swallow_sink): dm, dp{0,1,2}
    (comoving momentum), dL{0,1,2} (the victims' swallowed angular
    momenta carry over), n (count).  Only sinks that are not themselves
    victims collect (chain deferral — see sink_merger_consumed_loop)."""
    sm = lambda n: _grid_view(grid, sink_s[n])
    smask, spid = sm("mask"), sm("pid")
    i_ok = _grid_view(grid, not_victim.astype(F32))

    j_fields = {"m": sm("m"), "mask": smask,
                "v": _grid_view(grid, sink_s["v_full"]),
                "L": _grid_view(grid, sink_s["swallowed_L"]),
                "sid": _grid_view(grid, victim_sid),
                "off": sm("off")}
    keys = ("dm", "dp0", "dp1", "dp2", "dL0", "dL1", "dL2", "n")
    acc0 = {k: jnp.zeros(smask.shape, F32) for k in keys}

    def accumulate(acc, jf, shift):
        ok = ((_bj(jf["mask"]) > 0) & (_bi(i_ok) > 0)
              & (_bj(jf["sid"]) == _bi(spid)) & (_bi(smask) > 0))
        w = ok.astype(F32)
        mj = _bj(jf["m"]) * w
        return {
            "dm": acc["dm"] + jnp.sum(mj, axis=-1),
            "dp0": acc["dp0"] + jnp.sum(mj * _bj(jf["v"][..., 0]), -1),
            "dp1": acc["dp1"] + jnp.sum(mj * _bj(jf["v"][..., 1]), -1),
            "dp2": acc["dp2"] + jnp.sum(mj * _bj(jf["v"][..., 2]), -1),
            "dL0": acc["dL0"] + jnp.sum(w * _bj(jf["L"][..., 0]), -1),
            "dL1": acc["dL1"] + jnp.sum(w * _bj(jf["L"][..., 1]), -1),
            "dL2": acc["dL2"] + jnp.sum(w * _bj(jf["L"][..., 2]), -1),
            "n": acc["n"] + jnp.sum(w, axis=-1),
        }

    acc = _apply_offsets(grid, j_fields, acc0, accumulate, use_scan)
    return {k: _flat_view(grid, v) * sink_s["mask"] for k, v in
            acc.items()}
