"""Timestep limiter + wake-up semantics (runner_do_limiter,
timestep_limit_part — reference runner_time_integration.c:1324,
timestep_limiter.h:64).

A hot central region forces tiny CFL steps; surrounding cold particles pick
long steps.  With the limiter on, no inactive particle may remain more than
2 bins above any active neighbour whose kernel covers it.
"""

import numpy as np
import jax.numpy as jnp

from swift_subtask_dev_tpu.engine import Engine, EngineConfig, NBINS
from swift_subtask_dev_tpu.grid import CellGrid
from swift_subtask_dev_tpu.grid.cellgrid import global_positions
from swift_subtask_dev_tpu.models.sph.sphenix import SPHENIXParams
from swift_subtask_dev_tpu.ics import uniform_box_ic
from swift_subtask_dev_tpu.utils import timeline as tl


def _mk_engine(limiter: bool):
    ic = uniform_box_ic(n=10, jitter=0.05, seed=1)
    pos, box = ic["pos"], ic["box"]
    u = np.asarray(ic["u"]).copy()
    # hot spot: 1000x internal energy inside r < 0.15*box around the centre
    r = np.linalg.norm(pos - 0.5 * np.asarray(box), axis=1)
    u[r < 0.15 * box[0]] *= 1000.0

    P = SPHENIXParams(h_max=float(ic["h"].max() * 2))
    grid = CellGrid.build_for_positions(
        box, interaction_range=float(ic["h"].max() * P.kernel.gamma * 1.2),
        pos=pos, headroom=2.0)
    cfg = EngineConfig(dt_max=1e-2, dt_min=1e-12, backend="xla",
                       with_timestep_limiter=limiter)
    eng = Engine(grid, P, cfg, 0.0, 1.0)
    eng.load_particles(pos, ic["m"], ic["v"], u, ic["h"])
    eng.init_particles()
    return eng, P


def _by_pid(state, grid):
    """Flatten masked slots sorted by pid -> dict of numpy arrays."""
    mask = np.asarray(state["mask"]).reshape(-1) > 0
    pid = np.asarray(state["pid"]).reshape(-1)[mask]
    order = np.argsort(pid)
    pos = global_positions(grid, np.asarray(state["off"])).reshape(-1, 3)
    out = {
        "pos": pos[mask][order],
        "h": np.asarray(state["h"]).reshape(-1)[mask][order],
        "bin": np.asarray(state["time_bin"]).reshape(-1)[mask][order],
    }
    return out


def _min_active_ngb_bin(pos, h, bins, active, box):
    """O(N^2) oracle: per particle, min new bin over active neighbours
    whose kernel (gamma*h_i) covers it."""
    gamma = SPHENIXParams().kernel.gamma
    n = len(pos)
    mnb = np.full(n, 99, np.int64)
    act_idx = np.where(active)[0]
    d = pos[None, act_idx, :] - pos[:, None, :]
    d -= np.round(d / box) * box
    r2 = (d ** 2).sum(-1)
    within = r2 < (gamma * h[act_idx][None, :]) ** 2
    within &= r2 > 0
    for j in range(n):
        cover = act_idx[within[j]]
        if len(cover):
            mnb[j] = bins[cover].min()
    return mnb


def test_limiter_wakes_neighbours():
    eng, P = _mk_engine(limiter=True)
    grid = eng.grid
    box = np.asarray(grid.box)

    saw_spread = False
    saw_wake = False
    for _ in range(8):
        before = _by_pid(eng.state, grid)
        active_mask_bins = eng.timeline.active_bins_mask(eng._ti_end_min)
        diag = eng.step()
        after = _by_pid(eng.state, grid)

        assert np.array_equal(
            np.sort(before["bin"] * 0 + 1), np.sort(after["bin"] * 0 + 1))
        active = active_mask_bins[np.clip(before["bin"], 0, NBINS)]
        if len(np.unique(after["bin"])) > 2:
            saw_spread = True
        if int(diag["n_woken"]) > 0:
            saw_wake = True

        # the load-bearing invariant: any particle inactive this step sits
        # within 2 bins of every active neighbour that covers it
        mnb = _min_active_ngb_bin(after["pos"], after["h"], after["bin"],
                                  active, box)
        inact = ~active
        bad = inact & (after["bin"] > mnb + 2)
        assert not bad.any(), (
            f"{bad.sum()} inactive particles remain >2 bins above an "
            f"active neighbour (bins {after['bin'][bad][:5]} vs "
            f"min_ngb {mnb[bad][:5]})")

    assert saw_spread, "test problem never produced a multi-bin population"
    assert saw_wake, "limiter never woke a particle — test has no teeth"


def test_wake_table_algebra():
    """Non-cosmo wake kick must equal (half_new - half_old) * time_base."""
    eng, _ = _mk_engine(limiter=True)
    eng.step()
    t = eng.timeline
    ti = t.ti_current
    T = eng._tables(dt_drift=0.0)
    wake_dv = np.asarray(T.wake_dv)
    for bo in (10, 20, 40):
        dto = tl.get_integer_timestep(bo)
        beg_o = dto * ((ti - 1) // dto)
        for bn in (bo - 3, bo - 8):
            if bn < 1:
                continue
            dtn = tl.get_integer_timestep(bn)
            beg_n = dtn * (ti // dtn)
            expect = ((beg_n + dtn // 2) - (beg_o + dto // 2)) * t.time_base
            got = wake_dv[bo, bn]
            assert np.isclose(got, expect, rtol=1e-5, atol=1e-30), \
                (bo, bn, got, expect)
