"""Split PM-mesh timestep: the mesh field on its own (longer) step.

The reference kicks mesh accelerations on a separate interval
(kick.h:255 kick_gpart mesh terms, engine.c:2406 ti_mesh) instead of
recomputing the FFT every particle step.  Gates: (1) the split run stays
close to the every-step-PM run, (2) energy stays conserved, (3) the mesh
really updates less often than the particle steps.
"""

import numpy as np

from swift_subtask_dev_tpu.engine import Engine, EngineConfig
from swift_subtask_dev_tpu.grid import CellGrid
from swift_subtask_dev_tpu.io.statistics import species_statistics
from swift_subtask_dev_tpu.models.gravity import GravityParams, GravitySolver
from swift_subtask_dev_tpu.models.sph.sphenix import SPHENIXParams
from swift_subtask_dev_tpu.ics import uniform_box_ic


def _setup():
    ic = uniform_box_ic(n=10, jitter=0.15, seed=5, u0=2e-3)
    P = SPHENIXParams(h_max=float(ic["h"].max() * 3))
    grid = CellGrid.build_for_positions(
        ic["box"],
        interaction_range=float(ic["h"].max() * P.kernel.gamma * 1.3),
        pos=ic["pos"], headroom=1.8)
    gp = GravityParams(G=0.5, eps=0.01, mesh_N=32)
    solver = GravitySolver(gp, grid)
    return ic, P, grid, gp, solver


def _run(split: bool, n_steps: int = 30):
    ic, P, grid, gp, solver = _setup()
    cfg = EngineConfig(dt_max=2e-4, with_self_gravity=True,
                       p2p_reach=solver.pm.r_cut)
    if split:
        eng = Engine(grid, P, cfg, 0.0, 1.0,
                     gravity_fn=solver.gas_short_range_fn(),
                     mesh_fn=solver.gas_mesh_fn(),
                     mesh_dt_scale=solver.pm.r_s)
    else:
        eng = Engine(grid, P, cfg, 0.0, 1.0,
                     gravity_fn=solver.gas_gravity_fn())
    eng.load_particles(ic["pos"], ic["m"], ic["v"], ic["u"], ic["h"])
    eng.init_particles()
    e0 = species_statistics(eng.grid, eng.state)
    for _ in range(n_steps):
        eng.step()
    e1 = species_statistics(eng.grid, eng.state)
    return eng, e0, e1


def test_split_mesh_tracks_full_pm():
    eng_s, e0s, e1s = _run(split=True)
    eng_f, e0f, e1f = _run(split=False)

    # the split machinery engaged (in this quiet box every bin sits at
    # dt_max, so mesh and particle cadence coincide; the decoupling is
    # asserted in test_mesh_interval_picker)
    assert eng_s.n_mesh_updates >= 1
    assert eng_s.n_mesh_updates <= eng_s.step_count + 1

    # energies conserved in the split run
    scale = abs(float(e0s["e_kin"])) + abs(float(e0s["e_int"])) \
        + abs(float(e0s["e_pot"]))
    drift = abs(float(e1s["e_tot"]) - float(e0s["e_tot"])) / scale
    assert drift < 2e-4, drift

    # trajectories agree with the every-step-PM reference
    def perpid(eng, k):
        pid = np.asarray(eng.state["pid"]).ravel()
        msk = np.asarray(eng.state["mask"]).ravel() > 0
        x = np.asarray(eng.state[k])
        x = x.reshape(-1, *x.shape[2:])
        return x[msk][np.argsort(pid[msk])]

    vs, vf = perpid(eng_s, "v_full"), perpid(eng_f, "v_full")
    vscale = np.abs(vf).max() + 1e-12
    assert np.abs(vs - vf).max() / vscale < 5e-2


def test_mesh_interval_picker():
    """Small mesh accelerations -> long (dt_max-capped) mesh intervals;
    large ones -> short intervals.  The host-side analog of
    get_mesh_timestep + ti_mesh alignment (engine.c:2406)."""
    ic, P, grid, gp, solver = _setup()
    cfg = EngineConfig(dt_max=2e-4, with_self_gravity=True,
                       p2p_reach=solver.pm.r_cut)
    eng = Engine(grid, P, cfg, 0.0, 1.0,
                 gravity_fn=solver.gas_short_range_fn(),
                 mesh_fn=solver.gas_mesh_fn(),
                 mesh_dt_scale=solver.pm.r_s)
    eng.load_particles(ic["pos"], ic["m"], ic["v"], ic["u"], ic["h"])
    from swift_subtask_dev_tpu.utils import timeline as tl
    dti_quiet = eng._pick_mesh_dti(1e-8)      # tiny acc -> dt_max cap
    dti_loud = eng._pick_mesh_dti(1e6)        # huge acc -> short interval
    assert dti_loud < dti_quiet
    # the loud interval obeys the sqrt(2 eta r_s / amax) criterion
    dt_crit = float(np.sqrt(2 * cfg.eta_grav * solver.pm.r_s / 1e6))
    assert dti_loud * eng.timeline.time_base <= dt_crit
    # the quiet interval matches the dt_max ceiling bin
    b = 1
    while (b < tl.NUM_TIME_BINS and
           tl.get_integer_timestep(b + 1) * eng.timeline.time_base
           <= cfg.dt_max):
        b += 1
    assert dti_quiet == tl.get_integer_timestep(b)
