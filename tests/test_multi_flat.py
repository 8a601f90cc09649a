"""MultiEngine on the flat (column/z-sorted) backend vs the roll-stencil.

Gas + DM with joint P2P+PM gravity: the flat Pallas pipeline must
reproduce the xla-stencil engine per particle (same physics, different
pair enumeration/layout) — the TPU analog of the reference checking its
vectorized loops against the generic ones (testInteractions).
"""

import numpy as np
import jax.numpy as jnp

from swift_subtask_dev_tpu.engine import EngineConfig
from swift_subtask_dev_tpu.engine_multi import MultiEngine
from swift_subtask_dev_tpu.grid.cellgrid import CellGrid
from swift_subtask_dev_tpu.models.gravity import GravityParams, GravitySolver
from swift_subtask_dev_tpu.models.sph.sphenix import SPHENIXParams
from swift_subtask_dev_tpu.ics import uniform_box_ic


def _run(backend, n_steps=3):
    ic = uniform_box_ic(n=8, jitter=0.05)
    n = len(ic["pos"])
    rng = np.random.default_rng(2)
    pos_dm = rng.uniform(0, 1, (n, 3))
    gp = GravityParams(G=1.0, eps=0.02, mesh_N=32)
    sph = SPHENIXParams()
    box = (1.0, 1.0, 1.0)
    r_cut = gp.r_cut_ratio * gp.a_smooth * 1.0 / gp.mesh_N
    reach = max(float(ic["h"].max()) * sph.kernel.gamma * 1.3,
                r_cut * 1.0001)
    pos_all = np.concatenate([ic["pos"], pos_dm])
    if backend == "flat":
        grid = CellGrid.build_columns(box, reach, pos_all)
    else:
        grid = CellGrid.build_for_positions(box, reach, pos_all,
                                            headroom=1.6)
    solver = GravitySolver(gp, grid)
    cfg = EngineConfig(dt_min=1e-12, dt_max=2e-3, with_self_gravity=True,
                       eta_grav=gp.eta, eps_soft=gp.eps,
                       p2p_reach=solver.pm.r_cut, backend=backend)
    eng = MultiEngine(grid, sph, cfg, 0.0, 1.0,
                      gravity_fn=solver.short_range_accelerations,
                      eps_soft=gp.eps,
                      mesh_fn=solver.mesh_accelerations,
                      mesh_dt_scale=solver.pm.r_s)
    eng.load_gas(ic["pos"], ic["m"], ic["v"], ic["u"], ic["h"])
    eng.load_dm(pos_dm, np.full(n, 2.0 / n, np.float32),
                np.zeros((n, 3), np.float32))
    eng.init_particles()
    for _ in range(n_steps):
        eng.step()

    out = {}
    from swift_subtask_dev_tpu.grid.cellgrid import global_positions
    for name, sp in eng.state.items():
        mask = np.asarray(sp["mask"]) > 0
        pid = np.asarray(sp["pid"])[mask]
        order = np.argsort(pid)
        pos = global_positions(eng.grid, np.asarray(sp["off"]))[mask][order]
        v = np.asarray(sp["v_full"])[mask][order]
        row = {"pos": pos, "v": v}
        if "u_full" in sp:
            row["u"] = np.asarray(sp["u_full"])[mask][order]
            row["rho"] = np.asarray(sp["rho"])[mask][order]
        out[name] = row
    return out


def test_multi_flat_matches_xla():
    a = _run("xla")
    b = _run("flat")
    for name in ("gas", "dm"):
        # positions: same ICs, tolerance covers f32 ordering + the flat
        # kernel's r_cut pair cut (the stencil keeps truncated pairs
        # beyond r_cut)
        dv = np.abs(a[name]["v"] - b[name]["v"]).max()
        scale = max(np.abs(a[name]["v"]).max(), 1e-10)
        assert dv / scale < 2e-3, (name, dv, scale)
        dx = np.abs(a[name]["pos"] - b[name]["pos"]).max()
        assert dx < 1e-5, (name, dx)
    du = np.abs(a["gas"]["u"] - b["gas"]["u"]).max()
    assert du / np.abs(a["gas"]["u"]).max() < 2e-3
    drho = np.abs(a["gas"]["rho"] - b["gas"]["rho"]).max()
    assert drho / np.abs(a["gas"]["rho"]).max() < 1e-3


def _run_sf_fb(backend, n_steps=4):
    """Gas + a seeded star, EAGLE SF + thermal feedback enabled."""
    from swift_subtask_dev_tpu.subgrid.star_formation import (
        EagleStarFormation)
    from swift_subtask_dev_tpu.subgrid.feedback import EagleThermalFeedback

    ic = uniform_box_ic(n=8, jitter=0.05, seed=9)
    sph = SPHENIXParams(h_max=float(ic["h"].max() * 3))
    box = (1.0, 1.0, 1.0)
    reach = float(ic["h"].max()) * sph.kernel.gamma * 1.3
    if backend == "flat":
        grid = CellGrid.build_columns(box, reach, ic["pos"])
    else:
        grid = CellGrid.build_for_positions(box, reach, ic["pos"],
                                            headroom=1.6)
    sf = EagleStarFormation(sf_norm=30.0, sf_power=0.0,
                            density_threshold=0.0)
    fb = EagleThermalFeedback(delta_u=20.0, e_per_mass=40.0,
                              snii_delay=0.0)
    cfg = EngineConfig(dt_min=1e-12, dt_max=2e-4, backend=backend)
    eng = MultiEngine(grid, sph, cfg, 0.0, 1.0,
                      star_formation=sf, feedback=fb)
    # the fallback must be gone: flat stays flat with SF+feedback on
    assert eng.cfg.backend == backend
    eng.load_gas(ic["pos"], ic["m"], ic["v"], ic["u"], ic["h"])
    eng.alloc_stars(extra_per_cell=16)
    eng.load_stars(np.asarray([[0.5, 0.5, 0.5]]),
                   np.asarray([1.0], np.float32),
                   np.zeros((1, 3), np.float32),
                   h=np.asarray([float(ic["h"].max())], np.float32),
                   pid=np.asarray([10_000_000], np.int64))
    st = eng.state["stars"]
    eng.state["stars"] = {**st, "birth_time": st["birth_time"]
                          + 1e-12 * (np.asarray(st["mask"]) > 0)}
    eng.init_particles()
    n_conv = n_heat = 0
    for _ in range(n_steps):
        diag = eng.step()
        n_conv += int(diag["n_converted"])
        n_heat += int(diag["n_heated"])

    out = {"n_conv": n_conv, "n_heat": n_heat}
    from swift_subtask_dev_tpu.grid.cellgrid import global_positions
    for name in ("gas", "stars"):
        sp = eng.state[name]
        mask = np.asarray(sp["mask"]) > 0
        pid = np.asarray(sp["pid"])[mask]
        order = np.argsort(pid)
        out[name] = {
            "pid": pid[order],
            "pos": global_positions(eng.grid,
                                    np.asarray(sp["off"]))[mask][order],
            "m": np.asarray(sp["m"])[mask][order],
        }
        if "u_full" in sp:
            out[name]["u"] = np.asarray(sp["u_full"])[mask][order]
    return out


def test_multi_flat_sf_feedback_matches_xla():
    """SF + feedback no longer force the xla fallback: the flat backend
    (gas-gas loops on the column Pallas engine, star->gas loops on the
    27-stencil over the same column grid) reproduces the xla engine —
    including the layout-independent stochastic draws (threefry on
    (pid, ti); _pair_hash_uniform on (pid_i, pid_j, ti))."""
    a = _run_sf_fb("xla")
    b = _run_sf_fb("flat")
    # identical stochastic outcomes: same conversions, same heating events
    assert a["n_conv"] == b["n_conv"] and a["n_conv"] > 0
    assert a["n_heat"] == b["n_heat"] and a["n_heat"] > 0
    for name in ("gas", "stars"):
        np.testing.assert_array_equal(a[name]["pid"], b[name]["pid"])
        np.testing.assert_allclose(a[name]["m"], b[name]["m"], rtol=1e-6)
        dx = np.abs(a[name]["pos"] - b[name]["pos"]).max()
        assert dx < 1e-5, (name, dx)
    # heated-energy field: tolerance covers f32 pair-ordering noise
    du = np.abs(a["gas"]["u"] - b["gas"]["u"]).max()
    assert du / np.abs(a["gas"]["u"]).max() < 2e-3


def _run_sharded(shard_n, n_steps=3):
    """Gas+DM flat run with the pair passes + joint P2P gravity under
    shard_map when shard_n>0 (ghost unrolled in both for parity)."""
    import jax
    # n=12: reach small enough that >=4 columns fit in x (4 shards)
    ic = uniform_box_ic(n=12, jitter=0.05)
    n = len(ic["pos"])
    rng = np.random.default_rng(2)
    pos_dm = rng.uniform(0, 1, (n, 3))
    gp = GravityParams(G=1.0, eps=0.02, mesh_N=32)
    sph = SPHENIXParams()
    box = (1.0, 1.0, 1.0)
    r_cut = gp.r_cut_ratio * gp.a_smooth * 1.0 / gp.mesh_N
    reach = max(float(ic["h"].max()) * sph.kernel.gamma * 1.2,
                r_cut * 1.0001)
    pos_all = np.concatenate([ic["pos"], pos_dm])
    grid = CellGrid.build_columns(box, reach, pos_all, n_shards=4)
    # shard the PM Poisson solve too (slab-decomposed FFT)
    solver = GravitySolver(gp, grid, fft_shard_n=shard_n)
    cfg = EngineConfig(dt_min=1e-12, dt_max=2e-3, with_self_gravity=True,
                       eta_grav=gp.eta, eps_soft=gp.eps,
                       p2p_reach=solver.pm.r_cut, backend="flat",
                       shard_n=shard_n, ghost_unroll=True,
                       max_ghost_iterations=4)
    gfn = (solver.short_range_sharded_fn(shard_n) if shard_n
           else solver.short_range_accelerations)
    eng = MultiEngine(grid, sph, cfg, 0.0, 1.0,
                      gravity_fn=gfn, eps_soft=gp.eps,
                      mesh_fn=solver.mesh_accelerations,
                      mesh_dt_scale=solver.pm.r_s)
    eng.load_gas(ic["pos"], ic["m"], ic["v"], ic["u"], ic["h"])
    eng.load_dm(pos_dm, np.full(n, 2.0 / n, np.float32),
                np.zeros((n, 3), np.float32))
    eng.init_particles()
    for _ in range(n_steps):
        eng.step()
    out = {}
    from swift_subtask_dev_tpu.grid.cellgrid import global_positions
    for name, sp in eng.state.items():
        mask = np.asarray(sp["mask"]) > 0
        pid = np.asarray(sp["pid"])[mask]
        order = np.argsort(pid)
        out[name] = {
            "pos": global_positions(eng.grid,
                                    np.asarray(sp["off"]))[mask][order],
            "v": np.asarray(sp["v_full"])[mask][order],
            "a": np.asarray(sp["a_grav"])[mask][order],
        }
    return out


def test_multi_sharded_flat_matches_unsharded():
    """MultiEngine with shard_n=4: gas-gas loops AND the joint
    multi-species P2P short-range gravity under shard_map (ppermute
    column-slab halos for every species) vs the unsharded flat run."""
    import jax
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    a = _run_sharded(0)
    b = _run_sharded(4)
    for name in ("gas", "dm"):
        for k in ("pos", "v", "a"):
            da = np.abs(a[name][k] - b[name][k]).max()
            scale = max(np.abs(a[name][k]).max(), 1e-10)
            assert da / scale < 2e-4, (name, k, da, scale)
