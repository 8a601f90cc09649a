"""Pressure-Energy (P-U) scheme: oracle matches + engine conservation.

Mirrors the reference's loop-vs-bruteforce strategy (test27cells) for the
4th of the 14 compile-time schemes (src/hydro/PressureEnergy)."""

import numpy as np
import jax.numpy as jnp

from swift_subtask_dev_tpu.engine import Engine, EngineConfig
from swift_subtask_dev_tpu.grid import CellGrid
from swift_subtask_dev_tpu.grid.cellgrid import bucket_fields, \
    global_positions
from swift_subtask_dev_tpu.models.sph.pressure_energy import \
    PressureEnergyParams
from swift_subtask_dev_tpu.models.sph import sphenix
from swift_subtask_dev_tpu.ics import uniform_box_ic
from swift_subtask_dev_tpu.ops import bruteforce, stencil


def _tiled_state(grid, ic, extra):
    n = len(ic["pos"])
    fields = {"m": jnp.asarray(ic["m"]), "v": jnp.asarray(ic["v"]),
              "h": jnp.asarray(ic["h"]), "u": jnp.asarray(ic["u"]),
              "pid": jnp.arange(n, dtype=jnp.int32), **extra}
    out, mask, off, n_over = bucket_fields(grid, jnp.asarray(ic["pos"]),
                                           fields)
    assert int(n_over) == 0
    return {"mask": mask, "off": off, **out}, mask, off


def test_pu_density_loop_matches_bruteforce():
    ic = uniform_box_ic(n=6, jitter=0.15, seed=4)
    p = PressureEnergyParams(h_max=0.4)
    grid = CellGrid(box=(1.0, 1.0, 1.0), cdim=(3, 3, 3), K=48)
    s, mask, off = _tiled_state(grid, ic, {})
    got = stencil.density_loop(grid, s, p)
    assert "pressure_bar" in got and "pressure_bar_dh" in got

    flat_mask = np.asarray(mask).reshape(-1) > 0
    pid = np.asarray(s["pid"]).reshape(-1)[flat_mask]
    order = np.argsort(pid)
    pos = global_positions(grid, np.asarray(off)).reshape(-1, 3)[flat_mask]

    def flat(name, outdict=None):
        src = np.asarray((outdict or s)[name])
        return src.reshape((-1,) + src.shape[2:])[flat_mask][order]

    ref = bruteforce.density_bruteforce(
        p, jnp.asarray(pos[order]), jnp.asarray(flat("h")),
        jnp.asarray(flat("m")), jnp.asarray(flat("v")),
        box=(1.0, 1.0, 1.0), u=jnp.asarray(flat("u")))
    for k in ("rho", "pressure_bar", "pressure_bar_dh", "wcount"):
        np.testing.assert_allclose(
            flat(k, got), np.asarray(ref[k]), rtol=2e-3, atol=1e-6,
            err_msg=k)


def test_pu_force_loop_matches_bruteforce():
    ic = uniform_box_ic(n=6, jitter=0.15, seed=5)
    p = PressureEnergyParams(h_max=0.4)
    grid = CellGrid(box=(1.0, 1.0, 1.0), cdim=(3, 3, 3), K=48)
    n = len(ic["pos"])
    rng = np.random.default_rng(0)
    extra = {
        "rho": jnp.asarray(1.0 + 0.1 * rng.random(n), jnp.float32),
        "pressure": jnp.asarray(0.5 + 0.1 * rng.random(n), jnp.float32),
        "soundspeed": jnp.asarray(0.9 + 0.1 * rng.random(n), jnp.float32),
        "f_gradh": jnp.asarray(1e-4 * rng.random(n), jnp.float32),
        "balsara": jnp.asarray(0.8 * rng.random(n), jnp.float32),
        "alpha_visc": jnp.full((n,), 0.8, jnp.float32),
        "alpha_diff": jnp.zeros((n,), jnp.float32),
    }
    s, mask, off = _tiled_state(grid, ic, extra)
    s["v_sig"] = jnp.zeros_like(mask)
    s["time_bin"] = jnp.zeros(mask.shape, jnp.int32)
    cosmo = sphenix.CosmoFactors.no_cosmo()
    got = stencil.force_loop(grid, s, p, cosmo)

    flat_mask = np.asarray(mask).reshape(-1) > 0
    pid = np.asarray(s["pid"]).reshape(-1)[flat_mask]
    order = np.argsort(pid)
    pos = global_positions(grid, np.asarray(off)).reshape(-1, 3)[flat_mask]

    def flat(name, outdict=None):
        src = np.asarray((outdict or s)[name])
        return src.reshape((-1,) + src.shape[2:])[flat_mask][order]

    ref = bruteforce.force_bruteforce(
        p, jnp.asarray(pos[order]),
        jnp.asarray(flat("h")), jnp.asarray(flat("m")),
        jnp.asarray(flat("v")), jnp.asarray(flat("rho")),
        jnp.asarray(flat("pressure")), jnp.asarray(flat("soundspeed")),
        jnp.asarray(flat("f_gradh")), jnp.asarray(flat("balsara")),
        jnp.asarray(flat("alpha_visc")), jnp.asarray(flat("alpha_diff")),
        jnp.asarray(flat("u")), jnp.zeros(len(pid), jnp.float32),
        cosmo, box=(1.0, 1.0, 1.0))
    np.testing.assert_allclose(flat("a_hydro", got),
                               np.asarray(ref["a_hydro"]),
                               rtol=2e-3, atol=1e-5)
    np.testing.assert_allclose(flat("u_dt", got), np.asarray(ref["u_dt"]),
                               rtol=2e-3, atol=1e-6)


def test_pu_engine_runs_and_conserves():
    ic = uniform_box_ic(n=6, jitter=0.1, seed=9)
    p = PressureEnergyParams(h_max=0.4)
    grid = CellGrid(box=(1.0, 1.0, 1.0), cdim=(3, 3, 3), K=48)
    eng = Engine(grid, p, EngineConfig(dt_max=5e-4), 0.0, 1.0)
    eng.load_particles(ic["pos"], ic["m"], ic["v"], ic["u"], ic["h"])
    eng.init_particles()
    mask = np.asarray(eng.state["mask"]) > 0

    def total_energy():
        s = eng.state
        m = np.asarray(s["m"])[mask]
        v = np.asarray(s["v_full"])[mask]
        u = np.asarray(s["u_full"])[mask]
        return float((0.5 * m * (v ** 2).sum(-1) + m * u).sum())

    e0 = total_energy()
    for _ in range(6):
        eng.step()
    e1 = total_energy()
    assert abs(e1 - e0) / abs(e0) < 1e-4, (e0, e1)
    pb = np.asarray(eng.state["pressure_bar"])[mask]
    assert np.isfinite(pb).all() and (pb > 0).all()
