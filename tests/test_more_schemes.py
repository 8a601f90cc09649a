"""Phantom, AnarchyPU and None schemes through the engine + oracles.

Each scheme runs the full engine on a perturbed uniform box (energy
conservation for the force-bearing schemes), and the force loops are
checked against the O(N^2) oracle via the shared term functions —
the reference's test27cells strategy applied to schemes 5-7.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from swift_subtask_dev_tpu.engine import Engine, EngineConfig
from swift_subtask_dev_tpu.grid import CellGrid
from swift_subtask_dev_tpu.grid.cellgrid import bucket_fields, \
    global_positions
from swift_subtask_dev_tpu.models.sph.phantom import PhantomParams
from swift_subtask_dev_tpu.models.sph.anarchy_pu import AnarchyPUParams
from swift_subtask_dev_tpu.models.sph.none import NoneParams
from swift_subtask_dev_tpu.models.sph import sphenix
from swift_subtask_dev_tpu.ics import uniform_box_ic
from swift_subtask_dev_tpu.ops import bruteforce, stencil


@pytest.mark.parametrize("params_cls", [PhantomParams, AnarchyPUParams])
def test_force_loop_matches_bruteforce(params_cls):
    ic = uniform_box_ic(n=6, jitter=0.15, seed=7)
    p = params_cls(h_max=0.4)
    grid = CellGrid(box=(1.0, 1.0, 1.0), cdim=(3, 3, 3), K=48)
    n = len(ic["pos"])
    rng = np.random.default_rng(1)
    fields = {
        "m": jnp.asarray(ic["m"]), "v": jnp.asarray(ic["v"]),
        "h": jnp.asarray(ic["h"]), "u": jnp.asarray(ic["u"]),
        "rho": jnp.asarray(1.0 + 0.1 * rng.random(n), jnp.float32),
        "pressure": jnp.asarray(0.5 + 0.1 * rng.random(n), jnp.float32),
        "soundspeed": jnp.asarray(0.9 + 0.1 * rng.random(n), jnp.float32),
        "f_gradh": jnp.asarray(1e-4 * rng.random(n), jnp.float32),
        "balsara": jnp.asarray(0.8 * rng.random(n), jnp.float32),
        "alpha_visc": jnp.asarray(0.5 + 0.5 * rng.random(n), jnp.float32),
        "alpha_diff": jnp.asarray(0.3 * rng.random(n), jnp.float32),
        "pid": jnp.arange(n, dtype=jnp.int32),
    }
    out, mask, off, n_over = bucket_fields(grid, jnp.asarray(ic["pos"]),
                                           fields)
    assert int(n_over) == 0
    s = {"mask": mask, "off": off, **out,
         "v_sig": jnp.zeros_like(mask),
         "time_bin": jnp.zeros(mask.shape, jnp.int32)}
    cosmo = sphenix.CosmoFactors.no_cosmo()
    got = stencil.force_loop(grid, s, p, cosmo)

    flat_mask = np.asarray(mask).reshape(-1) > 0
    pid = np.asarray(out["pid"]).reshape(-1)[flat_mask]
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


@pytest.mark.parametrize("params_cls", [PhantomParams, AnarchyPUParams])
def test_engine_conserves(params_cls):
    ic = uniform_box_ic(n=6, jitter=0.1, seed=11)
    p = params_cls(h_max=0.4)
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


def test_none_scheme_free_streams():
    """No hydro force: particles drift ballistically, u untouched."""
    ic = uniform_box_ic(n=5, jitter=0.1, seed=2)
    # h_max under edge/gamma: the 27-stencil coverage contract
    p = NoneParams(h_max=0.18)
    grid = CellGrid(box=(1.0, 1.0, 1.0), cdim=(3, 3, 3), K=64)
    eng = Engine(grid, p, EngineConfig(dt_max=1e-3), 0.0, 1.0)
    v0 = np.full_like(ic["v"], 0.05)
    eng.load_particles(ic["pos"], ic["m"], v0, ic["u"],
                       np.minimum(ic["h"], 0.18))
    eng.init_particles()
    mask = np.asarray(eng.state["mask"]) > 0
    u_before = np.sort(np.asarray(eng.state["u_full"])[mask])
    for _ in range(4):
        eng.step()
    mask = np.asarray(eng.state["mask"]) > 0
    s = eng.state
    assert np.allclose(np.asarray(s["v_full"])[mask], 0.05, atol=1e-7)
    assert np.allclose(np.sort(np.asarray(s["u_full"])[mask]), u_before,
                       atol=1e-7)
    # densities still measured (subgrid/IO contract of hydro/None)
    rho = np.asarray(s["rho"])[mask]
    assert np.isfinite(rho).all() and (rho > 0).all()
