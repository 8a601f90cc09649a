"""Gadget2 entropy scheme (reference src/hydro/Gadget2) through the scheme
interface: oracle match for the force loop + an engine run conserving
total energy (kinetic + internal-from-entropy)."""

import numpy as np
import jax.numpy as jnp

from swift_subtask_dev_tpu.engine import Engine, EngineConfig
from swift_subtask_dev_tpu.grid import CellGrid
from swift_subtask_dev_tpu.grid.cellgrid import bucket_fields, \
    global_positions
from swift_subtask_dev_tpu.models.sph.gadget2 import (
    Gadget2Params, entropy_from_internal_energy,
    internal_energy_from_entropy)
from swift_subtask_dev_tpu.models.sph import sphenix
from swift_subtask_dev_tpu.ics import uniform_box_ic
from swift_subtask_dev_tpu.ops import bruteforce, stencil


def test_gadget2_force_loop_matches_bruteforce():
    ic = uniform_box_ic(n=6, jitter=0.15, seed=3)
    p = Gadget2Params(h_max=0.4)
    grid = CellGrid(box=(1.0, 1.0, 1.0), cdim=(3, 3, 3), K=48)
    n = len(ic["pos"])
    rng = np.random.default_rng(0)
    fields = {
        "m": jnp.asarray(ic["m"]), "v": jnp.asarray(ic["v"]),
        "h": jnp.asarray(ic["h"]),
        "u": jnp.asarray(ic["u"]),            # entropy slot for Gadget2
        "rho": jnp.asarray(1.0 + 0.1 * rng.random(n), jnp.float32),
        "pressure": jnp.asarray(0.5 + 0.1 * rng.random(n), jnp.float32),
        "soundspeed": jnp.asarray(0.9 + 0.1 * rng.random(n), jnp.float32),
        "f_gradh": jnp.asarray(0.9 + 0.1 * rng.random(n), jnp.float32),
        "balsara": jnp.asarray(0.8 * rng.random(n), jnp.float32),
        "alpha_visc": jnp.full((n,), 0.8, jnp.float32),
        "alpha_diff": jnp.zeros((n,), jnp.float32),
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

    np.testing.assert_allclose(flat("a_hydro", got), np.asarray(
        ref["a_hydro"]), rtol=2e-3, atol=1e-5)
    np.testing.assert_allclose(flat("u_dt", got), np.asarray(ref["u_dt"]),
                               rtol=2e-3, atol=1e-6)


def test_gadget2_engine_conserves_energy():
    ic = uniform_box_ic(n=6, jitter=0.1, seed=9)
    p = Gadget2Params(h_max=0.4)
    grid = CellGrid(box=(1.0, 1.0, 1.0), cdim=(3, 3, 3), K=48)
    eng = Engine(grid, p, EngineConfig(dt_max=5e-4), 0.0, 1.0)
    # entropy ICs from the standard internal-energy ICs at rho ~ 1
    A0 = np.asarray(entropy_from_internal_energy(
        p, np.ones(len(ic["m"]), np.float32), ic["u"]))
    eng.load_particles(ic["pos"], ic["m"], ic["v"], A0, ic["h"])
    eng.init_particles()
    mask = np.asarray(eng.state["mask"]) > 0

    def total_energy():
        s = eng.state
        m = np.asarray(s["m"])[mask]
        v = np.asarray(s["v_full"])[mask]
        A = np.asarray(s["u_full"])[mask]
        rho = np.asarray(s["rho"])[mask]
        u = np.asarray(internal_energy_from_entropy(
            p, jnp.asarray(rho), jnp.asarray(A)))
        return float((0.5 * m * (v ** 2).sum(-1) + m * u).sum())

    e0 = total_energy()
    for _ in range(6):
        eng.step()
    e1 = total_energy()
    assert abs(e1 - e0) / abs(e0) < 5e-4, (e0, e1)
