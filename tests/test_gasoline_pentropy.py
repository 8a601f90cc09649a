"""PressureEntropy + Gasoline schemes (8th and 9th of the reference's 14,
src/hydro/PressureEntropy, src/hydro/Gasoline) through the scheme
interface: engine energy conservation, the Gasoline velocity-gradient
tensor against an imposed linear shear flow, and the extended
gradient-loop protocol (GRADIENT_J_EXTRA / GRADIENT_SUM_KEYS) matched
between the stencil backend and the O(N^2) oracle."""

import numpy as np
import jax.numpy as jnp

from swift_subtask_dev_tpu.engine import Engine, EngineConfig
from swift_subtask_dev_tpu.grid import CellGrid
from swift_subtask_dev_tpu.grid.cellgrid import bucket_fields, \
    global_positions
from swift_subtask_dev_tpu.models.sph.pressure_entropy import (
    PressureEntropyParams, entropy_from_internal_energy,
    internal_energy_from_entropy)
from swift_subtask_dev_tpu.models.sph.gasoline import GasolineParams
from swift_subtask_dev_tpu.models.sph import sphenix
from swift_subtask_dev_tpu.ics import uniform_box_ic
from swift_subtask_dev_tpu.ops import bruteforce, stencil


def test_pressure_entropy_engine_conserves_energy():
    ic = uniform_box_ic(n=6, jitter=0.1, seed=13)
    p = PressureEntropyParams(h_max=0.4)
    grid = CellGrid(box=(1.0, 1.0, 1.0), cdim=(3, 3, 3), K=48)
    eng = Engine(grid, p, EngineConfig(dt_max=5e-4), 0.0, 1.0)
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
        # P-A internal energy from the WEIGHTED density (hydro.h:199)
        rho_bar = np.asarray(s["rho_bar"])[mask]
        u = np.asarray(internal_energy_from_entropy(
            p, jnp.asarray(rho_bar), jnp.asarray(A)))
        return float((0.5 * m * (v ** 2).sum(-1) + m * u).sum())

    # the weighted density tracks the density closely on a jittered box
    rb = np.asarray(eng.state["rho_bar"])[mask]
    rho = np.asarray(eng.state["rho"])[mask]
    np.testing.assert_allclose(rb, rho, rtol=0.05)

    e0 = total_energy()
    for _ in range(6):
        eng.step()
    e1 = total_energy()
    assert abs(e1 - e0) / abs(e0) < 5e-4, (e0, e1)


def test_gasoline_velocity_gradient_tensor():
    """Impose v = S x on a jittered lattice: the density-loop tensor must
    recover S for interior particles (hydro_end_density's normalised
    velocity_gradient, hydro.h:566-580)."""
    ic = uniform_box_ic(n=8, jitter=0.05, seed=4)
    p = GasolineParams(h_max=0.3)
    S = np.array([[0.1, 0.3, 0.0],
                  [0.0, -0.2, 0.1],
                  [0.2, 0.0, 0.1]], np.float32)
    pos = np.asarray(ic["pos"], np.float32)
    v = pos @ S.T
    grid = CellGrid(box=(1.0, 1.0, 1.0), cdim=(4, 4, 4), K=48)
    n = len(pos)
    fields = {"m": jnp.asarray(ic["m"]), "v": jnp.asarray(v),
              "h": jnp.asarray(ic["h"]), "u": jnp.asarray(ic["u"]),
              "pid": jnp.arange(n, dtype=jnp.int32)}
    out, mask, off, n_over = bucket_fields(grid, jnp.asarray(pos), fields)
    assert int(n_over) == 0
    s = {"mask": mask, "off": off, **out}
    dens = stencil.density_loop(grid, s, p)
    full = p.mod.end_density(p, {**s, **dens},
                             sphenix.CosmoFactors.no_cosmo())

    flat_mask = np.asarray(mask).reshape(-1) > 0
    gpos = global_positions(grid, np.asarray(off)).reshape(-1, 3)[flat_mask]
    h = np.asarray(out["h"]).reshape(-1)[flat_mask]
    reach = float(p.kernel.gamma) * h
    interior = ((gpos > reach[:, None] + 0.02)
                & (gpos < 1.0 - reach[:, None] - 0.02)).all(axis=1)
    assert interior.sum() > 50
    for i in range(3):
        for j in range(3):
            got = np.asarray(full[f"vgrad{i}{j}"]).reshape(-1)[flat_mask]
            got = got[interior]
            np.testing.assert_allclose(got.mean(), S[i, j], atol=0.02)


def test_gasoline_gradient_loop_matches_bruteforce():
    """The extended gradient-loop protocol: shock_limiter/wncount_ngb sums
    and the J-extra plumbing, stencil vs O(N^2) oracle."""
    ic = uniform_box_ic(n=6, jitter=0.15, seed=5)
    p = GasolineParams(h_max=0.4)
    grid = CellGrid(box=(1.0, 1.0, 1.0), cdim=(3, 3, 3), K=48)
    n = len(ic["pos"])
    rng = np.random.default_rng(2)
    fields = {
        "m": jnp.asarray(ic["m"]), "v": jnp.asarray(ic["v"]),
        "h": jnp.asarray(ic["h"]), "u": jnp.asarray(ic["u"]),
        "rho": jnp.asarray(1.0 + 0.1 * rng.random(n), jnp.float32),
        "soundspeed": jnp.asarray(0.9 + 0.1 * rng.random(n), jnp.float32),
        "alpha_visc": jnp.asarray(0.5 * rng.random(n), jnp.float32),
        "shock_indicator": jnp.asarray(rng.normal(size=n), jnp.float32),
        "tensor_norm": jnp.asarray(rng.random(n), jnp.float32),
        "pid": jnp.arange(n, dtype=jnp.int32),
    }
    out, mask, off, n_over = bucket_fields(grid, jnp.asarray(ic["pos"]),
                                           fields)
    assert int(n_over) == 0
    s = {"mask": mask, "off": off, **out,
         "v_sig": jnp.zeros_like(mask),
         "alpha_visc_max_ngb": jnp.zeros_like(mask)}
    cosmo = sphenix.CosmoFactors.no_cosmo()
    got = stencil.gradient_loop(grid, s, p, cosmo)

    flat_mask = np.asarray(mask).reshape(-1) > 0
    pid = np.asarray(out["pid"]).reshape(-1)[flat_mask]
    order = np.argsort(pid)
    pos = global_positions(grid, np.asarray(off)).reshape(-1, 3)[flat_mask]

    def flat(name, outdict=None):
        src = np.asarray((outdict or s)[name])
        return src.reshape((-1,) + src.shape[2:])[flat_mask][order]

    nn = len(pid)
    ref = bruteforce.gradient_bruteforce(
        p, jnp.asarray(pos[order]), jnp.asarray(flat("h")),
        jnp.asarray(flat("m")), jnp.asarray(flat("v")),
        jnp.asarray(flat("u")), jnp.asarray(flat("rho")),
        jnp.asarray(flat("soundspeed")), jnp.asarray(flat("alpha_visc")),
        jnp.zeros(nn, jnp.float32), jnp.zeros(nn, jnp.float32),
        cosmo, box=(1.0, 1.0, 1.0),
        extra={"shock_indicator": jnp.asarray(flat("shock_indicator")),
               "tensor_norm": jnp.asarray(flat("tensor_norm"))})
    for k in ("shock_limiter", "wncount_ngb", "v_sig"):
        np.testing.assert_allclose(flat(k, got), np.asarray(ref[k]),
                                   rtol=2e-3, atol=1e-5, err_msg=k)


def test_gasoline_engine_conserves_energy():
    ic = uniform_box_ic(n=6, jitter=0.1, seed=17)
    p = GasolineParams(h_max=0.4)
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


def test_pressure_energy_mm_alpha_and_conservation():
    """Morris & Monaghan variable alpha: grows under compression, decays
    toward alpha_min in quiescence (hydro.h:745-765); engine conserves."""
    import jax.numpy as jnp
    from swift_subtask_dev_tpu.models.sph.pressure_energy_mm import (
        PressureEnergyMMParams)
    p = PressureEnergyMMParams(h_max=0.4)
    cosmo = sphenix.CosmoFactors.no_cosmo()
    s = {"h": jnp.full(2, 0.1, jnp.float32),
         "soundspeed": jnp.full(2, 1.0, jnp.float32),
         "div_v": jnp.asarray([-5.0, 0.0], jnp.float32),
         "alpha_visc": jnp.full(2, 0.8, jnp.float32)}
    out = p.mod.prepare_force(p, s, cosmo, jnp.float32(0.01))
    a = np.asarray(out["alpha_visc"])
    assert a[0] > 0.8          # compression -> alpha grows
    assert a[1] < 0.8          # quiescent -> decays toward alpha_min
    assert a[1] >= p.viscosity_alpha_min

    ic = uniform_box_ic(n=6, jitter=0.1, seed=21)
    grid = CellGrid(box=(1.0, 1.0, 1.0), cdim=(3, 3, 3), K=48)
    eng = Engine(grid, p, EngineConfig(dt_max=5e-4), 0.0, 1.0)
    eng.load_particles(ic["pos"], ic["m"], ic["v"], ic["u"], ic["h"])
    eng.init_particles()
    mask = np.asarray(eng.state["mask"]) > 0

    def total_energy():
        st = eng.state
        m = np.asarray(st["m"])[mask]
        v = np.asarray(st["v_full"])[mask]
        u = np.asarray(st["u_full"])[mask]
        return float((0.5 * m * (v ** 2).sum(-1) + m * u).sum())

    e0 = total_energy()
    for _ in range(6):
        eng.step()
    e1 = total_energy()
    assert abs(e1 - e0) / abs(e0) < 1e-4, (e0, e1)
