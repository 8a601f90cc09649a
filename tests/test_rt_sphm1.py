"""SPHM1RT transport (rt/SPHM1RT; Chan+2021 SPH-operator discretisation):
photon-energy conservation, free-streaming advection at ~c_red, and
interchangeability with the GEAR finite-volume scheme on the same state."""

import jax
import jax.numpy as jnp
import numpy as np

from swift_subtask_dev_tpu.rt.gear import (RTParams, _abs_positions,
                                           _volumes, rt_init_state)
from swift_subtask_dev_tpu.rt.sphm1 import sphm1_transport_loop

from test_rt import _static_gas


def _blob_state(grid, s, rt):
    pos = np.asarray(_abs_positions(grid, s["off"]))
    r2 = ((pos - 0.5) ** 2).sum(-1)
    blob = np.exp(-r2 / (2 * 0.08 ** 2)).astype(np.float32) \
        * np.asarray(s["mask"])
    E = jnp.asarray(blob)[..., None]
    F = jnp.zeros(E.shape + (3,)).at[..., 0].set(rt.c_red * E)
    return {**s, "rt_E": E, "rt_F": F}, pos, blob


def test_sphm1_conserves_and_streams():
    grid, s, p, rho0 = _static_gas(n=10)
    rt = RTParams(ngroups=1, c_red=1.0, sigma=(0.0,), e_photon=(1.0,))
    s = rt_init_state(s, rt)
    s, pos, blob = _blob_state(grid, s, rt)

    # conservation measure of the per-mass scheme: sum m * xi == sum V*E
    V = np.asarray(_volumes(s)) * np.asarray(s["mask"])
    tot0 = float((V * blob).sum())
    x0 = float((V * blob * pos[..., 0]).sum()) / tot0

    dt = 0.25 * float(np.asarray(s["h"]).max())
    step = jax.jit(lambda st: sphm1_transport_loop(grid, st, p, rt, dt))
    nstep = 6
    for _ in range(nstep):
        s = step(s)
    E1 = np.asarray(s["rt_E"][..., 0])
    tot1 = float((V * E1).sum())
    # conservation: the |F| <= cE unphysical clamp may shave a little
    np.testing.assert_allclose(tot1, tot0, rtol=2e-2)
    assert np.all(E1 >= 0)
    x1 = float((V * E1 * pos[..., 0]).sum()) / tot1
    moved = x1 - x0
    want = rt.c_red * dt * nstep
    assert 0.4 * want < moved < 1.4 * want, (moved, want)


def test_sphm1_isotropic_stays_finite_and_positive():
    """Uniform isotropic radiation field: the SPH operators of a uniform
    field are zero up to particle noise; dissipation keeps it bounded."""
    grid, s, p, rho0 = _static_gas(n=8)
    rt = RTParams(ngroups=1, c_red=1.0, sigma=(0.0,), e_photon=(1.0,))
    s = rt_init_state(s, rt)
    E = jnp.ones_like(s["m"])[..., None] * s["mask"][..., None]
    s = {**s, "rt_E": E, "rt_F": jnp.zeros(E.shape + (3,))}
    dt = 0.25 * float(np.asarray(s["h"]).max())
    step = jax.jit(lambda st: sphm1_transport_loop(grid, st, p, rt, dt))
    for _ in range(4):
        s = step(s)
    E1 = np.asarray(s["rt_E"][..., 0])
    mask = np.asarray(s["mask"]) > 0
    assert np.isfinite(E1).all()
    np.testing.assert_allclose(E1[mask], 1.0, atol=0.1)
