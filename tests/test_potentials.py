"""External potential tests — GravityTests/Hernquist_circularorbit analog.

A particle on a circular orbit around a point mass / Hernquist halo must
conserve its radius over many orbits with the DM engine.
"""

import numpy as np
import jax.numpy as jnp

from swift_subtask_dev_tpu.engine import DMEngine, EngineConfig
from swift_subtask_dev_tpu.grid import CellGrid, global_positions
from swift_subtask_dev_tpu.models.potentials import (
    PointMass, Hernquist, NFW, external_gravity_timestep)


def test_potential_values():
    pm = PointMass(G=1.0, M=2.0, centre=(0.0, 0.0, 0.0))
    pos = jnp.asarray([[1.0, 0.0, 0.0]])
    acc, pot = pm(pos)
    np.testing.assert_allclose(np.asarray(acc)[0], [-2.0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(pot)[0], -2.0, atol=1e-6)

    h = Hernquist(G=1.0, M=1.0, a=0.5, centre=(0.0, 0.0, 0.0))
    acc, pot = h(pos)
    np.testing.assert_allclose(np.asarray(pot)[0], -1 / 1.5, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(acc)[0, 0], -1 / (1 * 1.5 ** 2),
                               rtol=1e-6)

    n = NFW(G=1.0, M_200=1.0, R_200=1.0, c=5.0, centre=(0.0, 0.0, 0.0))
    acc, pot = n(jnp.asarray([[2.0, 0.0, 0.0]]))
    # beyond R_200 with x=10: enclosed mass > M_200 slightly; attraction
    assert np.asarray(acc)[0, 0] < 0


def test_circular_orbit_point_mass():
    """Circular orbit keeps its radius (KDK symplectic property)."""
    G, M, R = 1.0, 1.0, 0.2
    centre = (0.5, 0.5, 0.5)
    v_circ = np.sqrt(G * M / R)
    pot = PointMass(G=G, M=M, centre=centre)

    grid = CellGrid(box=(1.0, 1.0, 1.0), cdim=(3, 3, 3), K=8)

    def gfn(s):
        pos = jnp.asarray(np.asarray(grid.cell_corners()), jnp.float32)[
            :, None, :] + s["off"]
        acc, _ = pot(pos)
        return acc * s["mask"][..., None]

    eng = DMEngine(grid, EngineConfig(dt_max=2e-3, eta_grav=0.025),
                   0.0, 10.0, gravity_fn=gfn, eps_soft=0.05)
    pos0 = np.array([[0.5 + R, 0.5, 0.5]])
    v0 = np.array([[0.0, v_circ, 0.0]], np.float32)
    eng.load_dm(pos0, np.array([1e-10], np.float32), v0)
    eng.init_particles()
    # ~2 orbits: T = 2 pi R / v = 2 pi sqrt(R^3/GM) = 0.562
    t_end = 2 * 2 * np.pi * np.sqrt(R ** 3 / (G * M))
    radii = []
    while eng.time < t_end:
        eng.step()
        p = global_positions(eng.grid, np.asarray(eng.state["off"]))
        mask = np.asarray(eng.state["mask"]) > 0
        r = np.linalg.norm(p[mask][0] - np.array(centre))
        radii.append(r)
    radii = np.array(radii)
    # radius conserved to < 1% over 2 orbits
    assert np.abs(radii - R).max() < 0.01 * R, \
        f"orbit drift: {np.abs(radii - R).max() / R:.3%}"
