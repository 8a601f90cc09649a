"""Cosmological linear growth validation (EdS growing mode).

A small plane-wave density perturbation in an Einstein-de Sitter volume
with zero initial peculiar velocity must evolve as

    delta(a) = delta_0 * (3/5 (a/a0) + 2/5 (a/a0)^(-3/2))

(growing + decaying mode split).  This exercises the full comoving KDK
machinery end-to-end: cosmology integral tables, comoving drift/kick
factors, and the FMM+PM gravity in the expanding frame — the
SmallCosmoVolume-class physics gate of BASELINE.md.
"""

import numpy as np
import pytest

from swift_subtask_dev_tpu.engine import DMEngine, EngineConfig
from swift_subtask_dev_tpu.grid import CellGrid
from swift_subtask_dev_tpu.models.cosmology import Cosmology
from swift_subtask_dev_tpu.models.gravity import GravityParams, GravitySolver
from swift_subtask_dev_tpu.utils.units import COSMO_UNITS


def _mode_amplitude(pos, n_mean):
    """|density contrast| of the fundamental x mode from positions."""
    phase = np.exp(-2j * np.pi * pos[:, 0])
    return 2.0 * np.abs(phase.sum()) / len(pos)


@pytest.mark.parametrize("split_mesh", [False, True])
def test_eds_linear_growth(split_mesh):
    const = COSMO_UNITS.constants()
    a0, a1 = 0.1, 0.4
    cosmo = Cosmology(Omega_cdm=1.0, Omega_b=0.0, Omega_lambda=0.0,
                      h=0.7, a_begin=a0, a_end=a1, phys_const=const)
    G = const.const_newton_G
    H0 = float(cosmo.H(1.0))
    rho_crit = 3.0 * H0 * H0 / (8.0 * np.pi * G)

    # lattice + Zel'dovich x-displacement, zero peculiar velocity
    n = 12
    q = (np.arange(n) + 0.5) / n
    qx, qy, qz = np.meshgrid(q, q, q, indexing="ij")
    pos = np.stack([qx, qy, qz], axis=-1).reshape(-1, 3)
    delta0 = 0.02
    A = delta0 / (2.0 * np.pi)
    pos[:, 0] = np.mod(pos[:, 0] + A * np.sin(2 * np.pi * pos[:, 0]), 1.0)
    n_p = len(pos)
    m = np.full(n_p, rho_crit / n_p, np.float32)   # box volume = 1

    grid = CellGrid(box=(1.0, 1.0, 1.0), cdim=(8, 8, 8), K=16)
    gp = GravityParams(G=G, eps=2e-3, mesh_N=32)
    solver = GravitySolver(gp, grid)
    assert solver.use_fmm   # cosmological FMM regime exercised

    if split_mesh:
        # exercises the DM split-mesh timestep (kick.h:255 analog)
        def gfn(s):
            [(acc, pot)] = solver.short_range_accelerations([s])
            return acc, pot

        def mfn(s):
            [(acc, pot)] = solver.mesh_accelerations([s])
            return acc, pot
        mesh_kw = dict(mesh_fn=mfn, mesh_dt_scale=solver.pm.r_s)
    else:
        def gfn(s):
            [(acc, pot)] = solver.accelerations([s])
            return acc, pot
        mesh_kw = {}

    # ~64 KDK steps across [a0, a1]: dt_max = EdS elapsed time / 64
    t_span = 2.0 / (3.0 * H0) * (a1 ** 1.5 - a0 ** 1.5)
    cfg = EngineConfig(dt_max=float(t_span / 64), with_self_gravity=True,
                       p2p_reach=solver.pm.r_cut, eta_grav=gp.eta)
    eng = DMEngine(grid, cfg, 0.0, 0.0, gravity_fn=gfn,
                   eps_soft=gp.eps, cosmology=cosmo, **mesh_kw)
    eng.load_dm(pos, m, np.zeros((n_p, 3), np.float32))
    eng.init_particles()

    d_start = _mode_amplitude(pos, n_p)
    steps = 0
    while cosmo.a_of_ti(eng.timeline.ti_current) < a1 - 1e-9 \
            and steps < 400:
        eng.step()
        steps += 1

    corners = grid.cell_corners()
    off = np.asarray(eng.state["off"])
    maskf = np.asarray(eng.state["mask"]).reshape(-1) > 0
    pos_end = np.mod((corners[:, None, :] + off).reshape(-1, 3)[maskf],
                     1.0)
    d_end = _mode_amplitude(pos_end, n_p)

    x = a1 / a0
    expected = 0.6 * x + 0.4 * x ** -1.5
    ratio = d_end / d_start
    assert abs(ratio / expected - 1.0) < 0.08, \
        f"growth {ratio:.3f} vs EdS prediction {expected:.3f} " \
        f"({steps} steps)"
