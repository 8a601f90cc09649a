"""Engine integration tests: static equilibrium, conservation, time bins.

These play the role of the reference's examples/-level physics checks plus
the SWIFT_DEBUG_CHECKS invariants (space_check_timesteps etc.).
"""

import numpy as np
import jax.numpy as jnp

from swift_subtask_dev_tpu.engine import Engine, EngineConfig
from swift_subtask_dev_tpu.grid import CellGrid
from swift_subtask_dev_tpu.models.sph.sphenix import SPHENIXParams
from swift_subtask_dev_tpu.io.statistics import gas_statistics


def lattice_gas(n1=12, L=1.0, rho=1.0, u0=1.0, jitter=0.0, seed=0):
    dx = L / n1
    x = (np.arange(n1) + 0.5) * dx
    pos = np.stack(np.meshgrid(x, x, x, indexing="ij"), -1).reshape(-1, 3)
    if jitter:
        rng = np.random.default_rng(seed)
        pos = np.mod(pos + rng.normal(0, jitter * dx, pos.shape), L)
    N = len(pos)
    m = np.full(N, rho * L ** 3 / N, np.float32)
    u = np.full(N, u0, np.float32)
    h = np.full(N, 1.2348 * dx, np.float32)
    v = np.zeros((N, 3), np.float32)
    return pos, m, v, u, h


def make_engine(pos, m, v, u, h, L=1.0, t_end=1.0, dt_max=1e-3):
    # one fixed grid shape for every test in this file -> a single jit
    # compilation shared across tests (module-level jit cache)
    P = SPHENIXParams(h_max=float(L / 3 / P_KERNEL_GAMMA * 0.98))
    grid = CellGrid(box=(L, L, L), cdim=(3, 3, 3), K=64)
    grid.validate_range(float(h.max() * P.kernel.gamma))
    eng = Engine(grid, P, EngineConfig(dt_max=dt_max), 0.0, t_end)
    eng.load_particles(pos, m, v, u, h)
    return eng


P_KERNEL_GAMMA = SPHENIXParams().kernel.gamma


def test_static_uniform_gas_stays_static():
    """Uniform lattice at rest: zero net force, no motion (pressure balance).

    The SPH analog of the reference's testPeriodicBC: symmetric neighbor
    configurations must give |a| ~ roundoff.
    """
    pos, m, v, u, h = lattice_gas(n1=10)
    eng = make_engine(pos, m, v, u, h)
    eng.init_particles()
    for _ in range(3):
        eng.step()
    s = eng.state
    valid = np.asarray(s["mask"]) > 0
    vmax = np.abs(np.asarray(s["v_full"])[valid]).max()
    cs = np.asarray(s["soundspeed"])[valid].mean()
    # velocities stay tiny vs sound speed
    assert vmax < 1e-4 * cs, f"static lattice moved: vmax={vmax}, cs={cs}"


def test_conservation_random_velocities():
    """Energy and momentum conservation over many steps (statistics.c role)."""
    pos, m, v, u, h = lattice_gas(n1=10, jitter=0.05)
    rng = np.random.default_rng(42)
    v = rng.normal(0, 0.1, v.shape).astype(np.float32)
    eng = make_engine(pos, m, v, u, h, dt_max=2e-3)
    eng.init_particles()
    st0 = {k: np.asarray(x) for k, x in gas_statistics(eng.state).items()}
    for _ in range(6):
        eng.step()
    st1 = {k: np.asarray(x) for k, x in gas_statistics(eng.state).items()}
    # mass conservation is exact
    assert np.isclose(st0["total_mass"], st1["total_mass"], rtol=1e-6)
    # momentum drift small (f32 pairwise sums; SPH force is antisymmetric)
    p_scale = float(st0["total_mass"]) * 0.1
    assert np.abs(st1["momentum"] - st0["momentum"]).max() < 2e-3 * p_scale
    # total energy conserved over the steps
    de = abs(st1["e_tot"] - st0["e_tot"]) / abs(st0["e_tot"])
    assert de < 5e-3, f"energy drift {de:.2e}"


def test_time_bins_assigned():
    pos, m, v, u, h = lattice_gas(n1=10)
    # hot spot: make a few particles much hotter -> smaller dt -> lower bin
    u[:5] *= 100.0
    eng = make_engine(pos, m, v, u, h, dt_max=1e-2)
    diag = eng.init_particles()
    counts = np.asarray(diag["bin_counts"])
    assert counts.sum() == len(pos)
    bins = np.nonzero(counts)[0]
    assert len(bins) >= 2, "expected hot particles in a lower bin"
    assert counts[bins[0]] >= 5
    # stepping respects hierarchy: ti advances by the min bin
    eng.step()
    assert eng.timeline.ti_current > 0


def test_ghost_converges_h():
    """h-iteration drives wcount to the eta^3 target (runner_ghost role)."""
    pos, m, v, u, h = lattice_gas(n1=10, jitter=0.1)
    h_wrong = (h * 0.7).astype(np.float32)  # deliberately bad initial guess
    eng = make_engine(pos, m, v, u, h_wrong)
    eng.init_particles()
    s = eng.state
    valid = np.asarray(s["mask"]) > 0
    n_sum = (np.asarray(s["wcount"]) * np.asarray(s["h"]) ** 3)[valid]
    target = SPHENIXParams().eta_dim
    assert np.allclose(n_sum, target, rtol=2e-3), \
        f"h iteration did not converge: {n_sum.min()}..{n_sum.max()} vs {target}"
