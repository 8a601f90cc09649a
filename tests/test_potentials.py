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


# ---------------------------------------------------------------------------
# Round-3: the full potential/ stack (11 potentials) + the YAML factory
# ---------------------------------------------------------------------------

def _grad_check(pot_obj, points, rtol=2e-3):
    """acc must equal -grad(potential) — AD oracle for consistency."""
    import jax

    def phi(x):
        return pot_obj(x[None])[1][0]

    for x in points:
        x = jnp.asarray(x, jnp.float32)
        acc = np.asarray(pot_obj(x[None])[0][0])
        g = np.asarray(jax.grad(phi)(x))
        np.testing.assert_allclose(acc, -g, rtol=rtol, atol=1e-5)


def test_all_potentials_grad_consistency():
    from swift_subtask_dev_tpu.models.potentials import (
        PointMassSoftened, HernquistSDMH05, NFW_MN, DiscPatch, SineWave,
        IsothermalPotential, ConstantField)

    pts = [[0.31, 0.52, 0.77], [1.4, -0.2, 0.6], [-0.8, 0.9, -1.1]]
    _grad_check(PointMassSoftened(G=1.0, M=2.0, centre=(0., 0., 0.),
                                  softening=0.1), pts)
    _grad_check(HernquistSDMH05(G=1.0, M_200=1.0, R_200=1.0, c=8.0,
                                centre=(0., 0., 0.)), pts)
    _grad_check(NFW_MN(G=1.0, M_200=1.0, c=8.0, rho_c=200.0,
                       Mdisk=0.1, Rdisk=0.3, Zdisk=0.05,
                       centre=(0., 0., 0.)), pts)
    # disc patch: inside the untruncated region only (potential frozen
    # beyond x_trunc by construction, as in the reference)
    _grad_check(DiscPatch(G=1.0, surface_density=10.0, scale_height=0.2,
                          x_disc=0.0, x_trunc=5.0, x_max=8.0), pts)
    _grad_check(SineWave(amplitude=2.0, box_len=1.0), pts)
    _grad_check(IsothermalPotential(v_rot=1.5, centre=(0., 0., 0.),
                                    softening=0.05), pts)
    _grad_check(ConstantField(g=(0.0, 0.0, -9.8)), pts)


def test_disc_patch_truncation():
    from swift_subtask_dev_tpu.models.potentials import DiscPatch
    dp = DiscPatch(G=1.0, surface_density=10.0, scale_height=0.2,
                   x_disc=0.0, x_trunc=1.0, x_max=2.0)
    acc, _ = dp(jnp.asarray([[0.5, 0, 0], [1.5, 0, 0], [2.5, 0, 0]],
                            jnp.float32))
    acc = np.asarray(acc)
    assert acc[0, 0] < 0                      # toward the disc
    assert abs(acc[1, 0]) < abs(acc[0, 0])    # tapered
    assert acc[2, 0] == 0.0                   # beyond x_max: zero


def test_potential_factory():
    from swift_subtask_dev_tpu.models.potentials import (
        potential_from_params, NFW_MN, PointMassSoftened, DiscPatch)
    from swift_subtask_dev_tpu.utils import Params, UnitSystem

    const = UnitSystem(1.0, 1.0, 1.0, 1.0, 1.0).constants()
    box = (2.0, 2.0, 2.0)

    p = Params({"NFW_MNPotential": {
        "position": [0.0, 0.0, 0.0], "useabspos": 0,
        "timestep_mult": 0.01, "concentration": 8.0, "M_200": 1.0,
        "critical_density": 200.0, "Mdisk": 0.1, "Rdisk": 0.3,
        "Zdisk": 0.05}})
    pot, mult, _ = potential_from_params(p, const, box)
    assert isinstance(pot, NFW_MN)
    assert pot.centre == (1.0, 1.0, 1.0)      # useabspos=0 -> box centre
    assert mult == 0.01

    p = Params({"PointMassPotential": {
        "position": [1.0, 1.0, 1.0], "useabspos": 1, "mass": 3.0,
        "softening": 0.1}})
    pot, _, eps = potential_from_params(p, const, box)
    assert isinstance(pot, PointMassSoftened) and eps == 0.1

    p = Params({"DiscPatchPotential": {
        "surface_density": 10.0, "scale_height": 0.2, "x_disc": 1.0}})
    pot, _, _ = potential_from_params(p, const, box)
    assert isinstance(pot, DiscPatch)

    assert potential_from_params(Params({}), const, box) is None


def test_cli_external_gravity_orbit(tmp_path):
    """CLI --external-gravity only: a DM particle on a circular orbit
    around a PointMassPotential keeps its radius (the reference's
    Hernquist_circularorbit example surface)."""
    import subprocess
    import sys
    from swift_subtask_dev_tpu.io.snapshot import (write_snapshot,
                                                   read_snapshot,
                                                   PTYPE_DM)

    # internal units with G = 1: UnitMass = 1/G_cgs grams
    # (the CLI computes G from the unit system, like phys_const.c)
    from swift_subtask_dev_tpu.utils.constants import NEWTON_G_CGS
    G, M, R = 1.0, 1.0, 0.2
    v_circ = np.sqrt(G * M / R)
    ic_path = str(tmp_path / "ic.hdf5")
    write_snapshot(ic_path, (1.0, 1.0, 1.0), 0.0, {PTYPE_DM: {
        "Coordinates": np.array([[0.5 + R, 0.5, 0.5]]),
        "Velocities": np.array([[0.0, v_circ, 0.0]], np.float32),
        "Masses": np.array([1e-10], np.float32),
        "ParticleIDs": np.arange(1, dtype=np.uint64),
    }})
    t_orbit = 2 * np.pi * np.sqrt(R ** 3 / (G * M))
    (tmp_path / "run.yml").write_text(f"""
InternalUnitSystem:
  UnitMass_in_cgs: {1.0 / NEWTON_G_CGS:.9e}
  UnitLength_in_cgs: 1.0
  UnitVelocity_in_cgs: 1.0
TimeIntegration:
  time_begin: 0.0
  time_end:   {t_orbit:.6f}
  dt_max:     2e-3
InitialConditions:
  file_name: {ic_path}
PointMassPotential:
  position: [0.5, 0.5, 0.5]
  useabspos: 1
  mass: {M}
  timestep_mult: 0.025
  softening: 0.02
Snapshots:
  basename: {tmp_path / 'snap'}
""")
    r = subprocess.run(
        [sys.executable, "-m", "swift_subtask_dev_tpu.cli",
         str(tmp_path / "run.yml"), "--external-gravity", "--cpu"],
        capture_output=True, text=True, timeout=900, cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-3000:]
    snaps = sorted(tmp_path.glob("snap_*.hdf5"))
    assert snaps
    _, parts, _ = read_snapshot(str(snaps[-1]))
    pos = np.asarray(parts[PTYPE_DM]["Coordinates"])[0]
    r_final = np.linalg.norm(pos - 0.5)
    assert abs(r_final - R) < 0.02 * R, f"orbit radius drift: {r_final}"
