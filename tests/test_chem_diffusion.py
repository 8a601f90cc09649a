"""GEAR_DIFFUSION turbulent metal diffusion.

Reference: src/chemistry/GEAR_DIFFUSION — Smagorinsky diffusion
coefficient D = C |S| h^2 from the traceless symmetric velocity shear
(chemistry.h:243-291) and pairwise metal exchange in the force loop
(chemistry_iact.h runner_iact_diffusion).
"""

import numpy as np
import jax.numpy as jnp

from swift_subtask_dev_tpu.engine import CosmoFactors, EngineConfig
from swift_subtask_dev_tpu.engine_multi import MultiEngine
from swift_subtask_dev_tpu.grid import CellGrid
from swift_subtask_dev_tpu.grid.cellgrid import bucket_fields
from swift_subtask_dev_tpu.models.sph.sphenix import SPHENIXParams
from swift_subtask_dev_tpu.ics import uniform_box_ic
from swift_subtask_dev_tpu.ops import stencil as st


def _gas_state(grid, pos, v, Z):
    n = len(pos)
    ef = np.zeros((n, 9), np.float32)
    ef[:, 0], ef[:, 1] = 0.752, 0.248
    ef[:, 8] = Z
    fields = {
        "m": jnp.ones((n,), jnp.float32),
        "h": jnp.full((n,), 0.08, jnp.float32),
        "rho": jnp.full((n,), 500.0, jnp.float32),
        "v": jnp.asarray(v, jnp.float32),
        "Z": jnp.asarray(Z, jnp.float32),
        "elem_frac": jnp.asarray(ef),
    }
    out, mask, off, n_over = bucket_fields(grid, jnp.asarray(pos), fields)
    assert int(n_over) == 0
    return {"mask": mask, "off": off, **out}


def test_shear_loop_zero_for_rigid_flow():
    """Uniform translation has no shear: D == 0 (trace-free S == 0)."""
    grid = CellGrid(box=(1.0, 1.0, 1.0), cdim=(4, 4, 4), K=32)
    P = SPHENIXParams(h_max=0.3)
    ic = uniform_box_ic(n=8, jitter=0.03, seed=2)
    v = np.tile(np.asarray([1.0, -2.0, 0.5], np.float32),
                (len(ic["pos"]), 1))
    s = _gas_state(grid, ic["pos"], v, np.zeros(len(ic["pos"]),
                                                np.float32))
    D = st.chemistry_shear_diff_loop(grid, s, P, 0.01,
                                     CosmoFactors.no_cosmo())
    mask = np.asarray(s["mask"]) > 0
    np.testing.assert_allclose(np.asarray(D)[mask], 0.0, atol=1e-5)


def test_shear_loop_positive_under_shear():
    """A linear shear flow v_x = 4 z gives |S| > 0 and D > 0."""
    grid = CellGrid(box=(1.0, 1.0, 1.0), cdim=(4, 4, 4), K=32)
    P = SPHENIXParams(h_max=0.3)
    ic = uniform_box_ic(n=8, jitter=0.03, seed=2)
    pos = ic["pos"]
    v = np.zeros((len(pos), 3), np.float32)
    v[:, 0] = 4.0 * (pos[:, 2] - 0.5)
    s = _gas_state(grid, pos, v, np.zeros(len(pos), np.float32))
    D = st.chemistry_shear_diff_loop(grid, s, P, 0.01,
                                     CosmoFactors.no_cosmo())
    mask = np.asarray(s["mask"]) > 0
    # interior particles (periodic wrap breaks the linear profile at the
    # z edges) must all see the same shear
    zc = np.zeros(mask.shape + (3,), np.float32)
    interior = np.asarray(D)[mask] > 0
    assert interior.mean() > 0.6, "shear detected across the box"


def test_diffusion_smooths_a_metal_step():
    """A sharp Z step diffuses down under shear: variance decreases,
    total metal mass is conserved."""
    grid = CellGrid(box=(1.0, 1.0, 1.0), cdim=(4, 4, 4), K=32)
    P = SPHENIXParams(h_max=0.3)
    ic = uniform_box_ic(n=8, jitter=0.03, seed=4)
    pos = ic["pos"]
    v = np.zeros((len(pos), 3), np.float32)
    v[:, 0] = 4.0 * (pos[:, 2] - 0.5)    # shear drives D > 0
    Z = np.where(pos[:, 0] < 0.5, 0.02, 0.0).astype(np.float32)
    s = _gas_state(grid, pos, v, Z)
    D = st.chemistry_shear_diff_loop(grid, s, P, 1.0,
                                     CosmoFactors.no_cosmo())
    dZ_dt, dfrac_dt = st.chemistry_diffusion_loop(
        grid, {**s, "diff_coef": D}, P, CosmoFactors.no_cosmo())
    mask = np.asarray(s["mask"]) > 0
    dZ = np.asarray(dZ_dt)[mask]
    Zm = np.asarray(s["Z"])[mask]
    m = np.asarray(s["m"])[mask]
    # rich side loses, poor side gains
    assert float(dZ[Zm > 0.01].mean()) < 0
    assert float(dZ[Zm < 0.01].mean()) > 0
    # pairwise exchange conserves total metal mass (close to exactly:
    # uniform h makes the nonsym sums antisymmetric)
    total = float((m * dZ).sum())
    scale = float(np.abs(m * dZ).sum())
    assert abs(total) < 1e-3 * max(scale, 1e-30)
    # elem_frac metal channel moves with Z
    de = np.asarray(dfrac_dt)[mask][:, 8]
    np.testing.assert_allclose(de, dZ, rtol=1e-4)


def test_diffusion_in_multi_engine():
    """End-to-end: the step consumes EngineConfig.chem_diffusion and
    relaxes a metallicity step without changing the total."""
    ic = uniform_box_ic(n=8, jitter=0.05, seed=6)
    pos = ic["pos"]
    P = SPHENIXParams(h_max=0.3)
    grid = CellGrid(box=(1.0, 1.0, 1.0), cdim=(4, 4, 4), K=32)
    eng = MultiEngine(grid, P,
                      EngineConfig(dt_max=1e-3, chem_diffusion=100.0),
                      0.0, 1.0)
    Z = np.where(pos[:, 0] < 0.5, 0.02, 0.0).astype(np.float32)
    ef = np.zeros((len(pos), 9), np.float32)
    ef[:, 0], ef[:, 1], ef[:, 8] = 0.752, 0.248, Z
    v = np.zeros_like(ic["v"])
    v[:, 0] = 1.0 * (pos[:, 2] - 0.5)
    eng.load_gas(pos, ic["m"], v, ic["u"], ic["h"], Z=Z, elem_frac=ef)
    eng.init_particles()
    g0 = eng.state["gas"]
    m0 = np.asarray(g0["mask"]) > 0
    Z0 = np.asarray(g0["Z"])[m0]
    M_meta0 = float((np.asarray(g0["m"])[m0] * Z0).sum())
    var0 = float(Z0.var())
    for _ in range(5):
        eng.step()
    g = eng.state["gas"]
    mask = np.asarray(g["mask"]) > 0
    Z1 = np.asarray(g["Z"])[mask]
    M_meta1 = float((np.asarray(g["m"])[mask] * Z1).sum())
    assert Z1.var() < var0, "diffusion reduces the metallicity contrast"
    np.testing.assert_allclose(M_meta1, M_meta0, rtol=1e-3)
