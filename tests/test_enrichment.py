"""EAGLE stellar enrichment (feedback/EAGLE/enrichment.h analog):
IMF-integrated AGB+SNII mass return and SNIa metals, distributed
kernel-weighted to gas with exact mass/momentum bookkeeping."""

import numpy as np
import jax.numpy as jnp

from swift_subtask_dev_tpu.engine import EngineConfig
from swift_subtask_dev_tpu.engine_multi import MultiEngine
from swift_subtask_dev_tpu.grid import CellGrid
from swift_subtask_dev_tpu.ics import uniform_box_ic
from swift_subtask_dev_tpu.models.sph.sphenix import SPHENIXParams
from swift_subtask_dev_tpu.subgrid.enrichment import (EagleEnrichment,
                                                      chabrier_imf)


def test_imf_normalisation_and_return_fraction():
    en = EagleEnrichment()
    lg = np.asarray(en.log_m_grid)
    m = 10.0 ** lg
    # cumulative ejecta per Msun formed: positive, below ~0.6
    ej_tot = en.cum_ej[-1]
    assert 0.2 < ej_tot < 0.6, ej_tot
    # SNII metal yield below total ejecta (every Z-bin table)
    for tab in en.cum_Z_snii:
        assert 0.0 < tab[-1] < ej_tot
    # dN/dlog m turns over near 0.08 Msun (Chabrier lognormal peak)
    assert (chabrier_imf(0.01) * 0.01
            < chabrier_imf(0.08) * 0.08), "no lognormal turnover"
    assert (chabrier_imf(3.0) * 3.0
            < chabrier_imf(0.3) * 0.3), "high-mass slope not falling"


def test_dying_mass_inversion():
    en = EagleEnrichment()
    for m in (1.0, 8.0, 40.0):
        t = 10.0 * m ** -2.5
        np.testing.assert_allclose(float(en.dying_mass(t)), m, rtol=1e-5)
    # young stars: nothing has died yet
    assert float(en.dying_mass(1e-6)) == 100.0


def test_ejecta_windows():
    en = EagleEnrichment()
    ef = jnp.zeros(9).at[0].set(0.75).at[1].set(0.25)
    # age window covering the whole SNII range (lifetimes of 8..100)
    t8 = 10.0 * 8.0 ** -2.5
    dm, dmZ, de = en.ejecta(jnp.float32(1.0), jnp.float32(0.0), ef,
                            jnp.float32(1e-6), jnp.float32(t8))
    assert float(dm) > 0.05          # SNII ejecta
    assert float(dmZ) > 0.005        # new metals
    # element masses sum to the ejected mass
    np.testing.assert_allclose(float(de.sum()), float(dm), rtol=0.05)
    # oxygen dominates the SNII metal yield
    assert float(de[4]) > float(de[8])
    # a window before any star dies ejects nothing
    dm0, _, _ = en.ejecta(jnp.float32(1.0), jnp.float32(0.0), ef,
                          jnp.float32(1e-8), jnp.float32(5e-7))
    assert float(dm0) == 0.0


def test_yields_depend_on_metallicity():
    """The synthesized tables carry the reference's Z axis
    (yield_tables.h): SNII metal yield falls with Z, AGB rises, the AGB
    N/C ratio rises, and metal-rich stars of the same mass live longer
    (Portinari lifetime factor)."""
    en = EagleEnrichment()
    ef = jnp.zeros(9).at[0].set(0.75).at[1].set(0.25)
    t8 = 10.0 * 8.0 ** -2.5

    def mz_snii(Z):
        m_hi = en.dying_mass(jnp.float32(1e-6), jnp.float32(Z))
        m_lo = en.dying_mass(jnp.float32(t8), jnp.float32(Z))
        return float(en.window_z(en.cum_Z_snii, m_lo, m_hi,
                                 jnp.float32(Z)))

    assert mz_snii(0.0004) > mz_snii(0.04)

    # AGB window: ages past the 8-Msun lifetime up to ~1 Msun's
    t1 = 10.0 * 1.0 ** -2.5
    def agb(Z):
        Zj = jnp.float32(Z)
        _, dmZ, de = en.ejecta(jnp.float32(1.0), Zj, ef,
                               jnp.float32(t8 * 1.3), jnp.float32(t1))
        return float(dmZ), float(de[3]) / max(float(de[2]), 1e-30)

    mz_lo, nc_lo = agb(0.0004)
    mz_hi, nc_hi = agb(0.019)
    assert mz_hi > mz_lo          # secondary production rises with Z
    assert nc_hi > nc_lo          # N/C ratio rises with Z

    # lifetimes: metal-rich stars die LATER -> at fixed age the dying
    # mass is larger
    assert float(en.dying_mass(jnp.float32(1.0), jnp.float32(0.04))) \
        > float(en.dying_mass(jnp.float32(1.0), jnp.float32(0.0004)))


def test_engine_enrichment_conserves_and_enriches():
    ic = uniform_box_ic(n=6, jitter=0.08, seed=13)
    n = len(ic["pos"])
    p = SPHENIXParams(h_max=0.18)
    grid = CellGrid(box=(1.0, 1.0, 1.0), cdim=(3, 3, 3), K=64)
    en = EagleEnrichment()   # internal units: Msun=1, Gyr=1
    eng = MultiEngine(grid, p, EngineConfig(dt_max=5e-4), 0.0, 1.0,
                      enrichment=en)
    Z0 = np.zeros(n, np.float32)
    ef0 = np.tile(np.array([0.752, 0.248] + [0.0] * 7, np.float32),
                  (n, 1))
    eng.load_gas(ic["pos"], ic["m"], ic["v"], ic["u"],
                 np.minimum(ic["h"], 0.18), Z=Z0, elem_frac=ef0)
    eng.load_stars(np.array([[0.5, 0.5, 0.5]]), np.array([0.05]),
                   np.zeros((1, 3)), h=np.array([0.15]))
    # make the star eligible: born just after t=0 (loaded stars carry
    # birth_time=0 and never enrich, matching the feedback gate)
    st = eng.state["stars"]
    eng.state["stars"] = {**st, "birth_time": jnp.where(
        st["mask"] > 0, 1e-9, st["birth_time"])}
    eng.init_particles()
    m_gas0 = float(np.sum(ic["m"]))
    m_star0 = 0.05

    enriched = 0.0
    for _ in range(8):
        diag = eng.step()
        enriched += float(diag["m_enriched"])
    assert enriched > 0, "no enrichment despite an ageing star"

    gas, stars = eng.state["gas"], eng.state["stars"]
    gmask = np.asarray(gas["mask"]) > 0
    smask = np.asarray(stars["mask"]) > 0
    m_gas1 = np.asarray(gas["m"])[gmask].sum()
    m_star1 = np.asarray(stars["m"])[smask].sum()
    # total conserved; mass moved star -> gas
    np.testing.assert_allclose(m_gas1 + m_star1, m_gas0 + m_star0,
                               rtol=1e-5)
    assert m_star1 < m_star0
    np.testing.assert_allclose(m_gas1 - m_gas0, enriched, rtol=1e-4)
    # gas metallicity rose where ejecta landed; element fractions stay
    # normalised
    Z1 = np.asarray(gas["Z"])[gmask]
    assert Z1.max() > 0
    ef1 = np.asarray(gas["elem_frac"])[gmask]
    np.testing.assert_allclose(ef1.sum(axis=1), 1.0, atol=5e-3)


# ---------------------------------------------------------------------------
# Real yield-table reader (yield_tables.h:87)
# ---------------------------------------------------------------------------

def _write_yield_dir(tmp_path):
    """Miniature yield-table directory in the reference's exact layout:
    SNII.hdf5 / AGB.hdf5 with /Yields/<Z_name>/{Yield,Ejected_mass,
    Total_Metals}, SNIa.hdf5 with a flat Yield, Lifetimes.hdf5 with the
    (Z, mass) lifetime grid."""
    import h5py

    def channel(fname, masses, zbins, ej_frac, z_frac, o_weight):
        names = [b"Hydrogen", b"Helium", b"Carbon", b"Oxygen", b"Iron"]
        with h5py.File(tmp_path / fname, "w") as f:
            f["Species_names"] = np.array(names, dtype="S16")
            f["Masses"] = masses
            f["Metallicities"] = zbins
            f["Yield_names"] = np.array(
                [f"Z_{z:.4f}".encode() for z in zbins], dtype="S16")
            for z in zbins:
                g = f.create_group(f"Yields/Z_{z:.4f}")
                ejm = ej_frac * masses
                totz = z_frac(z) * masses
                yld = np.zeros((len(names), len(masses)))
                yld[3] = o_weight * totz          # Oxygen
                yld[4] = (1 - o_weight) * totz    # Iron
                g["Yield"] = yld
                g["Ejected_mass"] = ejm
                g["Total_Metals"] = totz
        return np.asarray(masses), np.asarray(zbins)

    snii_m, snii_z = channel(
        "SNII.hdf5", np.linspace(8.0, 40.0, 9), np.array([0.001, 0.02]),
        0.8, lambda z: 0.10 * (1 - z), 0.7)
    agb_m, agb_z = channel(
        "AGB.hdf5", np.linspace(1.0, 7.0, 13),
        np.array([0.001, 0.008, 0.02]),
        0.5, lambda z: 0.01 + 0.2 * z, 0.2)
    with h5py.File(tmp_path / "SNIa.hdf5", "w") as f:
        f["Species_names"] = np.array(
            [b"Oxygen", b"Silicon", b"Iron", b"Nickel56"], dtype="S16")
        f["Yield"] = np.array([0.14, 0.15, 0.74, 0.37])
        f["Total_Metals"] = 1.4
    # lifetimes: t(m, Z) = 10 m^-2.5 (1 + 2 Z) Gyr
    lt_m = np.geomspace(0.8, 100.0, 20)
    lt_z = np.array([0.0004, 0.004, 0.019, 0.05])
    lt = 10.0 * lt_m[None, :] ** -2.5 * (1 + 2 * lt_z[:, None])
    with h5py.File(tmp_path / "Lifetimes.hdf5", "w") as f:
        f["Masses"] = lt_m
        f["Metallicities"] = lt_z
        f["Lifetimes"] = lt
    return snii_m, snii_z, agb_z


def test_yield_table_reader(tmp_path):
    from swift_subtask_dev_tpu.subgrid.enrichment import (
        EagleEnrichment, load_yield_tables, chabrier_imf)

    _write_yield_dir(tmp_path)
    base = EagleEnrichment()
    enr = load_yield_tables(str(tmp_path), base, lifetime_unit_Gyr=1.0)
    assert enr.z_bins_snii == (0.001, 0.02)
    assert len(enr.z_bins_agb) == 3

    # dying mass from the table inversion: t = 10 m^-2.5 (1+2Z) Gyr
    for t, Z in ((0.02, 0.019), (1.0, 0.0004)):
        m = float(enr.dying_mass(jnp.float32(t), jnp.float32(Z)))
        m_want = ((t / (1 + 2 * Z)) / 10.0) ** (-1 / 2.5)
        np.testing.assert_allclose(m, m_want, rtol=0.05)

    # SNII metal window at a table Z bin matches direct IMF integration
    lg = np.linspace(np.log10(0.1), np.log10(100.0), 4001)
    m = 10.0 ** lg
    xi = chabrier_imf(m)
    xi = xi / np.trapezoid(m * xi * m * np.log(10), lg)
    dndlg = xi * m * np.log(10)
    w = (m >= 8.0) & (m <= 40.0) & (m >= 10.0) & (m <= 30.0)
    want = np.trapezoid(0.10 * (1 - 0.001) * m * dndlg * w, lg)
    got = float(enr.window_z(enr.cum_Z_snii, jnp.float32(10.0),
                             jnp.float32(30.0), jnp.float32(0.001),
                             enr.z_bins_snii))
    np.testing.assert_allclose(got, want, rtol=0.02)

    # compositions: SNII 70% O / 30% Fe from the tables
    comp = np.asarray(enr._comp_z(enr.comp_snii, jnp.float32(0.001),
                                  enr.z_bins_snii))
    assert abs(comp[4] - 0.7) < 0.02      # Oxygen index in ELEMENT_NAMES
    assert abs(comp[8] - 0.3) < 0.02      # Iron

    # SNIa vector: name-matched (Nickel56 ignored), Fe-dominated
    v = np.asarray(enr.snia_vec)
    assert v[8] == 0.74 and v[4] == 0.14 and v.sum() < 1.2

    # full ejecta call runs and conserves sanity: dmZ <= dm
    dm, dmZ, delem = enr.ejecta(
        jnp.float32(1.0), jnp.float32(0.004),
        jnp.full((9,), 1.0 / 9, jnp.float32),
        jnp.float32(0.01 * enr.Gyr), jnp.float32(1.0 * enr.Gyr))
    assert 0 < float(dmZ) < float(dm) < 0.6
    np.testing.assert_allclose(float(jnp.sum(delem)), float(dm),
                               rtol=0.25)
