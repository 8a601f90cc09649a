"""Star-formation history logging (SFR.txt).

Reference: src/star_formation/EAGLE/star_formation_logger.h —
per-step new stellar mass, active SFR, SFR*dt, and total SFR (active +
sticky inactive), written one line per step; plus the sticky
per-particle SFR carrier (star_formation_struct.h SFR field).
"""

import numpy as np

from swift_subtask_dev_tpu.engine import EngineConfig
from swift_subtask_dev_tpu.engine_multi import MultiEngine
from swift_subtask_dev_tpu.grid import CellGrid
from swift_subtask_dev_tpu.models.sph.sphenix import SPHENIXParams
from swift_subtask_dev_tpu.ics import uniform_box_ic
from swift_subtask_dev_tpu.io.statistics import SFHWriter
from swift_subtask_dev_tpu.subgrid.star_formation import EagleStarFormation


def _sf_engine(sf, dt=1e-3):
    ic = uniform_box_ic(n=6, jitter=0.05, seed=4)
    P = SPHENIXParams(h_max=0.4)
    grid = CellGrid(box=(1.0, 1.0, 1.0), cdim=(3, 3, 3), K=48)
    eng = MultiEngine(grid, P, EngineConfig(dt_max=dt), 0.0, 1.0,
                      star_formation=sf)
    eng.load_gas(ic["pos"], ic["m"], ic["v"], ic["u"], ic["h"])
    eng.alloc_stars(extra_per_cell=24)
    eng.init_particles()
    return eng


def test_sfh_diag_accounts_formed_mass():
    """m_stars_formed == mass moved into the star pool; sfrdt = sum of
    SFR*dt over active gas (one shared bin here)."""
    sf = EagleStarFormation(sf_norm=1e4, sf_power=0.0,
                            density_threshold=0.0)
    eng = _sf_engine(sf)
    diag = eng.step()
    n_conv = int(diag["n_converted"])
    assert n_conv > 0
    st = eng.state["stars"]
    sm = np.asarray(st["mask"]) > 0
    m_formed = float(np.sum(np.asarray(st["m"])[sm]))
    np.testing.assert_allclose(float(diag["m_stars_formed"]), m_formed,
                               rtol=1e-5)
    # all gas shares one bin in this tiny run: SFR*dt = sfr_total * dt
    # where dt is the realized power-of-two bin at or below dt_max
    assert float(diag["sfr_total"]) > 0
    dt_bin = float(diag["sfrdt_total"]) / float(diag["sfr_total"])
    assert 0.5e-3 < dt_bin <= 1e-3 + 1e-9
    np.testing.assert_allclose(np.log2(dt_bin) % 1.0, 0.0, atol=1e-4)


def test_sticky_sfr_field_present_and_nonnegative():
    sf = EagleStarFormation(sf_norm=1e-3, sf_power=0.0,
                            density_threshold=0.0)
    eng = _sf_engine(sf)
    assert "sfr" in eng.state["gas"]
    eng.step()
    g = eng.state["gas"]
    sfr = np.asarray(g["sfr"])
    gm = np.asarray(g["mask"]) > 0
    assert (sfr[gm] >= 0).all()
    # every active, eligible particle carries SFR = sf_norm * m
    m = np.asarray(g["m"])
    np.testing.assert_allclose(sfr[gm], 1e-3 * m[gm], rtol=1e-4)


def test_sfr_txt_format(tmp_path):
    path = str(tmp_path / "SFR.txt")
    w = SFHWriter(path)
    diag = {"sfr_total": 2.0, "sfr_inactive": 0.5,
            "sfrdt_total": 2e-3, "m_stars_formed": 7.0}
    w.write(3, 0.125, 0.5, diag)
    rows = [ln for ln in open(path) if not ln.startswith("#")]
    assert len(rows) == 1
    v = rows[0].split()
    assert int(v[0]) == 3
    np.testing.assert_allclose(float(v[1]), 0.125)
    np.testing.assert_allclose(float(v[2]), 0.5)       # a
    np.testing.assert_allclose(float(v[3]), 1.0)       # z = 1/a - 1
    np.testing.assert_allclose(float(v[4]), 7.0)       # new stellar mass
    np.testing.assert_allclose(float(v[5]), 2.0)       # SFR active
    np.testing.assert_allclose(float(v[6]), 2e-3)      # SFR*dt
    np.testing.assert_allclose(float(v[7]), 2.5)       # total SFR
