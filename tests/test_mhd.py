"""MHD hook surface (reference src/mhd/None/mhd.h — the only scheme the
reference ships: every hook a no-op, every diagnostic zero)."""

import jax.numpy as jnp
import numpy as np

from swift_subtask_dev_tpu.models import mhd
from swift_subtask_dev_tpu.models.sph.sphenix import (CosmoFactors,
                                                      SPHENIXParams)


def _tiny_state():
    return {
        "h": jnp.ones((2, 4), jnp.float32),
        "m": jnp.ones((2, 4), jnp.float32),
        "mask": jnp.ones((2, 4), jnp.float32),
        "u_full": jnp.ones((2, 4), jnp.float32),
        "v_full": jnp.zeros((2, 4, 3), jnp.float32),
    }


def test_none_hooks_are_identities():
    p = SPHENIXParams()
    cos = CosmoFactors.no_cosmo()
    s = _tiny_state()
    for out in (
        mhd.first_init_part(p, s), mhd.init_part(p, s),
        mhd.end_density(p, s, cos), mhd.prepare_gradient(p, s, cos),
        mhd.reset_gradient(s), mhd.end_gradient(s),
        mhd.no_neighbours_fallback(p, s),
        mhd.prepare_force(p, s, cos, 0.1), mhd.reset_acceleration(s),
        mhd.reset_predicted_values(p, s),
        mhd.predict_extra(p, s, cos, 0.1, 0.1), mhd.end_force(p, s),
        mhd.kick_extra(p, s, cos, 0.1),
        mhd.convert_quantities(p, s, cos),
    ):
        assert out is s  # literal identity -> folds out under jit


def test_none_diagnostics_zero_and_timestep_unbounded():
    s = _tiny_state()
    assert float(mhd.magnetic_energy(s)) == 0.0
    assert float(mhd.magnetic_helicity(s)) == 0.0
    assert float(mhd.cross_helicity(s)) == 0.0
    assert float(mhd.divB_error(s)) == 0.0
    dt = mhd.compute_timestep(None, s, None)
    assert np.all(np.asarray(dt) >= 1e29)
    v = jnp.full((2, 4), 3.0)
    assert mhd.signal_velocity(None, None, v) is v
    assert "none" in mhd.MHD_SCHEMES


def test_statistics_carry_mhd_columns(tmp_path):
    from swift_subtask_dev_tpu.io.statistics import StatisticsWriter
    w = StatisticsWriter(str(tmp_path / "statistics.txt"))
    w.write(0, 0.0, {"total_mass": 1.0, "e_tot": 1.0, "e_kin": 0.5,
                     "e_int": 0.5, "e_pot": 0.0,
                     "momentum": np.zeros(3)})
    header, row = (tmp_path / "statistics.txt").read_text().splitlines()
    assert "e_mag" in header and "divB_err" in header
    assert len(row.split()) == len(header.split()) - 1  # minus the '#'
