"""Lightcone replications + P(k) foldings (VERDICT item 10).

Replications: an observer near the box edge must catch crossings of
periodic images (lightcone_replications.c).  Foldings: the folded P(k)
must agree with the unfolded spectrum in the overlap band
(power_spectrum.c:859-880)."""

import numpy as np
import jax.numpy as jnp

from swift_subtask_dev_tpu.io.lightcone import (LightconeParams,
                                                LightconeWriter,
                                                replication_list)
from swift_subtask_dev_tpu.ops.pm_gravity import PMMeshParams
from swift_subtask_dev_tpu.ops.power_spectrum import (power_spectrum,
                                                      power_spectrum_folded)


def test_replication_list_geometry():
    # observer at the corner, r_max just over one box: 0-shift plus the
    # neighbouring images must appear
    reps = replication_list((1.0, 1.0, 1.0), (0.05, 0.5, 0.5), 1.2)
    shifts = {tuple(np.round(r[0]).astype(int)) for r in reps}
    assert (0, 0, 0) in shifts
    assert (-1, 0, 0) in shifts      # image across the near face
    # d_min of the home cube is 0 (observer inside it)
    d0 = [r for r in reps if tuple(np.round(r[0]).astype(int))
          == (0, 0, 0)][0]
    assert d0[1] == 0.0


class _FakeCosmo:
    """Linear-in-ti comoving distance for a controlled shrinking cone."""

    def __init__(self, r0=1.4, span=2 ** 40):
        self.r0, self.span = r0, span

        class _PC:
            const_speed_light_c = 1.0
        self.phys_const = _PC()

    def grav_kick_factor(self, lo, hi):
        from swift_subtask_dev_tpu.utils import timeline as tl
        # r(ti) falls linearly from r0 to 0 over the full timeline
        return self.r0 * (hi - lo) / tl.MAX_NR_TIMESTEPS

    def a_of_ti(self, ti):
        return 0.5

    def drift_factor(self, lo, hi):
        from swift_subtask_dev_tpu.utils import timeline as tl
        return (hi - lo) / tl.MAX_NR_TIMESTEPS


def test_edge_observer_catches_image_crossings():
    from swift_subtask_dev_tpu.grid import CellGrid
    from swift_subtask_dev_tpu.grid.cellgrid import bucket_fields
    from swift_subtask_dev_tpu.utils import timeline as tl

    rng = np.random.default_rng(1)
    n = 300
    pos = rng.uniform(0, 1, (n, 3))
    grid = CellGrid(box=(1.0, 1.0, 1.0), cdim=(3, 3, 3), K=64)
    f, mask, off, nov = bucket_fields(
        grid, jnp.asarray(pos),
        {"pid": jnp.arange(n, dtype=jnp.int32),
         "m": jnp.ones(n, jnp.float32),
         "v_full": jnp.zeros((n, 3), jnp.float32)})
    assert int(nov) == 0
    state = {"mask": mask, "off": off, **f}

    cosmo = _FakeCosmo(r0=1.4)
    lp = LightconeParams(observer_position=(0.02, 0.5, 0.5),
                         radius_max=1.3)
    w = LightconeWriter(lp, cosmo, grid)
    assert len(w.replications) > 1, "edge observer needs image cubes"

    # sweep the cone from r=1.4 to r=0 in many steps: every particle of
    # every intersecting image inside r_max must cross exactly once
    M = tl.MAX_NR_TIMESTEPS
    ticks = np.linspace(0, M, 60, dtype=np.int64)
    for lo, hi in zip(ticks[:-1], ticks[1:]):
        w.after_step(state, int(lo), int(hi))
    # expected: count images by brute force
    expect = 0
    for shift, dmin, dmax in w.replications:
        d = np.linalg.norm(pos + shift - np.asarray(lp.observer_position),
                           axis=1)
        expect += int(((d <= 1.3) & (d > 0)).sum())
    assert w.n_total == expect, (w.n_total, expect)
    # image crossings really happened (beyond the home box)
    coords = np.concatenate(w.buf["Coordinates"])
    assert (coords.min() < 0) or (coords.max() > 1.0)


def test_folded_pk_matches_unfolded_in_overlap():
    rng = np.random.default_rng(5)
    # clustered field: random blobs give power across the band
    centers = rng.uniform(0, 1, (40, 3))
    pts = np.concatenate([c + rng.normal(0, 0.015, (200, 3))
                          for c in centers]) % 1.0
    m = np.ones(len(pts), np.float32)
    pm = PMMeshParams(N=64, box=(1.0, 1.0, 1.0))

    k0, P0, n0 = power_spectrum(pm, jnp.asarray(pts), jnp.asarray(m),
                                n_total=len(pts))
    # the stitched product extends the dynamic range by the fold factor
    kf, Pf, nf, fid = power_spectrum_folded(
        pm, pts, jnp.asarray(m), n_foldings=1, fold_factor=4,
        n_total=len(pts))
    assert fid.max() == 1 and kf.max() > k0.max() * 2

    # raw fold-1 spectrum: must agree with the unfolded one in the band
    # both resolve (fold fundamental .. half the base Nyquist)
    pm_f = PMMeshParams(N=64, box=(0.25, 0.25, 0.25))
    k1, P1, n1 = power_spectrum(pm_f, jnp.asarray(pts % 0.25),
                                jnp.asarray(m), n_total=len(pts),
                                subtract_shot_noise=False)
    P1 = P1 * 4 ** 3 - 1.0 / len(pts)   # full-volume normalisation
    band = (k1 > k1.min() * 1.5) & (k1 < 0.75 * k0.max())
    assert band.sum() >= 3
    for k_i, P_i in zip(k1[band], P1[band]):
        j = np.argmin(np.abs(k0 - k_i))
        ref = P0[j]
        assert abs(P_i - ref) / abs(ref) < 0.5, (k_i, P_i, ref)


def test_crossing_is_drift_interpolated():
    """Recorded coordinates sit ON the cone at the crossing instant:
    |pos_cross - obs| == r_lc(t_cross) (lightcone_crossing.c)."""
    from swift_subtask_dev_tpu.grid import CellGrid
    from swift_subtask_dev_tpu.grid.cellgrid import bucket_fields
    from swift_subtask_dev_tpu.utils import timeline as tl

    grid = CellGrid(box=(1.0, 1.0, 1.0), cdim=(3, 3, 3), K=8)
    # one fast particle moving outward through the shrinking cone:
    # ends at x=0.9 (r1=0.8 from the observer), started at x=0.4 (r0=0.3)
    pos = np.array([[0.9, 0.5, 0.5]])
    v = np.array([[1.0, 0.0, 0.0]], np.float32)
    f, mask, off, nov = bucket_fields(
        grid, jnp.asarray(pos),
        {"pid": jnp.arange(1, dtype=jnp.int32),
         "m": jnp.ones(1, jnp.float32), "v_full": jnp.asarray(v)})
    state = {"mask": mask, "off": off, **f}

    cosmo = _FakeCosmo(r0=1.0)
    lp = LightconeParams(observer_position=(0.1, 0.5, 0.5),
                         radius_max=2.0, use_replications=False,
                         basename="lc_interp_test")
    w = LightconeWriter(lp, cosmo, grid)
    # a big step: cone falls 1.0 -> 0.5 while the particle moves
    # 0.3 -> 0.8 from the observer; crossing at r = 0.675
    ti0, ti1 = 0, tl.MAX_NR_TIMESTEPS // 2
    n = w.after_step(state, ti0, ti1)
    assert n == 1
    pos_c = w.buf["Coordinates"][0][0]
    r_c = np.linalg.norm(pos_c - np.asarray(lp.observer_position))
    # analytic: r(t) = 0.3 + 0.5 t, r_lc(t) = 1 - 0.5 t -> t = 0.7
    np.testing.assert_allclose(r_c, 0.65, atol=5e-3)
    # NOT the end-of-step radius (0.8) nor the start (0.3)
    assert abs(r_c - 0.8) > 0.1 and abs(r_c - 0.3) > 0.1
