"""HEALPix RING pixelization + lightcone shell maps
(lightcone/lightcone_map.c, healpix_util.c analogs)."""

import numpy as np

from swift_subtask_dev_tpu.ops.healpix import (ShellMaps, ang2pix_ring,
                                               npix, vec2pix_ring)


def test_pixels_in_range_and_poles():
    for nside in (1, 2, 4, 16):
        rng = np.random.default_rng(nside)
        z = rng.uniform(-1, 1, 20000)
        phi = rng.uniform(0, 2 * np.pi, 20000)
        pix = ang2pix_ring(nside, z, phi)
        assert pix.min() >= 0 and pix.max() < npix(nside)
        # poles: first/last 4 pixels
        assert (ang2pix_ring(nside, 0.99999, [0.1, 2.0, 4.0]) < 4).all()
        assert (ang2pix_ring(nside, -0.99999, [0.1, 2.0, 4.0])
                >= npix(nside) - 4).all()


def test_equal_area_property():
    """Isotropic points land uniformly across pixels (the defining
    HEALPix property)."""
    nside = 4
    rng = np.random.default_rng(7)
    n = 400_000
    z = rng.uniform(-1, 1, n)
    phi = rng.uniform(0, 2 * np.pi, n)
    pix = ang2pix_ring(nside, z, phi)
    counts = np.bincount(pix, minlength=npix(nside))
    mean = n / npix(nside)
    # every pixel hit, occupancy within 10% of equal-area expectation
    assert counts.min() > 0
    assert np.abs(counts / mean - 1.0).max() < 0.10


def test_ring_monotone_in_z():
    """Pixel index grows (ring by ring) as z decreases — RING ordering."""
    nside = 8
    zs = np.linspace(0.999, -0.999, 200)
    pix = ang2pix_ring(nside, zs, np.full_like(zs, 0.3))
    ring = np.searchsorted(-np.sort(-zs), -zs)  # proxy: z order
    assert (np.diff(pix) >= 0).sum() > 190  # near-monotone

    # vec2pix consistency with ang2pix
    rng = np.random.default_rng(2)
    v = rng.standard_normal((1000, 3))
    r = np.linalg.norm(v, axis=1)
    p1 = vec2pix_ring(nside, v[:, 0], v[:, 1], v[:, 2])
    p2 = ang2pix_ring(nside, v[:, 2] / r, np.arctan2(v[:, 1], v[:, 0]))
    np.testing.assert_array_equal(p1, p2)


def test_shell_maps_accumulate_and_conserve_mass():
    sm = ShellMaps(nside=2, shell_edges=(0.0, 1.0, 2.0))
    rng = np.random.default_rng(3)
    pos = rng.standard_normal((5000, 3))
    r = np.linalg.norm(pos, axis=1)
    m = rng.uniform(0.5, 1.5, 5000)
    n_in = sm.accumulate(pos, r, {"TotalMass": m})
    in_range = r < 2.0
    assert n_in == in_range.sum()
    np.testing.assert_allclose(sm.maps["TotalMass"].sum(),
                               m[in_range].sum(), rtol=1e-12)
    # shell assignment: mass with r<1 is all in shell 0
    np.testing.assert_allclose(sm.maps["TotalMass"][0].sum(),
                               m[r < 1.0].sum(), rtol=1e-12)
