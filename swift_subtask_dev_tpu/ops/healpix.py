"""HEALPix RING pixelization — shell-map support for the lightcone.

The reference bins lightcone crossings into HEALPix maps per comoving
shell (lightcone/lightcone_map.c, healpix_util.c, using the external
libhealpix; map types in lightcone_map_types.c).  No external healpix
library is assumed here: this is the standard RING-scheme ``ang2pix``
of Gorski et al. (2005), vectorised over numpy arrays, plus the shell
accumulation used by ``io.lightcone``.

The RING scheme divides the sphere into 12 nside^2 equal-area pixels:
a north polar cap (rings 1..nside-1 of 4*ring pixels), an equatorial
belt (2 nside+1 rings of 4 nside pixels), and the mirrored south cap.
"""

from __future__ import annotations

import numpy as np


def npix(nside: int) -> int:
    return 12 * nside * nside


def ang2pix_ring(nside: int, z, phi):
    """RING pixel index for direction(s) (z = cos(theta), phi).

    Vectorised form of the canonical algorithm (healpix_util.c ang2pix_ring;
    Gorski+2005 section 4): equatorial belt for |z| <= 2/3, polar caps
    otherwise.
    """
    z = np.asarray(z, np.float64)
    phi = np.asarray(phi, np.float64)
    n = int(nside)
    ncap = 2 * n * (n - 1)
    np_tot = npix(n)

    tt = np.mod(phi, 2.0 * np.pi) * (2.0 / np.pi)        # in [0, 4)
    za = np.abs(z)

    # --- equatorial belt (|z| <= 2/3) ---------------------------------
    temp1 = n * (0.5 + tt)
    temp2 = n * z * 0.75
    jp = np.floor(temp1 - temp2).astype(np.int64)   # ascending edge line
    jm = np.floor(temp1 + temp2).astype(np.int64)   # descending edge line
    ir = n + 1 + jp - jm                            # ring 1..2n+1
    kshift = 1 - (ir & 1)
    ip = (jp + jm - n + kshift + 1) >> 1
    ip = np.mod(ip, 4 * n)
    pix_eq = ncap + (ir - 1) * 4 * n + ip

    # --- polar caps ----------------------------------------------------
    tp = tt - np.floor(tt)
    tmp = n * np.sqrt(3.0 * np.maximum(1.0 - za, 0.0))
    jp_c = np.floor(tp * tmp).astype(np.int64)
    jm_c = np.floor((1.0 - tp) * tmp).astype(np.int64)
    ir_c = jp_c + jm_c + 1                          # ring counted from pole
    ir_c = np.maximum(ir_c, 1)
    ip_c = np.floor(tt * ir_c).astype(np.int64)
    ip_c = np.mod(ip_c, 4 * ir_c)
    pix_n = 2 * ir_c * (ir_c - 1) + ip_c
    pix_s = np_tot - 2 * ir_c * (ir_c + 1) + ip_c

    pix = np.where(za <= 2.0 / 3.0, pix_eq,
                   np.where(z > 0, pix_n, pix_s))
    return np.clip(pix, 0, np_tot - 1)


def vec2pix_ring(nside: int, dx, dy, dz):
    """RING pixel for direction vectors (need not be normalised)."""
    dx = np.asarray(dx, np.float64)
    dy = np.asarray(dy, np.float64)
    dz = np.asarray(dz, np.float64)
    r = np.sqrt(dx * dx + dy * dy + dz * dz)
    z = np.where(r > 0, dz / np.maximum(r, 1e-300), 1.0)
    phi = np.arctan2(dy, dx)
    return ang2pix_ring(nside, z, phi)


class ShellMaps:
    """Per-shell HEALPix accumulation maps (lightcone_map.c analog).

    shells: ascending comoving radii edges [r0, r1, ..., rn] defining n
    shells; each map accumulates a named quantity (the reference's
    lightcone_map_types — 'TotalMass' here, extensible by key).
    """

    def __init__(self, nside: int, shell_edges, map_types=("TotalMass",)):
        self.nside = int(nside)
        self.edges = np.asarray(shell_edges, np.float64)
        if len(self.edges) < 2 or (np.diff(self.edges) <= 0).any():
            raise ValueError("shell_edges must be ascending, >= 2 values")
        self.n_shells = len(self.edges) - 1
        self.maps = {t: np.zeros((self.n_shells, npix(self.nside)))
                     for t in map_types}

    def accumulate(self, rel_pos, r, values: dict):
        """Bin crossing particles (observer-relative positions, observer
        distances) into their shell's map, one np.add.at per quantity
        (lightcone_map_buffer update)."""
        shell = np.searchsorted(self.edges, r, side="right") - 1
        ok = (shell >= 0) & (shell < self.n_shells)
        if not ok.any():
            return 0
        pix = vec2pix_ring(self.nside, rel_pos[ok, 0], rel_pos[ok, 1],
                           rel_pos[ok, 2])
        sh = shell[ok]
        for t, vals in values.items():
            if t in self.maps:
                np.add.at(self.maps[t], (sh, pix), np.asarray(vals)[ok])
        return int(ok.sum())

    def write(self, h5grp):
        """Shell maps into an open HDF5 group (one dataset per type,
        (n_shells, npix)); attrs mirror lightcone_map.c metadata."""
        h5grp.attrs["Nside"] = self.nside
        h5grp.attrs["NumShells"] = self.n_shells
        h5grp.attrs["ShellEdges"] = self.edges
        for t, m in self.maps.items():
            h5grp.create_dataset(t, data=m)
