"""Ewald-summed exact periodic gravity — the brute-force oracle.

Host-side (float64 numpy) implementation of the periodic exact-force
checker the reference compiles in behind --enable-gravity-force-checks
(src/gravity.c:76 gravity_exact_force_ewald_init): the Hernquist,
Bouchet & Suto (1991, ApJS 75, 231) Ewald decomposition, eqs 2.14a/b,
with alpha = 2/L, real-space images |x - nL| < 4L and reciprocal modes
|h|^2 <= 16 — the same convergence parameters as the reference.

Two entry points:

* ``ewald_correction(dx, L)`` — the CORRECTION to the nearest-image
  Newtonian force/potential (what the reference tabulates into
  Ewald.hdf5 on a 64^3 octant grid): periodic answer minus direct
  1/r^2 of the minimum-image displacement.
* ``ewald_exact_accelerations(pos, m, L, G)`` — O(N^2) exact periodic
  accelerations and potentials: minimum-image direct kernel plus the
  correction, pair-summed.  This is the oracle the P3M split (PM mesh +
  erfc-truncated P2P) must match to <1e-3 RMS force error.

``EwaldTable`` mirrors the reference's cached octant table + trilinear
interpolation (gravity.c:214-312) for cheap in-run spot checks.
"""

from __future__ import annotations

import numpy as np
from scipy.special import erfc as _erfc  # scipy ships in the image


def _erfc_safe(x):
    try:
        return _erfc(x)
    except Exception:  # pragma: no cover - scipy always present
        from math import erfc
        return np.vectorize(erfc)(x)


def ewald_periodic_force_pot(dx: np.ndarray, L: float,
                             nmax: int = 4, hmax2: int = 16):
    """Exact periodic force and potential of a UNIT point mass at the
    origin evaluated at displacements ``dx`` ((..., 3), any real values),
    G = 1: HBS91 eqs 2.14a/b with alpha = 2/L.

    Returns (force (..., 3) pointing TOWARD the origin mass as an
    acceleration of the test particle, i.e. a = -f(x)*x-ish sign built
    in, and potential (...,) with the HBS91 normalization phi ~ -1/r
    near the origin plus the neutralizing-background constant).
    """
    dx = np.asarray(dx, np.float64)
    alpha = 2.0 / L
    shape = dx.shape[:-1]
    x = dx.reshape(-1, 3)
    f = np.zeros_like(x)
    pot = np.full(x.shape[0], np.pi / (alpha * alpha * L ** 3))

    # real-space image sum: terms with |x - nL| < 4L (gravity.c:33 note)
    rng = np.arange(-nmax, nmax + 1)
    for nx in rng:
        for ny in rng:
            for nz in rng:
                s = x - np.array([nx, ny, nz], np.float64) * L
                r2 = np.einsum("ij,ij->i", s, s)
                r = np.sqrt(np.maximum(r2, 1e-300))
                m = (r < 4.0 * L) & (r2 > 0)
                if not np.any(m):
                    continue
                ar = alpha * r[m]
                g = (_erfc_safe(ar)
                     + 2.0 * ar / np.sqrt(np.pi) * np.exp(-ar * ar)) \
                    / (r[m] ** 3)
                f[m] -= s[m] * g[:, None]
                pot[m] -= _erfc_safe(ar) / r[m]

    # reciprocal sum: h != 0, |h|^2 <= 16
    hr = np.arange(-int(np.sqrt(hmax2)), int(np.sqrt(hmax2)) + 1)
    two_pi_L = 2.0 * np.pi / L
    for hx in hr:
        for hy in hr:
            for hz in hr:
                h2 = hx * hx + hy * hy + hz * hz
                if h2 == 0 or h2 > hmax2:
                    continue
                k = two_pi_L * np.array([hx, hy, hz], np.float64)
                k2 = two_pi_L * two_pi_L * h2
                coef = 4.0 * np.pi / (L ** 3 * k2) \
                    * np.exp(-k2 / (4.0 * alpha * alpha))
                kx = x @ k
                f -= coef * np.sin(kx)[:, None] * k[None, :]
                pot[:] -= coef * np.cos(kx)

    return f.reshape(shape + (3,)), pot.reshape(shape)


def ewald_correction(dx: np.ndarray, L: float):
    """Correction = periodic force/potential minus the direct Newtonian
    of the MINIMUM-IMAGE displacement (what Ewald.hdf5 tabulates)."""
    dx = np.asarray(dx, np.float64)
    dmin = dx - L * np.round(dx / L)
    f_per, p_per = ewald_periodic_force_pot(dmin, L)
    r2 = np.einsum("...i,...i->...", dmin, dmin)
    r = np.sqrt(np.maximum(r2, 1e-300))
    good = r2 > 0
    r_safe = np.maximum(r, 1e-300)
    inv_r3 = np.where(good, 1.0 / r_safe ** 3, 0.0)
    f_dir = -dmin * inv_r3[..., None]
    p_dir = np.where(good, -1.0 / r_safe, 0.0)
    p_corr = p_per - p_dir
    # continuous r -> 0 limit: -erfc(ar)/r + 1/r = erf(ar)/r -> 2a/sqrt(pi)
    # (the r=0 grid point of the octant table; force limit is 0)
    alpha = 2.0 / L
    p_corr = np.where(good, p_corr, p_per + 2.0 * alpha / np.sqrt(np.pi))
    return f_per - f_dir, p_corr


class EwaldTable:
    """Octant table + trilinear interpolation of the correction
    (gravity.c:214 builds fewald_[xyz] on a (Newald+1)^3 grid over
    [0, L/2]^3 using the odd symmetry f(-x) = -f(x))."""

    def __init__(self, L: float, N: int = 64):
        self.L = float(L)
        self.N = int(N)
        ax = np.linspace(0.0, 0.5 * L, N + 1)
        X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
        pts = np.stack([X, Y, Z], axis=-1).reshape(-1, 3)
        fc, pc = ewald_correction(pts, L)
        self.f = fc.reshape(N + 1, N + 1, N + 1, 3)
        self.pot = pc.reshape(N + 1, N + 1, N + 1)
        self.fac = 2.0 * N / L

    def __call__(self, dx: np.ndarray):
        """Trilinearly interpolated correction at displacements dx
        ((..., 3), any sign — odd symmetry applied per component like
        gravity_exact_force_ewald_evaluate (gravity.c:370-420))."""
        dx = np.asarray(dx, np.float64)
        d = dx - self.L * np.round(dx / self.L)
        sign = np.where(d < 0, -1.0, 1.0)
        a = np.abs(d) * self.fac
        i = np.clip(a.astype(np.int64), 0, self.N - 1)
        w = a - i
        fout = np.zeros_like(d)
        pout = np.zeros(d.shape[:-1])
        for bx in (0, 1):
            for by in (0, 1):
                for bz in (0, 1):
                    ww = (np.where(bx, w[..., 0], 1 - w[..., 0])
                          * np.where(by, w[..., 1], 1 - w[..., 1])
                          * np.where(bz, w[..., 2], 1 - w[..., 2]))
                    fv = self.f[i[..., 0] + bx, i[..., 1] + by,
                                i[..., 2] + bz]
                    pout += ww * self.pot[i[..., 0] + bx, i[..., 1] + by,
                                          i[..., 2] + bz]
                    fout += ww[..., None] * fv
        return fout * sign, pout


def ewald_exact_accelerations(pos: np.ndarray, m: np.ndarray, L: float,
                              G: float = 1.0, table: EwaldTable = None):
    """O(N^2) exact periodic accelerations + potentials (float64).

    The per-pair answer is minimum-image direct Newtonian plus the Ewald
    correction (direct evaluation by default; pass ``table`` to use the
    reference's tabulated+interpolated flavour).  This is the oracle of
    gravity_exact_force_compute (gravity.c:450-560).
    """
    pos = np.asarray(pos, np.float64)
    m = np.asarray(m, np.float64)
    n = len(pos)
    # all pairs at once: the image/mode loops inside ewald_correction
    # then run over one (n*n, 3) array instead of n small ones
    dx = (pos[:, None, :] - pos[None, :, :]).reshape(-1, 3)
    dmin = dx - L * np.round(dx / L)
    r2 = np.einsum("ij,ij->i", dmin, dmin)
    good = r2 > 0
    r = np.sqrt(np.maximum(r2, 1e-300))
    inv_r3 = np.where(good, 1.0 / r ** 3, 0.0)
    f_dir = -dmin * inv_r3[:, None]
    p_dir = np.where(good, -1.0 / r, 0.0)
    if table is not None:
        fc, pc = table(dmin)
    else:
        fc, pc = ewald_correction(dmin, L)
    fc = np.where(good[:, None], fc, 0.0)
    # the self-term correction (r=0) is the background/self energy;
    # the reference's checker skips the self pair entirely
    pc = np.where(good, pc, 0.0)
    f_pair = (f_dir + fc).reshape(n, n, 3)
    p_pair = (p_dir + pc).reshape(n, n)
    acc = G * np.einsum("ijc,j->ic", f_pair, m)
    pot = G * (p_pair @ m)
    return acc, pot
