"""Matter power spectra — the reference's power_spectrum.c (CIC + FFTW).

P(k) of any particle selection: CIC density grid, contrast FFT, shell-
averaged |delta_k|^2 with CIC-window deconvolution and shot-noise
subtraction (power_spectrum.c:859,1248).  Auto- and cross-spectra.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from .pm_gravity import PMMeshParams, cic_deposit


def density_contrast(pm: PMMeshParams, pos, m) -> jnp.ndarray:
    """delta(x) = rho/rho_mean - 1 on the mesh."""
    grid = cic_deposit(pm, pos, m)
    mean = jnp.mean(grid)
    return grid / jnp.maximum(mean, 1e-30) - 1.0


def _k_grid(N: int, L: float):
    k_int = np.fft.fftfreq(N) * N
    kz_int = np.fft.rfftfreq(N) * N
    kx = k_int[:, None, None]
    ky = k_int[None, :, None]
    kz = kz_int[None, None, :]
    k_mag_int = np.sqrt(kx ** 2 + ky ** 2 + kz ** 2)
    return k_mag_int, (kx, ky, kz)


def _cic_deconv(N, kx, ky, kz):
    def w(k):
        x = np.pi * k / N
        return np.where(k == 0, 1.0, np.sin(x) / np.where(x == 0, 1, x))
    # |W_CIC(k)|^2 = (sinc products)^4 since CIC = square window squared
    return (w(kx) * w(ky) * w(kz)) ** 4


def power_spectrum(pm: PMMeshParams, pos, m,
                   pos2=None, m2=None,
                   n_total: Optional[int] = None,
                   subtract_shot_noise: bool = True
                   ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(k_centers, P(k), n_modes): auto (or cross if pos2 given) spectrum.

    k in units of 2 pi / L; P in units of L^3 (standard cosmology
    conventions).  Shot noise V/N subtracted for auto-spectra.
    """
    N = pm.N
    L = pm.box[0]
    V = float(np.prod(pm.box))

    d1 = density_contrast(pm, pos, m)
    f1 = np.asarray(jnp.fft.rfftn(d1)) / N ** 3
    if pos2 is not None:
        d2 = density_contrast(pm, pos2, m2)
        f2 = np.asarray(jnp.fft.rfftn(d2)) / N ** 3
        pk_raw = (f1 * np.conj(f2)).real
    else:
        pk_raw = np.abs(f1) ** 2

    k_mag_int, (kx, ky, kz) = _k_grid(N, L)
    deconv = _cic_deconv(N, kx, ky, kz)
    pk_raw = pk_raw / np.maximum(deconv, 1e-12)

    # rfft multiplicity: kz=0 and kz=N/2 planes counted once, others twice
    mult = np.full(pk_raw.shape, 2.0)
    mult[..., 0] = 1.0
    if N % 2 == 0:
        mult[..., -1] = 1.0

    bins = np.arange(0.5, N // 2 + 1, 1.0)
    idx = np.digitize(k_mag_int.ravel(), bins)
    w = mult.ravel()
    pk_sum = np.bincount(idx, weights=(pk_raw * mult).ravel(),
                         minlength=len(bins) + 1)
    n_modes = np.bincount(idx, weights=w, minlength=len(bins) + 1)

    # drop the k=0 bin and the overflow bin
    pk_mean = pk_sum[1:-1] / np.maximum(n_modes[1:-1], 1)
    n_modes = n_modes[1:-1]
    k_centers = np.arange(1, len(pk_mean) + 1, dtype=np.float64)

    P = pk_mean * V  # |delta_k|^2 V
    if subtract_shot_noise and pos2 is None:
        n = n_total if n_total is not None else int(np.prod(
            np.asarray(pos).shape[:-1]))
        P = P - V / max(n, 1)

    k_phys = k_centers * 2 * np.pi / L
    return k_phys, P, n_modes


def power_spectrum_folded(pm: PMMeshParams, pos, m,
                          n_foldings: int = 2, fold_factor: int = 4,
                          n_total: Optional[int] = None,
                          stitch_frac: float = 0.5):
    """P(k) with box foldings for dynamic range (power_spectrum.c:859-880).

    Folding i remaps positions into a box L/fold_factor^i (periodic
    modulo): the same mesh then resolves wavenumbers fold_factor^i times
    higher at the cost of low-k modes, exactly the reference's folding
    trick.  Spectra are stitched at ``stitch_frac`` of each folding's
    Nyquist.  Returns (k, P, n_modes, fold_id) sorted in k.
    """
    pos = np.asarray(pos)
    L = pm.box[0]
    ks, Ps, ns, fid = [], [], [], []
    k_lo = 0.0
    for i in range(n_foldings + 1):
        f = fold_factor ** i
        Lf = L / f
        pm_f = PMMeshParams(N=pm.N, box=(Lf,) * 3,
                            a_smooth=pm.a_smooth,
                            r_cut_max_ratio=pm.r_cut_max_ratio)
        pos_f = np.mod(pos, Lf)
        k, P, n = power_spectrum(pm_f, jnp.asarray(pos_f), m,
                                 n_total=n_total,
                                 subtract_shot_noise=False)
        # a commensurate mode's amplitude |delta_k| is identical in the
        # folded box, so P = |delta_k|^2 V uses the FULL volume: scale by
        # f^3 and subtract the full-volume shot noise (power_spectrum.c
        # folding normalisation)
        V = float(np.prod(pm.box))
        n_sn = n_total if n_total is not None else len(pos)
        P = P * f ** 3 - V / max(n_sn, 1)
        k_hi = stitch_frac * (pm.N // 2) * 2 * np.pi / Lf
        if i == n_foldings:
            k_hi = np.inf     # last folding keeps its full range
        sel = (k > k_lo) & (k <= k_hi) & (n > 0)
        ks.append(k[sel])
        Ps.append(P[sel])
        ns.append(n[sel])
        fid.append(np.full(sel.sum(), i, np.int32))
        k_lo = k_hi
    k = np.concatenate(ks)
    order = np.argsort(k)
    return (k[order], np.concatenate(Ps)[order],
            np.concatenate(ns)[order], np.concatenate(fid)[order])
