#!/usr/bin/env python
"""Generate SmallCosmoVolume-style gas+DM initial conditions.

The reference example (examples/SmallCosmoVolume/SmallCosmoVolume_hydro)
downloads a pre-made glass+perturbation IC; with zero egress this script
synthesizes an equivalent small volume: a Gaussian random field with a
power-law spectrum, Zel'dovich displacements applied to offset gas/DM
lattices, and growing-mode velocities for the starting redshift.

Usage: python make_ics.py [--n 16] [--L 25] [--z 9] [-o ic.hdf5]
"""

import argparse

import numpy as np


def zeldovich(n, L, amp, slope, seed, a_start, Omega_m, H0):
    """Displacement + velocity fields on an n^3 lattice."""
    rng = np.random.default_rng(seed)
    k1 = np.fft.fftfreq(n, d=L / n) * 2 * np.pi
    kx, ky, kz = np.meshgrid(k1, k1, k1, indexing="ij")
    k2 = kx ** 2 + ky ** 2 + kz ** 2
    k2[0, 0, 0] = 1.0
    # random phases, power-law P(k) ~ k^slope with a k_Ny cutoff
    phase = rng.standard_normal((n, n, n)) + 1j * rng.standard_normal(
        (n, n, n))
    k_ny = np.pi * n / L
    pk = amp * np.maximum(k2, 1e-30) ** (slope / 2.0) \
        * np.exp(-k2 / (0.5 * k_ny) ** 2)
    pk[0, 0, 0] = 0.0
    delta_k = phase * np.sqrt(pk)
    # displacement psi = i k / k^2 delta_k
    psi = []
    for kk in (kx, ky, kz):
        f = 1j * kk / k2 * delta_k
        psi.append(np.real(np.fft.ifftn(f)))
    psi = np.stack(psi, axis=-1).reshape(-1, 3)
    # growing mode: v = a H(a) f psi, f ~ Omega_m(a)^0.55
    Ha = H0 * np.sqrt(Omega_m / a_start ** 3 + (1.0 - Omega_m))
    f_growth = (Omega_m / a_start ** 3
                / (Omega_m / a_start ** 3 + 1.0 - Omega_m)) ** 0.55
    vel = a_start * Ha * f_growth * psi
    return psi, vel


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--L", type=float, default=25.0, help="box [Mpc]")
    ap.add_argument("--z", type=float, default=9.0)
    ap.add_argument("--amp", type=float, default=40.0)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("-o", "--output", default="ic.hdf5")
    args = ap.parse_args()

    from swift_subtask_dev_tpu.io.snapshot import (write_snapshot,
                                                   PTYPE_GAS, PTYPE_DM)

    n, L = args.n, args.L
    a0 = 1.0 / (1.0 + args.z)
    h = 0.67
    H0 = 100.0 * h            # km/s/Mpc = internal velocity/length units
    Omega_m = 0.309
    Omega_b = 0.049
    G = 43.022                # Mpc (km/s)^2 / 1e10 Msun
    rho_crit0 = 3.0 * H0 ** 2 / (8.0 * np.pi * G)
    m_tot = Omega_m * rho_crit0 * L ** 3

    lat = (np.indices((n, n, n)).reshape(3, -1).T + 0.5) / n * L
    psi, vel = zeldovich(n, L, args.amp, -1.0, args.seed, a0,
                         Omega_m, H0)
    N = n ** 3
    pos_dm = np.mod(lat + psi, L)
    # gas offset by half a lattice spacing, same displacement field
    pos_g = np.mod(lat + 0.5 * L / n + psi, L)

    d_mean = L / n
    write_snapshot(args.output, (L, L, L), a0, {
        PTYPE_GAS: {
            "Coordinates": pos_g, "Velocities": vel.astype(np.float32),
            "Masses": np.full(N, Omega_b / Omega_m * m_tot / N,
                              np.float32),
            "InternalEnergies": np.full(N, 150.0, np.float32),
            "SmoothingLengths": np.full(N, 1.3 * d_mean, np.float32),
            "ParticleIDs": np.arange(N, dtype=np.uint64)},
        PTYPE_DM: {
            "Coordinates": pos_dm,
            "Velocities": vel.astype(np.float32),
            "Masses": np.full(N, (1 - Omega_b / Omega_m) * m_tot / N,
                              np.float32),
            "ParticleIDs": np.arange(N, 2 * N, dtype=np.uint64)},
    })
    print(f"wrote {args.output}: {N} gas + {N} DM, L={L} Mpc, "
          f"z={args.z} (a={a0:.3f})")


if __name__ == "__main__":
    main()
