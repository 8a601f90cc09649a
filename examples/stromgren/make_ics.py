#!/usr/bin/env python
"""Strömgren sphere ICs — the reference's
examples/RadiativeTransferTests/StromgrenSphere_3D analog: a uniform
hydrogen box with one star particle in the centre emitting ionizing
photons at a constant rate."""

import argparse

import numpy as np

from swift_subtask_dev_tpu.io.snapshot import (PTYPE_GAS, PTYPE_STARS,
                                               write_snapshot)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16,
                    help="gas lattice side (n^3 particles)")
    ap.add_argument("--out", default="ic.hdf5")
    args = ap.parse_args()

    n = args.n
    g = (np.arange(n) + 0.5) / n
    pos = np.stack(np.meshgrid(g, g, g, indexing="ij"), -1).reshape(-1, 3)
    N = len(pos)
    gas = {
        "Coordinates": pos,
        "Velocities": np.zeros((N, 3), np.float32),
        # total mass 1 in a unit box: n_H = rho = 1 with proton_mass 1
        "Masses": np.full(N, 1.0 / N, np.float32),
        "InternalEnergies": np.full(N, 1e-4, np.float32),
        "SmoothingLengths": np.full(N, 1.25 / n, np.float32),
        "ParticleIDs": np.arange(N, dtype=np.uint64),
    }
    star = {
        "Coordinates": np.array([[0.5, 0.5, 0.5]]),
        "Velocities": np.zeros((1, 3), np.float32),
        "Masses": np.array([1.0], np.float32),
        "ParticleIDs": np.array([N + 1], np.uint64),
    }
    write_snapshot(args.out, (1.0, 1.0, 1.0), 0.0,
                   {PTYPE_GAS: gas, PTYPE_STARS: star})
    print(f"wrote {args.out}: {N} gas + 1 star")


if __name__ == "__main__":
    main()
