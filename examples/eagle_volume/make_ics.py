#!/usr/bin/env python
"""Generate EAGLE_low_z-style gas + DM + stars (+ seed BH) ICs.

The reference benchmark (examples/EAGLE_low_z/EAGLE_25) ships a z=0.1
snapshot of the actual EAGLE run (~52M DM + ~50M gas + ~2M stars);
with zero egress this script synthesizes a structurally equivalent
small volume: Zel'dovich-displaced gas/DM lattices (reusing the
SmallCosmoVolume generator), a sprinkling of star particles at the
densest lattice sites (as a z>0 volume would have), and one seed black
hole — enough particle species to exercise the full EAGLE model stack
(cooling, chemistry, SF, feedback, enrichment, AGN) end-to-end.

Usage: python make_ics.py [--n 16] [--L 25] [--z 9] [-o ic.hdf5]
"""

import argparse
import importlib.util
import os
import sys

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))


def _load_scv():
    """Import the SmallCosmoVolume IC generator by path."""
    path = os.path.join(_HERE, os.pardir, "small_cosmo_volume",
                        "make_ics.py")
    spec = importlib.util.spec_from_file_location("scv_make_ics", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--L", type=float, default=25.0, help="box [Mpc]")
    ap.add_argument("--z", type=float, default=9.0, help="start redshift")
    ap.add_argument("--star-frac", type=float, default=0.02,
                    help="fraction of gas lattice sites spawned as stars")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("-o", "--output", default="ic.hdf5")
    args = ap.parse_args()

    scv = _load_scv()
    # build the gas+DM volume with the SmallCosmoVolume generator, then
    # carve the star population out of the gas lattice
    sys.argv = ["make_ics.py", "--n", str(args.n), "--L", str(args.L),
                "--z", str(args.z), "-o", args.output]
    scv.main()

    import h5py
    rng = np.random.default_rng(args.seed)
    with h5py.File(args.output, "r+") as f:
        g = f["PartType0"]
        pos = g["Coordinates"][...]
        vel = g["Velocities"][...]
        m = g["Masses"][...]
        u = g["InternalEnergies"][...]
        h = g["SmoothingLengths"][...]
        pid = g["ParticleIDs"][...]
        n = len(pos)
        n_star = max(1, int(args.star_frac * n))
        star_idx = rng.choice(n, n_star, replace=False)
        keep = np.ones(n, bool)
        keep[star_idx] = False

        spos, svel = pos[star_idx], vel[star_idx]
        sm = m[star_idx]
        spid = pid[star_idx] + 2 * n  # disjoint ID range

        del f["PartType0"]
        g = f.create_group("PartType0")
        g.create_dataset("Coordinates", data=pos[keep])
        g.create_dataset("Velocities", data=vel[keep])
        g.create_dataset("Masses", data=m[keep])
        g.create_dataset("InternalEnergies", data=u[keep])
        g.create_dataset("SmoothingLengths", data=h[keep])
        g.create_dataset("ParticleIDs", data=pid[keep])

        s = f.create_group("PartType4")
        s.create_dataset("Coordinates", data=spos)
        s.create_dataset("Velocities", data=svel)
        s.create_dataset("Masses", data=sm)
        s.create_dataset("ParticleIDs", data=spid)

        # one seed black hole at the box centre
        L = f["Header"].attrs["BoxSize"]
        L = float(L[0] if np.ndim(L) else L)
        b = f.create_group("PartType5")
        b.create_dataset("Coordinates",
                         data=np.asarray([[L / 2, L / 2, L / 2]]))
        b.create_dataset("Velocities", data=np.zeros((1, 3), np.float32))
        b.create_dataset("Masses", data=np.asarray([sm.mean()],
                                                   np.float32))
        b.create_dataset("ParticleIDs",
                         data=np.asarray([int(spid.max()) + 1],
                                         np.uint64))

        npart = f["Header"].attrs["NumPart_ThisFile"].copy()
        npart[0] = n - n_star
        npart[4] = n_star
        npart[5] = 1
        f["Header"].attrs["NumPart_ThisFile"] = npart
        f["Header"].attrs["NumPart_Total"] = npart

    print(f"wrote {args.output}: {n - n_star} gas + {n} DM + "
          f"{n_star} stars + 1 BH")


if __name__ == "__main__":
    main()
