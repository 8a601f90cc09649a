#!/bin/bash
# SmallCosmoVolume_hydro run.sh analog: generate ICs if absent, run the
# gas+DM comoving volume end-to-end through the MultiEngine.
set -e
if [ ! -e ic.hdf5 ]; then
    python make_ics.py --n 16 --L 25 --z 9
fi
swift-tpu run.yml --hydro --self-gravity --cosmology --cooling "$@"
