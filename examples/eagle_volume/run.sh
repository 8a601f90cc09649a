#!/bin/bash
# EAGLE_25 run.sh analog: generate ICs if absent, run the full EAGLE
# model stack (cooling + chemistry + SF + feedback + enrichment + AGN)
# on a gas+DM+stars+BH comoving volume through the MultiEngine.
set -e
if [ ! -e ic.hdf5 ]; then
    python make_ics.py --n 16 --L 25 --z 9
fi
swift-tpu run.yml --eagle --black-holes "$@"
