#!/bin/bash
# StromgrenSphere_3D run.sh analog: generate ICs if absent, run RT
# end-to-end (--radiation; GEAR M1 by default, SPHM1RT via the YAML).
set -e
if [ ! -e ic.hdf5 ]; then
    python make_ics.py --n 16
fi
swift-tpu run.yml --hydro --radiation "$@"
