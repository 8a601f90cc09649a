#!/bin/bash
# TPU bench sweep (NOTES_ROUND4 perf TODO): run serially, one TPU job at
# a time; each line of bench_sweep.jsonl is one bench.py JSON result
# tagged with the knob values.  Probe the tunnel first — if the probe
# hangs the tunnel is wedged and nothing should run.
set -u
cd "$(dirname "$0")/.."
OUT=bench_sweep.jsonl
probe() {
    timeout 120 python -c "
import jax, jax.numpy as jnp, numpy as np
np.asarray(jnp.dot(jnp.ones((256,256), jnp.bfloat16),
                   jnp.ones((256,256), jnp.bfloat16)))
print('probe ok')" || { echo "TUNNEL WEDGED — aborting"; exit 1; }
}
run() {  # run NAME [ENV=V]...
    name=$1; shift
    echo "=== $name : $* ==="
    env "$@" timeout 2400 python bench.py | tail -1 \
        | sed "s/^{/{\"sweep\": \"$name\", /" | tee -a "$OUT"
}
probe
run baseline
run mesh96   BENCH_MESH_N=96
run jb16     BENCH_JB=16
run mesh96-jb16 BENCH_MESH_N=96 BENCH_JB=16
run launch32 BENCH_PER_LAUNCH=32
run slack11  BENCH_SLACK=1.1
run combo    BENCH_MESH_N=96 BENCH_JB=16 BENCH_SLACK=1.1 BENCH_PER_LAUNCH=32
# scale-up: 1.02M particles (HBM pressure + block culling at size).
# The flat kernel's 32-block bitmask caps column occupancy at 32*JB:
# 1M particles need >=1000 columns, i.e. r_cut <= ~0.03 -> mesh_N=192
run n80      BENCH_N1=80 BENCH_MESH_N=192
run n80-tuned BENCH_N1=80 BENCH_MESH_N=192 BENCH_SLACK=1.1 BENCH_PER_LAUNCH=32
echo "sweep done -> $OUT"
