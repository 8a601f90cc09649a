#!/usr/bin/env python
"""Chunked test runner — the committed way to run the full suite.

One long-lived pytest process accumulates XLA CPU compiler state and
eventually segfaults (observed twice at ~97 tests: the same test passes
alone, the suite crashes inside Mosaic/XLA compilation).  This runner
defuses that by running the suite as BATCHES of test files, each in a
fresh interpreter, serially (concurrent pytest processes also provoke
the segfault — see NOTES_ROUND3).

    python run_tests.py              # default tier (skips -m slow files)
    python run_tests.py --all        # everything, including slow files
    python run_tests.py --files a b  # just these files (fresh process)

Behavior:
* batches of --batch files (default 4) run via `python -m pytest -x -q`;
* a batch that dies on a signal (segfault) is retried file-by-file so
  one compiler crash cannot take down unrelated files' results;
* per-file wall times are written to .test_times.json (informational);
* exit 0 iff every file passed.

Slow-tier files (huge interpret-mode Pallas compiles or long
engine-convergence runs) are listed in SLOW below; the committed CI
config (.github/workflows/tests.yml) runs the default tier on pushes
and the --all tier on a nightly schedule.
"""

import argparse
import json
import os
import signal
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
TESTS = os.path.join(HERE, "tests")

# Files excluded from the default tier: multi-minute interpret-mode
# Pallas compiles / long convergence loops.  They still run under
# --all (and each can be run alone via --files).
SLOW = {
    "test_gizmo.py",            # 5 engine variants x interpret compile
    "test_moving_mesh_2d.py",   # 2D Voronoi Sod evolution
    "test_cosmo_engine.py",     # comoving KDK long run
    "test_rt.py",               # RT subcycle engine runs
    "test_spin_jet.py",         # SPIN_JET engine composition
    "test_parallel_prod.py",    # 8-device sharded production step
    "test_multi_flat.py",       # multi-species flat engine matches
    "test_cli_eagle.py",        # full EAGLE volume CLI subprocess
    "test_moving_mesh_3d.py",   # 3D Voronoi Sod evolution (~15 min)
    "test_adaptive_mac.py",     # order-5 T-matrix builds x2 (~12 min)
    "test_cosmo_conservation.py",  # dt-refined comoving DMO runs
}


def run_files(files, timeout=3600):
    """Run one fresh pytest over `files`; return (rc, wall_s)."""
    cmd = [sys.executable, "-m", "pytest", "-x", "-q",
           "-p", "no:cacheprovider"] + files
    t0 = time.time()
    proc = subprocess.run(cmd, cwd=HERE, timeout=timeout)
    return proc.returncode, time.time() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--all", action="store_true",
                    help="include the slow tier")
    ap.add_argument("--slow-only", action="store_true",
                    help="run only the slow tier")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--files", nargs="*", default=None)
    args = ap.parse_args()

    if args.files:
        names = [os.path.basename(f) for f in args.files]
    else:
        names = sorted(f for f in os.listdir(TESTS)
                       if f.startswith("test_") and f.endswith(".py"))
        if args.slow_only:
            names = [f for f in names if f in SLOW]
        elif not args.all:
            names = [f for f in names if f not in SLOW]
    paths = [os.path.join("tests", f) for f in names]

    failed, crashed, times = [], [], {}
    t_start = time.time()
    for i in range(0, len(paths), args.batch):
        batch = paths[i:i + args.batch]
        print(f"== batch {i // args.batch + 1}: "
              f"{' '.join(os.path.basename(b) for b in batch)}",
              flush=True)
        rc, dt = run_files(batch)
        if rc < 0 or rc == -signal.SIGSEGV or rc >= 128:
            # interpreter died (segfault/abort): retry file-by-file in
            # fresh processes so the crash is isolated to one file
            print(f"   batch died (rc={rc}); retrying per-file",
                  flush=True)
            for p in batch:
                rc1, dt1 = run_files([p])
                times[os.path.basename(p)] = round(dt1, 1)
                if rc1 < 0 or rc1 >= 128:
                    crashed.append(p)
                elif rc1 != 0:
                    failed.append(p)
        elif rc != 0:
            # a test failure: rerun per-file to attribute it (cheap,
            # -x stopped the batch early anyway)
            for p in batch:
                rc1, dt1 = run_files([p])
                times[os.path.basename(p)] = round(dt1, 1)
                if rc1 != 0:
                    failed.append(p)
        else:
            per = round(dt / len(batch), 1)
            for p in batch:
                times.setdefault(os.path.basename(p), per)
    wall = time.time() - t_start

    with open(os.path.join(HERE, ".test_times.json"), "w") as f:
        json.dump({"wall_s": round(wall, 1), "files": times}, f, indent=1,
                  sort_keys=True)
    print(f"== {len(paths)} files in {wall / 60:.1f} min")
    if failed:
        print("FAILED:", *failed)
    if crashed:
        print("CRASHED:", *crashed)
    sys.exit(1 if (failed or crashed) else 0)


if __name__ == "__main__":
    main()
