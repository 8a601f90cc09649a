"""End-to-end --eagle CLI test: the full EAGLE model stack (table
cooling + chemistry + SF + feedback + enrichment + AGN) on a synthesized
gas+DM+stars+BH cosmological volume — the reference's EAGLE_low_z
benchmark configuration (examples/EAGLE_low_z/EAGLE_25) at test size,
driven through examples/eagle_volume/."""

import os
import subprocess
import sys

import numpy as np

_EX = os.path.join(os.path.dirname(__file__), os.pardir, "examples",
                   "eagle_volume")


def test_cli_eagle_full_stack(tmp_path):
    r = subprocess.run(
        [sys.executable, os.path.join(_EX, "make_ics.py"),
         "--n", "8", "--L", "25", "--z", "9",
         "-o", str(tmp_path / "ic.hdf5")],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr

    import shutil
    shutil.copy(os.path.join(_EX, "run.yml"), tmp_path / "run.yml")
    r = subprocess.run(
        [sys.executable, "-m", "swift_subtask_dev_tpu.cli",
         str(tmp_path / "run.yml"), "--eagle", "--black-holes",
         "--cpu", "-v", "-n", "3"],
        cwd=tmp_path, capture_output=True, text=True)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "done:" in r.stdout

    # a snapshot with every species present was written
    snaps = sorted(tmp_path.glob("eagle_*.hdf5"))
    assert snaps, os.listdir(tmp_path)
    import h5py
    with h5py.File(snaps[0]) as f:
        for pt in ("PartType0", "PartType1", "PartType4", "PartType5"):
            assert pt in f, list(f)
        # chemistry carriers ride the gas (chemistry_io.h analog)
        assert "MetalMassFractions" in f["PartType0"] or \
            "Metallicities" in f["PartType0"], list(f["PartType0"])
        u = f["PartType0/InternalEnergies"][...]
        assert np.isfinite(u).all() and (u > 0).all()
