"""Snapshot output modes: lossy filters, XMF sidecar, distributed writes
(io_compression.h:28, xmf.c, distributed_io.c:751)."""

import numpy as np
import h5py

from swift_subtask_dev_tpu.io.snapshot import (
    write_snapshot, read_snapshot, write_snapshot_distributed,
    apply_lossy_filter, PTYPE_GAS, PTYPE_DM)


def _parts(n=500, seed=0):
    rng = np.random.default_rng(seed)
    return {PTYPE_GAS: {
        "Coordinates": rng.random((n, 3)),
        "Velocities": rng.normal(size=(n, 3)).astype(np.float32),
        "Masses": rng.random(n).astype(np.float32) + 0.5,
        "ParticleIDs": np.arange(n, dtype=np.uint64)}}


def test_lossy_filters_bound_error():
    x = (np.random.default_rng(1).random(10000).astype(np.float32)
         + 0.5)
    for filt, bits in (("FMantissa9", 9), ("FMantissa13", 13)):
        y = apply_lossy_filter(x, filt)
        rel = np.abs(y - x) / x
        assert rel.max() <= 2.0 ** (-bits), (filt, rel.max())
    y = apply_lossy_filter(np.float64(x) * 1.0, "DScale2")
    assert np.abs(y - x).max() <= 0.5 * 1e-2 + 1e-12


def test_snapshot_with_compression_and_xmf(tmp_path):
    parts = _parts()
    path = str(tmp_path / "snap.hdf5")
    write_snapshot(path, (1.0, 1.0, 1.0), 0.5, parts,
                   compression={"Coordinates": "FMantissa13",
                                "Velocities": "FMantissa9"},
                   write_xmf_sidecar=True)
    hdr, out, _ = read_snapshot(path)
    ref = parts[PTYPE_GAS]["Coordinates"]
    got = out[PTYPE_GAS]["Coordinates"]
    assert np.abs(got - ref).max() < 2.0 ** -12   # 13-bit mantissa
    with h5py.File(path) as f:
        ds = f[f"PartType{PTYPE_GAS}/Velocities"]
        assert ds.compression == "gzip"
        assert ds.attrs["Lossy compression filter"] == b"FMantissa9"
    xmf = (tmp_path / "snap.xmf").read_text()
    assert "Polyvertex" in xmf and "Coordinates" in xmf


def test_distributed_snapshot_roundtrip(tmp_path):
    parts = _parts(n=700)
    parts[PTYPE_DM] = {
        "Coordinates": np.random.default_rng(2).random((300, 3)),
        "Velocities": np.zeros((300, 3), np.float32),
        "Masses": np.ones(300, np.float32),
        "ParticleIDs": np.arange(300, dtype=np.uint64)}
    base = str(tmp_path / "snapd_0000")
    meta = write_snapshot_distributed(base, (1.0, 1.0, 1.0), 0.2,
                                      parts, n_files=3)
    # pieces exist
    for i in range(3):
        assert (tmp_path / f"snapd_0000.{i}.hdf5").exists()
    # the virtual meta-file reads back the full arrays
    with h5py.File(meta) as f:
        assert int(f["Header"].attrs["NumFilesPerSnapshot"]) == 3
        for pt in (PTYPE_GAS, PTYPE_DM):
            got = f[f"PartType{pt}/Coordinates"][...]
            np.testing.assert_allclose(got,
                                       parts[pt]["Coordinates"])
