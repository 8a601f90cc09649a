"""Tolerance-file acceptance diffs — the reference's test27cells
pattern (test27cells.c:372 + tests/difffloat.py + tolerance_27_*.dat):
the PRODUCTION pair engine's density-loop outputs, dumped as an ASCII
particle table, are diffed field-by-field against an independent f64
brute-force oracle under committed per-field tolerance files
(tests/tolerances/*.dat, same layout as the reference's)."""

import subprocess
import sys

import jax.numpy as jnp
import numpy as np

from swift_subtask_dev_tpu.grid import CellGrid
from swift_subtask_dev_tpu.grid.cellgrid import bucket_fields
from swift_subtask_dev_tpu.ics import uniform_box_ic
from swift_subtask_dev_tpu.models.sph.sphenix import SPHENIXParams
from swift_subtask_dev_tpu.ops import hydro_pallas

HEADER = ("#   ID        rho      rho_dh     wcount   wcount_dh"
          "      div_v    curl_vx    curl_vy    curl_vz")


def _brute_force_density_f64(pos, v, m, h, box, P):
    """O(N^2) f64 oracle of the RAW density sums — the exact math of
    models/sph/sphenix.density_terms (M4 cubic, sigma = 16/pi;
    kernels.deval conventions: u = r/h, x = u/gamma, w = C g^-3 f(x),
    dw/du = C g^-4 f'(x)) evaluated in float64."""
    n = len(pos)
    pos = np.asarray(pos, np.float64)
    v = np.asarray(v, np.float64)
    m = np.asarray(m, np.float64)
    h = np.asarray(h, np.float64)
    box = np.asarray(box, np.float64)
    out = np.zeros((n, 8))
    sigma = 16.0 / np.pi
    g = float(P.kernel.gamma)

    def f_and_fp(x):
        f = np.where(x < 0.5, 3 * x ** 3 - 3 * x ** 2 + 0.5,
                     np.where(x < 1.0, (1 - x) ** 3, 0.0))
        fp = np.where(x < 0.5, 9 * x ** 2 - 6 * x,
                      np.where(x < 1.0, -3 * (1 - x) ** 2, 0.0))
        return f, fp

    for i in range(n):
        d = pos[i] - pos
        d -= box * np.round(d / box)
        r2 = (d ** 2).sum(-1)
        r2[i] = np.inf                     # r2 > 0 in the kernel
        sel = r2 < (g * h[i]) ** 2
        r = np.sqrt(r2[sel])
        u = r / h[i]
        f, fp = f_and_fp(u / g)
        wi = sigma * g ** -3 * f
        wi_dx = sigma * g ** -4 * fp       # dw/du
        mj = m[sel]
        faci = mj * wi_dx / np.maximum(r, 1e-300)
        dv = v[i] - v[sel]
        dxs = d[sel]
        dvdr = (dv * dxs).sum(-1)
        kick = 3.0 * wi + u * wi_dx
        out[i, 0] = (mj * wi).sum()
        out[i, 1] = -(mj * kick).sum()
        out[i, 2] = wi.sum()
        out[i, 3] = -kick.sum()
        out[i, 4] = -(faci * dvdr).sum()
        cr = np.cross(dv, dxs)
        out[i, 5:8] = (faci[:, None] * cr).sum(0)
    return out


def _production_density_table(pos, v, m, h, box, P):
    grid = CellGrid.build_columns(
        box, interaction_range=float(h.max() * P.kernel.gamma * 1.05),
        pos=pos)
    base = {"m": jnp.asarray(m), "h": jnp.asarray(h),
            "v": jnp.asarray(v),
            "pid": jnp.arange(len(pos), dtype=jnp.float32)}
    out, mask, off, nov = bucket_fields(grid, jnp.asarray(pos), base,
                                        zsort=True)
    assert int(nov) == 0
    s = {"mask": mask, "off": off, "h": out["h"], "m": out["m"],
         "v": out["v"]}
    d = hydro_pallas.density_loop(grid, s, P, engine="flat")
    msk = np.asarray(mask) > 0
    pid = np.asarray(out["pid"])[msk].astype(np.int64)
    cols = np.stack([
        np.asarray(d["rho"])[msk], np.asarray(d["rho_dh"])[msk],
        np.asarray(d["wcount"])[msk], np.asarray(d["wcount_dh"])[msk],
        np.asarray(d["div_v"])[msk],
        np.asarray(d["rot_v"])[msk][:, 0],
        np.asarray(d["rot_v"])[msk][:, 1],
        np.asarray(d["rot_v"])[msk][:, 2]], axis=-1)
    order = np.argsort(pid)
    return pid[order], cols[order]


def _run_case(tmp_path, jitter, tol_name):
    ic = uniform_box_ic(n=6, jitter=jitter, seed=42)
    P = SPHENIXParams(h_max=float(ic["h"].max() * 3))
    rng = np.random.default_rng(1)
    v = rng.normal(0, 0.1, ic["v"].shape).astype(np.float32)

    pid, prod = _production_density_table(ic["pos"], v, ic["m"],
                                          ic["h"], ic["box"], P)
    oracle = _brute_force_density_f64(ic["pos"], v, ic["m"], ic["h"],
                                      ic["box"], P)[pid]

    fa = tmp_path / "production.dat"
    fb = tmp_path / "oracle.dat"
    for path, tab in ((fa, prod), (fb, oracle)):
        with open(path, "w") as f:
            f.write(HEADER + "\n")
            for i, row in zip(pid, tab):
                f.write(f"{i:6d} " + " ".join(f"{x: .9e}" for x in row)
                        + "\n")
    import os
    tol = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "tolerances", tol_name)
    r = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(os.path.dirname(
             os.path.abspath(__file__))), "tools", "difffloat.py"),
         str(fa), str(fb), tol],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, f"difffloat failed:\n{r.stdout}"


def test_density_tolerance_normal(tmp_path):
    """test27cells 'normal' analog: near-lattice IC."""
    _run_case(tmp_path, 0.05, "tolerance_27_normal.dat")


def test_density_tolerance_perturbed(tmp_path):
    """test27cells 'perturbed' analog: strongly jittered IC."""
    _run_case(tmp_path, 0.4, "tolerance_27_perturbed.dat")


def test_difffloat_catches_errors(tmp_path):
    """The gate must FAIL on a corrupted field (a diff tool that always
    passes is worse than none)."""
    ic = uniform_box_ic(n=6, jitter=0.05, seed=42)
    P = SPHENIXParams(h_max=float(ic["h"].max() * 3))
    rng = np.random.default_rng(1)
    v = rng.normal(0, 0.1, ic["v"].shape).astype(np.float32)
    pid, prod = _production_density_table(ic["pos"], v, ic["m"],
                                          ic["h"], ic["box"], P)
    bad = prod.copy()
    bad[:, 0] *= 1.01                       # 1% density error
    fa, fb = tmp_path / "a.dat", tmp_path / "b.dat"
    for path, tab in ((fa, prod), (fb, bad)):
        with open(path, "w") as f:
            f.write(HEADER + "\n")
            for i, row in zip(pid, tab):
                f.write(f"{i:6d} " + " ".join(f"{x: .9e}" for x in row)
                        + "\n")
    import importlib.util
    import os
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tol = os.path.join(root, "tests", "tolerances",
                       "tolerance_27_normal.dat")
    spec = importlib.util.spec_from_file_location(
        "difffloat", os.path.join(root, "tools", "difffloat.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert mod.compare(str(fa), str(fb), tol) > 0
