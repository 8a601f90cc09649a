#!/usr/bin/env python
"""Per-field tolerance diff of two ASCII particle tables.

The reference's acceptance machinery (tests/difffloat.py driven by
tests/tolerance_27_normal.dat & friends): both files share a header
line naming the fields; the tolerance file carries, under the same
header, one row of ABSOLUTE tolerances and one row of RELATIVE
tolerances per column (the reference's third row bounds the allowed
violating fraction — supported here as an optional third row).

Usage:  difffloat.py table_a table_b tolerance.dat [n_check]
Exit 0 iff every field of every compared row is within tolerance.
"""

from __future__ import annotations

import sys

import numpy as np


def compare(file_a: str, file_b: str, tol_file: str,
            n_check: int = -1) -> int:
    """Return the number of out-of-tolerance entries (0 = pass)."""
    with open(file_a) as f:
        header = f.readline().split()
    fields = header[1:] if header and header[0] in ("#", "#ID") \
        else header
    if fields and fields[0] == "ID":
        fields = fields[1:]

    a = np.atleast_2d(np.loadtxt(file_a))
    b = np.atleast_2d(np.loadtxt(file_b))
    if a.shape != b.shape:
        print(f"shape mismatch: {a.shape} vs {b.shape}")
        return 1
    if n_check > 0:
        a, b = a[:n_check], b[:n_check]

    tol = np.atleast_2d(np.loadtxt(tol_file))
    abs_tol = tol[0][1:] if tol.shape[1] == a.shape[1] else tol[0]
    rel_tol = tol[1][1:] if tol.shape[1] == a.shape[1] else tol[1]
    frac_ok = None
    if tol.shape[0] >= 3:
        frac_ok = tol[2][1:] if tol.shape[1] == a.shape[1] else tol[2]

    # column 0 is the particle ID: must match exactly
    if not np.array_equal(a[:, 0], b[:, 0]):
        print("particle ID columns differ")
        return 1

    n_bad_total = 0
    for j in range(1, a.shape[1]):
        x, y = a[:, j], b[:, j]
        d = np.abs(x - y)
        scale = 0.5 * (np.abs(x) + np.abs(y))
        ok = (d <= abs_tol[j - 1]) | (d <= rel_tol[j - 1] * scale)
        bad = np.flatnonzero(~ok)
        allowed = 0
        if frac_ok is not None:
            allowed = int(np.floor(frac_ok[j - 1] * len(x)))
        if len(bad) > allowed:
            name = fields[j - 1] if j - 1 < len(fields) else f"col{j}"
            print(f"field {name}: {len(bad)}/{len(x)} beyond "
                  f"abs={abs_tol[j-1]:g} rel={rel_tol[j-1]:g}; worst "
                  f"|d|={d[bad].max():g} at ID {int(a[bad[np.argmax(d[bad])], 0])}")
            n_bad_total += len(bad) - allowed
    return n_bad_total


def main() -> int:
    if len(sys.argv) < 4:
        print(__doc__)
        return 2
    n_check = int(sys.argv[4]) if len(sys.argv) > 4 else -1
    n_bad = compare(sys.argv[1], sys.argv[2], sys.argv[3], n_check)
    if n_bad:
        print(f"FAILED: {n_bad} out-of-tolerance entries")
        return 1
    print("OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
