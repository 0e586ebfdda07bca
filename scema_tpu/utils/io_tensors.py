"""Text tensor-file IO compatible with the reference wire formats.

The reference exchanges tensors between executables via one-value-per-line
text files (reference: read_write.h:87-260): scalars, rank-1 (3 lines),
symmetric rank-2 (upper triangle, row-major: 00,01,02,11,12,22 — 6 lines),
and symmetric rank-4 (36 lines: outer upper-tri pair-index (k,l) row-major,
inner pair (m,n) likewise).  These are the ``init.<mat>.{length,stress,
stiff,density}`` files produced by material initialization and consumed by
the FE problem (stmd_sync.h:361-489, FE_problem.h:402-430).

NOTE the file order for rank-2 (00,01,02,11,12,22) differs from the in-memory
Voigt order (00,11,22,01,02,12) used by scale_bridging_data/access_raw_entry;
conversions here are explicit.
"""
from __future__ import annotations

import numpy as np

# File (upper-triangle row-major) pair order used by read/write_tensor.
_FILE_PAIRS = ((0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2))


def read_scalar(path: str) -> float:
    with open(path) as f:
        return float(f.readline().strip())


def write_scalar(path: str, value: float) -> None:
    with open(path, "w") as f:
        f.write(f"{value:.16g}\n")


def read_vector(path: str) -> np.ndarray:
    with open(path) as f:
        vals = [float(f.readline().strip()) for _ in range(3)]
    return np.asarray(vals)


def write_vector(path: str, v) -> None:
    v = np.asarray(v)
    with open(path, "w") as f:
        for k in range(3):
            f.write(f"{float(v[k]):.16g}\n")


def read_sym2(path: str) -> np.ndarray:
    """Read a symmetric 3x3 tensor (6 lines, file order)."""
    with open(path) as f:
        vals = [float(f.readline().strip()) for _ in range(6)]
    t = np.zeros((3, 3))
    for v, (i, j) in zip(vals, _FILE_PAIRS):
        t[i, j] = v
        t[j, i] = v
    return t


def write_sym2(path: str, t) -> None:
    t = np.asarray(t)
    with open(path, "w") as f:
        for (i, j) in _FILE_PAIRS:
            f.write(f"{float(t[i, j]):.16g}\n")


def read_sym4(path: str) -> np.ndarray:
    """Read a symmetric rank-4 tensor (36 lines) into a full 3x3x3x3 array."""
    with open(path) as f:
        vals = [float(f.readline().strip()) for _ in range(36)]
    c = np.zeros((3, 3, 3, 3))
    idx = 0
    for (k, l) in _FILE_PAIRS:
        for (m, n) in _FILE_PAIRS:
            v = vals[idx]
            idx += 1
            for a, b in {(k, l), (l, k)}:
                for cc, d in {(m, n), (n, m)}:
                    c[a, b, cc, d] = v
    return c


def write_sym4(path: str, c) -> None:
    c = np.asarray(c)
    with open(path, "w") as f:
        for (k, l) in _FILE_PAIRS:
            for (m, n) in _FILE_PAIRS:
                f.write(f"{float(c[k, l, m, n]):.16g}\n")
