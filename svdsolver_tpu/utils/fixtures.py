"""Binary matrix fixture I/O in the reference's on-disk format.

The reference writes matrices as raw row-major element dumps
(matrix.h:458-475) named ``{kind}_{float|double}_{n}_{n}.bin``.  Its reader
always consumes ``sizeof(float)`` per element (matrix.h:484 — a bug that makes
double fixtures unreadable there); here dtype is honored.  Unlike the
reference's append-mode ``write`` (matrix.h:462), writes truncate.
"""

import os

import numpy as np

REPO_DATA = os.path.join(os.path.dirname(__file__), "..", "..", "data")


def read_matrix(path, n_rows, n_cols, dtype=np.float32):
    """Read a raw row-major binary matrix (reference format)."""
    a = np.fromfile(path, dtype=dtype, count=n_rows * n_cols)
    if a.size != n_rows * n_cols:
        raise ValueError(
            f"{path}: expected {n_rows * n_cols} elements, got {a.size}"
        )
    return a.reshape(n_rows, n_cols)


def write_matrix(path, a):
    """Write a matrix as raw row-major elements (reference format, truncating)."""
    np.ascontiguousarray(a).tofile(path)


def fixture_path(kind, n, dtype=np.float32, data_dir=None):
    """Path to a shipped fixture: kind in {test, band, bidiagonal}, n in {64, 512}."""
    tname = "float" if np.dtype(dtype) == np.float32 else "double"
    data_dir = data_dir or REPO_DATA
    return os.path.join(data_dir, f"{kind}_{tname}_{n}_{n}.bin")


def load_fixture(kind, n, dtype=np.float32, data_dir=None):
    """Load a shipped fixture matrix as a numpy array."""
    return read_matrix(fixture_path(kind, n, dtype, data_dir), n, n, dtype)


def band_mse(A, B, band):
    """Band-limited mean absolute-value error (reference: matrix_gpu.h:438-453).

    Compares ``|A|`` vs ``|B|`` over the diagonal band ``j - i in [0, band]``
    only — Householder reductions are sign-indeterminate, so the reference's
    ``mse`` compares magnitudes.  Returns the mean squared difference of
    magnitudes over the band.
    """
    A = np.asarray(A)
    B = np.asarray(B)
    n, m = A.shape
    i, j = np.ogrid[:n, :m]
    mask = (j - i >= 0) & (j - i <= band)
    diff = np.abs(A[mask]) - np.abs(B[mask])
    return float(np.mean(diff * diff))


def ensure_generated_fixtures(n, dtype=np.float32, band=4, seed=586, data_dir=None):
    """Generate missing {test, band, bidiagonal} fixtures with the NATIVE
    C++ ladder (utils/native) and cache them under data/.

    The reference README advertises ``check 1024`` but ships no 1024
    fixture (reference README.md:116 vs data/); here any size can be
    checked, with the band/bidiagonal references produced by the
    *independent* C++ implementation — so the check stays a genuine
    cross-implementation differential, exactly the reference's own test
    philosophy (CPU-as-oracle, SURVEY.md section 4).  Deterministic: seeded
    uniform [0, 5] test matrix (the reference generator's distribution,
    svd_cpu.cpp:55).
    """
    paths = {
        k: fixture_path(k, n, dtype, data_dir)
        for k in ("test", "band", "bidiagonal")
    }
    if all(os.path.exists(p) for p in paths.values()):
        return
    from svdsolver_tpu.utils import native

    rng = np.random.default_rng(seed)
    A = rng.uniform(0.0, 5.0, size=(n, n)).astype(dtype)
    write_matrix(paths["test"], A)
    Ab = native.dense_to_band(A, band)
    write_matrix(paths["band"], Ab)
    d, e = native.band_to_bidiag(Ab.copy(), band)
    write_matrix(
        paths["bidiagonal"], np.diag(d) + np.diag(e, 1)
    )  # fixtures store the full bidiagonal matrix (reference layout)
