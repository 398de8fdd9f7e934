"""ctypes bindings for the native host runtime (native/libsvd_native.so).

Role (mirrors the reference's host C++ around its CUDA kernels,
svd_cpu.h / svd_cuda_2.cu:1152 sub-cutoff fallback): a fast CPU
implementation of the whole reduction ladder used as

* a differential oracle in tests (device kernels vs native host math),
* a host fallback for problems below the device-worthwhile cutoff,
* a fast generator for golden fixtures.

The library is built on demand with ``make -C native`` (g++, OpenMP).
"""

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libsvd_native.so")
_lib = None


def _build():
    subprocess.run(
        ["make", "-C", _NATIVE_DIR], check=True, capture_output=True
    )


def get_lib():
    """Load (building if needed) the native library; raises OSError if the
    toolchain is unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        _build()
    lib = ctypes.CDLL(_LIB_PATH)
    c_long = ctypes.c_long
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    for suffix, fp in (("f32", f32p), ("f64", f64p)):
        getattr(lib, f"svdn_gk_brd_{suffix}").argtypes = [fp, c_long, c_long, fp, fp]
        getattr(lib, f"svdn_dense_to_band_{suffix}").argtypes = [fp, c_long, c_long]
        getattr(lib, f"svdn_band_to_bidiag_{suffix}").argtypes = [
            fp, c_long, c_long, fp, fp]
        qrd = getattr(lib, f"svdn_qrd_{suffix}")
        qrd.argtypes = [fp, fp, c_long, c_long]
        qrd.restype = c_long
        sv = getattr(lib, f"svdn_svdvals_{suffix}")
        sv.argtypes = [fp, c_long, c_long, fp]
        sv.restype = c_long
    _lib = lib
    return lib


def _suffix(dtype):
    return "f32" if np.dtype(dtype) == np.float32 else "f64"


def gk_brd(A):
    """Golub-Kahan bidiagonalization on the host; returns (d, e)."""
    A = np.ascontiguousarray(A).copy()
    m, n = A.shape
    d = np.zeros(n, A.dtype)
    e = np.zeros(max(n - 1, 1), A.dtype)
    getattr(get_lib(), f"svdn_gk_brd_{_suffix(A.dtype)}")(A, m, n, d, e)
    return d, e[: n - 1]


def dense_to_band(A, band):
    """Stage I on the host; returns the banded matrix."""
    A = np.ascontiguousarray(A).copy()
    getattr(get_lib(), f"svdn_dense_to_band_{_suffix(A.dtype)}")(
        A, A.shape[0], band)
    return A


def band_to_bidiag(A, band):
    """Stage II on the host; returns (d, e)."""
    A = np.ascontiguousarray(A).copy()
    n = A.shape[0]
    d = np.zeros(n, A.dtype)
    e = np.zeros(max(n - 1, 1), A.dtype)
    getattr(get_lib(), f"svdn_band_to_bidiag_{_suffix(A.dtype)}")(
        A, n, band, d, e)
    return d, e[: n - 1]


def qrd(d, e, max_sweeps=0):
    """Convergent QR diagonalization on the host; returns sorted sigma."""
    d = np.ascontiguousarray(d).copy()
    e = np.ascontiguousarray(e).copy()
    if e.size == 0:
        e = np.zeros(1, d.dtype)
    getattr(get_lib(), f"svdn_qrd_{_suffix(d.dtype)}")(
        d, e, d.shape[0], max_sweeps)
    return d


def svdvals(A, band=32):
    """Full host pipeline: dense -> band -> bidiagonal -> sigma (descending)."""
    A = np.ascontiguousarray(A).copy()
    n = A.shape[0]
    sigma = np.zeros(n, A.dtype)
    getattr(get_lib(), f"svdn_svdvals_{_suffix(A.dtype)}")(A, n, band, sigma)
    return sigma
