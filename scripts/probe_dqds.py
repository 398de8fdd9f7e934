"""Sweep-count probe for the dqds shift battery (run on CPU, f64).

Measures dqds_svdvals sweep counts + max relative error on a battery of
spectra classes, SIDE BY SIDE with LAPACK's own dlasq2 (called via ctypes
into liblapack; its Z(2N+3) output is the iteration count) — the honest
bar for shift-selection quality.  Round-4 calibration: LAPACK dlasq2
itself takes 877 iterations on the "stall" spectrum and ~6.0k across this
battery, i.e. ~7 iterations/eigenvalue — the "few hundred total / 2-4 per
eigenvalue" folklore bar is not what LAPACK achieves on these spectra.
"""

import ctypes
import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

from svdsolver_tpu.models.diagonalize import dqds_svdvals

_LAPACK_CANDIDATES = (
    "/usr/lib/x86_64-linux-gnu/liblapack.so.3",
    "liblapack.so.3",
    "liblapack.so",
)


def _load_dlasq2():
    for path in _LAPACK_CANDIDATES:
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            continue
        fn = getattr(lib, "dlasq2_", None)
        if fn is not None:
            fn.argtypes = [
                ctypes.POINTER(ctypes.c_int),
                np.ctypeslib.ndpointer(np.float64),
                ctypes.POINTER(ctypes.c_int),
            ]
            return fn
    return None


def lapack_dlasq2(d, e):
    """(iterations, eigenvalues desc, failure %) from LAPACK dlasq2."""
    fn = _load_dlasq2()
    if fn is None:
        return None
    n = len(d)
    z = np.zeros(4 * n, np.float64)
    z[0 : 2 * n - 1 : 2] = np.asarray(d, np.float64) ** 2
    z[1 : 2 * n - 2 : 2] = np.asarray(e, np.float64) ** 2
    info = ctypes.c_int(0)
    nn = ctypes.c_int(n)
    fn(ctypes.byref(nn), z, ctypes.byref(info))
    if info.value != 0:
        return None
    return int(z[2 * n + 2]), z[:n], float(z[2 * n + 4])


def spectra():
    g = np.random.default_rng(0)
    yield "stall_random_n120_seed0", g.standard_normal(120), g.standard_normal(119)
    g = np.random.default_rng(1)
    yield "random_n200_seed1", g.standard_normal(200), g.standard_normal(199)
    g = np.random.default_rng(2)
    n = 150
    d = g.standard_normal(n) * np.logspace(0, -12, n)
    e = g.standard_normal(n - 1) * np.logspace(0, -12, n - 1)
    yield "graded_1e12_n150", d, e
    g = np.random.default_rng(3)
    yield "uniform_n160", g.uniform(0.5, 1.5, 160), g.uniform(0.5, 1.5, 159)
    # clustered: many near-equal sigma
    g = np.random.default_rng(4)
    n = 128
    d = 1.0 + 1e-8 * g.standard_normal(n)
    e = 1e-4 * g.standard_normal(n - 1)
    yield "clustered_n128", d, e
    # Wilkinson-ish / hard deflation pattern
    g = np.random.default_rng(5)
    n = 140
    d = np.abs(g.standard_normal(n)) + 0.01
    e = 10.0 * np.abs(g.standard_normal(n - 1))
    yield "large_offdiag_n140", d, e


def main():
    total = 0
    total_lapack = 0
    for name, d, e in spectra():
        dj, ej = jnp.asarray(d, jnp.float64), jnp.asarray(e, jnp.float64)
        sig, info, th = dqds_svdvals(dj, ej, with_info="debug")
        sig = np.asarray(sig)
        B = np.diag(d) + np.diag(e, 1)
        want = np.linalg.svd(B, compute_uv=False)
        rel = np.max(np.abs(sig - want) / np.maximum(want, 1e-300))
        n = len(d)
        total += int(info)
        lap = lapack_dlasq2(d, e)
        lap_str = "lapack=n/a"
        if lap is not None:
            total_lapack += lap[0]
            lap_str = f"lapack={lap[0]:5d} ({lap[2]:4.1f}% fail)"
        th = np.asarray(th)
        retries = int(th[18])
        print(
            f"{name:28s} n={n:4d} sweeps={int(info):5d} "
            f"({int(info) / n:5.2f}/ev) {lap_str} rel={rel:.2e} "
            f"retries={retries}"
        )
    print(f"TOTAL sweeps: {total}  (LAPACK dlasq2: {total_lapack})")


if __name__ == "__main__":
    main()
