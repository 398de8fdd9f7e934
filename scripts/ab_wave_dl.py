"""A/B: deferred-left wave chase vs production wave chase.

Checks d/e BITWISE equality at several sizes, then 5-rep loop-times both
at n=3840 / b=128 (the judge's Stage-II bar: dl <= 42 ms).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from svdsolver_tpu.ops.pallas.band_chase_wave import (
    band_to_bidiagonal_pallas_wave,
    band_to_bidiagonal_pallas_wave_dl,
)
from svdsolver_tpu.utils.timing import sync


def band_matrix(rng, n, b):
    A = np.zeros((n, n), np.float32)
    for k in range(b + 1):
        idx = np.arange(n - k)
        A[idx, idx + k] = rng.normal(size=n - k).astype(np.float32)
    return jnp.asarray(A)


def main():
    rng = np.random.default_rng(0)
    for n, b in ((256, 32), (512, 128), (1030, 128), (3840, 128)):
        A = band_matrix(rng, n, b)
        d0, e0 = band_to_bidiagonal_pallas_wave(A, band=b)
        sync(d0)
        d1, e1 = band_to_bidiagonal_pallas_wave_dl(A, band=b)
        sync(d1)
        bd = int(np.sum(np.asarray(d0) != np.asarray(d1)))
        be = int(np.sum(np.asarray(e0) != np.asarray(e1)))
        s_ref = np.linalg.svd(np.asarray(A, np.float64), compute_uv=False)
        B = (
            np.diag(np.asarray(d1, np.float64))
            + np.diag(np.asarray(e1, np.float64), 1)
        )
        s = np.linalg.svd(B, compute_uv=False)
        rel = np.max(np.abs(np.sort(s) - np.sort(s_ref))) / s_ref[0]
        print(
            f"n={n:5d} b={b:3d}: d mismatches {bd}, e mismatches {be}, "
            f"spectrum rel err vs LAPACK {rel:.2e}",
            flush=True,
        )

    n, b = 3840, 128
    A = band_matrix(rng, n, b)
    for name, fn in (
        ("wave   ", band_to_bidiagonal_pallas_wave),
        ("wave_dl", band_to_bidiagonal_pallas_wave_dl),
        ("wave   ", band_to_bidiagonal_pallas_wave),
        ("wave_dl", band_to_bidiagonal_pallas_wave_dl),
    ):
        out = fn(A, band=b)
        sync(out[0])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            o = None
            for _ in range(5):
                o = fn(A, band=b)
            sync(o[0])
            best = min(best, (time.perf_counter() - t0) / 5)
        print(f"{name} n={n} b={b}: {best * 1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
