"""Time the recording wave chase + full svd() at n=3840 (5-rep loops).

Round-5 record-store merge A/B: prior sessions measured the recording
wave chase at ~117 ms (PERF_NOTES round-2 third pass) vs the plain wave's
~55 ms; the merged single-row-store-per-pair tick should cut the ~62 ms
record overhead roughly in half.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from svdsolver_tpu import svd
from svdsolver_tpu.ops.pallas.band_chase_wave import (
    band_to_bidiagonal_pallas_wave,
    band_to_bidiagonal_pallas_wave_accum,
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
    n, b = 3840, 128
    A = band_matrix(rng, n, b)
    for name, fn in (
        ("wave      ", band_to_bidiagonal_pallas_wave),
        ("wave_accum", band_to_bidiagonal_pallas_wave_accum),
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

    Ad = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))
    fsvd = jax.jit(svd)
    out = fsvd(Ad)
    sync(out[1])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(2):
            out = fsvd(Ad)
        sync(out[1])
        best = min(best, (time.perf_counter() - t0) / 2)
    U, s, Vh = (np.asarray(o) for o in out)
    An = np.asarray(Ad)
    recon = np.abs(U @ np.diag(s) @ Vh - An).max() / np.abs(An).max()
    orthU = np.abs(U.T @ U - np.eye(n)).max()
    print(
        f"svd({n}) fp32: {best:.4f} s  recon {recon:.2e}  orthU {orthU:.2e}",
        flush=True,
    )


if __name__ == "__main__":
    main()
