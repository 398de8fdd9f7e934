"""Probe: existing Stage-II chase kernels across band widths at fixed n.

Motivation (round 3, VERDICT item 1): the SBR plan shrinks the band with
GEMM-class block reflectors before the scalar chase. Its payoff depends on
how the scalar chase's cost scales with band width — this measures it.
Timing: 5-call back-to-back loop + one sync (PERF_NOTES protocol).
"""

import time
import numpy as np
import jax
import jax.numpy as jnp

from svdsolver_tpu.utils.timing import sync

N = 3840
REPS = 5


def band_matrix(n, b, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(n, n)).astype(np.float32)
    i, j = np.indices((n, n), sparse=True)
    A *= ((j - i >= 0) & (j - i <= b)).astype(np.float32)
    return jnp.asarray(A)


def loop_time(fn, A, reps=REPS):
    sync(fn(A))  # compile + warm
    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = fn(A)
    sync(out)
    return (time.perf_counter() - t0) / reps


def main():
    from svdsolver_tpu.ops.pallas.band_chase_wave import (
        band_to_bidiagonal_pallas_wave, wave_chase_supported)
    from svdsolver_tpu.ops.pallas.band_chase_vmem import (
        band_to_bidiagonal_pallas_vmem, vmem_chase_supported)
    from svdsolver_tpu.ops.pallas.band_chase_stream import (
        band_to_bidiagonal_pallas_stream, stream_chase_supported)

    print("devices:", jax.devices())
    for b in (8, 16, 32, 64, 128):
        A = band_matrix(N, b)
        ref = None
        for name, fn, gate in (
            ("wave", band_to_bidiagonal_pallas_wave, wave_chase_supported),
            ("vmem", band_to_bidiagonal_pallas_vmem, vmem_chase_supported),
            ("stream", band_to_bidiagonal_pallas_stream, stream_chase_supported),
        ):
            if not gate(N, b):
                print(f"n={N} b={b:4d} {name:7s} gated out")
                continue
            t = loop_time(lambda X, f=fn: f(X, band=b), A)
            d, e = (np.asarray(x) for x in fn(A, band=b))
            if ref is None:
                ref = np.linalg.svd(
                    np.diag(d.astype(np.float64)) + np.diag(e.astype(np.float64), 1),
                    compute_uv=False)
                tag = "(spectrum ref)"
            else:
                s = np.linalg.svd(
                    np.diag(d.astype(np.float64)) + np.diag(e.astype(np.float64), 1),
                    compute_uv=False)
                tag = f"specdiff={np.max(np.abs(s - ref)) / ref[0]:.2e}"
            print(f"n={N} b={b:4d} {name:7s} {t*1e3:8.2f} ms  {tag}")


if __name__ == "__main__":
    main()
