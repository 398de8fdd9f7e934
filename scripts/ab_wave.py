"""A/B: wavefront-batched chase vs sequential VMEM chase (same session).

Usage: python scripts/ab_wave.py [sizes...]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from svdsolver_tpu.models.two_stage import dense_to_band
from svdsolver_tpu.ops.pallas.band_chase_vmem import (
    band_to_bidiagonal_pallas_vmem,
    vmem_chase_supported,
)
from svdsolver_tpu.ops.pallas.band_chase_wave import (
    band_to_bidiagonal_pallas_wave,
    wave_chase_supported,
    _n_lanes,
)


def loop_time(fn, x, reps=5):
    out = fn(x)
    jax.block_until_ready(out)
    float(np.asarray(out[0][0]))  # force sync via device read
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(x)
    float(np.asarray(out[0][0]))
    float(np.asarray(out[1][0])) if out[1].size else None
    return (time.perf_counter() - t0) / reps


def main():
    sizes = [int(s) for s in sys.argv[1:]] or [512, 1024, 3840]
    rng = np.random.default_rng(0)
    for n in sizes:
        for b in ([64, 128] if n <= 1024 else [128]):
            if not wave_chase_supported(n, b):
                print(f"n={n} b={b}: wave unsupported")
                continue
            A = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))
            B = dense_to_band(A, band=b)
            B = jax.block_until_ready(B)
            dv, ev = band_to_bidiagonal_pallas_vmem(B, band=b)
            t0 = time.perf_counter()
            dw, ew = band_to_bidiagonal_pallas_wave(B, band=b)
            ct = time.perf_counter() - t0
            dv, ev, dw, ew = (np.asarray(x) for x in (dv, ev, dw, ew))
            bit = np.array_equal(dv, dw) and np.array_equal(ev, ew)
            serr = None
            if n <= 1024:  # spectrum check (dense f64 svd is slow at scale)
                import scipy.linalg as sla

                sw = np.sort(sla.svdvals(np.diag(dw.astype(np.float64)) +
                                         np.diag(ew.astype(np.float64), 1)))
                sv = np.sort(sla.svdvals(np.diag(dv.astype(np.float64)) +
                                         np.diag(ev.astype(np.float64), 1)))
                serr = np.max(np.abs(sw - sv)) / max(sv[-1], 1e-30)
            print(
                f"n={n} b={b} lanes={_n_lanes(n, b)} compile={ct:.1f}s "
                f"bitwise={bit} spec_err={serr}", flush=True
            )
            if n >= 2048 and vmem_chase_supported(n, b):
                tv = loop_time(
                    lambda x: band_to_bidiagonal_pallas_vmem(x, band=b), B
                )
                tw = loop_time(
                    lambda x: band_to_bidiagonal_pallas_wave(x, band=b), B
                )
                print(f"  vmem {tv*1e3:.1f} ms   wave {tw*1e3:.1f} ms")


if __name__ == "__main__":
    main()
