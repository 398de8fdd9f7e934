"""Ablation probe for Stage I (dense_to_band_pallas): where do the
~18 ms between the measured floor (panels ~13 + GEMMs ~20 ms) and the
~51 ms whole-stage wall go, and what does trailing-GEMM precision cost?

Modes (same schedule, pieces removed):
  full      — the production path
  nopanel   — panel kernels replaced by zero (V, T) constants: GEMMs +
              slices + updates only (GEMM content-independent)
  nogemm    — trailing updates skipped: panel kernels + slices only
  slices    — panels AND gemms skipped: dynamic slice/update scaffolding
  high      — full, but trailing pdot at Precision.HIGH (bf16x3) instead
              of HIGHEST (bf16x6); prints sigma error vs LAPACK
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from svdsolver_tpu.ops.pallas.panel_qr import _panel_qr_pallas
from svdsolver_tpu.models.two_stage import segment_bounds
from svdsolver_tpu.utils.timing import sync

N = 3200


@functools.partial(
    jax.jit, static_argnames=("band", "segments", "mode", "prec")
)
def stage1(A, band=32, segments=4, mode="full", prec="highest"):
    n = A.shape[0]
    b = int(band)
    P = (
        lax.Precision.HIGHEST if prec == "highest" else lax.Precision.HIGH
    )

    def pdot(a, c):
        return jnp.matmul(a, c, precision=P, preferred_element_type=a.dtype)

    def step(k, S):
        m = S.shape[0]
        c = k * b
        Pt = lax.dynamic_slice(S, (0, c), (m, b)).T
        if mode in ("full", "nogemm", "high"):
            Rt, Vt, Tt = _panel_qr_pallas(Pt, c, b)
        else:
            Rt = Pt
            Vt = jnp.zeros_like(Pt)
            Tt = jnp.zeros((b, b), Pt.dtype)
        if mode in ("full", "nopanel", "high"):
            W = pdot(Vt, S)
            S = S - pdot(Vt.T, pdot(Tt, W))
        if mode != "slices":
            S = lax.dynamic_update_slice(S, Rt.T, (0, c))
        Sl = lax.dynamic_slice(S, (c, 0), (b, m))
        if mode in ("full", "nogemm", "high"):
            Rt2, Vt2, Tt2 = _panel_qr_pallas(Sl, c + b, b)
        else:
            Rt2 = Sl
            Vt2 = jnp.zeros_like(Sl)
            Tt2 = jnp.zeros((b, b), Sl.dtype)
        if mode in ("full", "nopanel", "high"):
            AV = pdot(S, Vt2.T)
            S = S - pdot(pdot(AV, Tt2.T), Vt2)
        if mode != "slices":
            S = lax.dynamic_update_slice(S, Rt2, (c, 0))
        return S

    bounds = segment_bounds(n // b, segments)
    for s in range(len(bounds) - 1):
        k0, k1 = bounds[s], bounds[s + 1]
        if k0 == k1:
            continue
        s0 = k0 * b
        sub = lax.dynamic_slice(A, (s0, s0), (n - s0, n - s0))
        sub = lax.fori_loop(0, k1 - k0, step, sub)
        A = lax.dynamic_update_slice(A, sub, (s0, s0))
    return A


def main():
    modes = sys.argv[1:] or ["full", "nopanel", "nogemm", "slices", "high"]
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.uniform(0, 5, (N, N)).astype(np.float32))
    for band in (32, 128):
        for mode in modes:
            prec = "high" if mode == "high" else "highest"
            m = "full" if mode == "high" else mode
            f = lambda: stage1(A, band=band, mode=m, prec=prec)
            sync(f())
            t0 = time.perf_counter()
            out = None
            for _ in range(5):
                out = f()
            sync(out)
            dt = (time.perf_counter() - t0) / 5
            line = f"band={band:4d} mode={mode:8s}: {dt*1e3:8.2f} ms"
            if mode in ("full", "high"):
                s = np.linalg.svd(np.asarray(out, np.float64), compute_uv=False)
                ref = np.linalg.svd(
                    np.asarray(A, np.float64), compute_uv=False
                )
                line += f"  max|dsigma|/s0 = {np.max(np.abs(s-ref))/ref[0]:.2e}"
            print(line, flush=True)


if __name__ == "__main__":
    main()
