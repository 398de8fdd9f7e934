"""Stage-I fused two-sided trailing update probe (round-5).

The reference overlaps panel k+1's factorization with panel k's trailing
GEMMs (svd_parallel.h:458-460).  On TPU, XLA ops execute sequentially on
the one core, so "overlap" translates to cutting HBM passes and fusing the
two rank-b corrections of a panel pair into one GEMM:

current (6 big-array passes / pair):
    W  = V^T S          (read S)
    S -= V (T^T W)      (read+write S)
    Y  = S V2^T         (read S)
    S -= (Y T2^T) V2    (read+write S)

fused (4 passes / pair, final GEMM K=2b):
    W  = V^T S                       (read S)
    C1 = T^T W
    Sl = S[c:c+b,:] - Vr C1          (small: LQ panel input rows)
    factor LQ panel on Sl            -> V2, T2
    Y  = S V2^T                      (read S; pre-left-update, corrected:)
    AV = Y - V (C1 V2^T)
    Z  = AV T2^T
    S -= [V | Z] @ [[C1],[V2]]       (read+write S, one K=2b GEMM)

Modes: current | fused, both at band 32 and 128, sigma checked vs LAPACK.
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
from svdsolver_tpu.ops.precision import pdot
from svdsolver_tpu.utils.timing import sync

N = 3200


@functools.partial(jax.jit, static_argnames=("band", "segments", "mode"))
def stage1(A, band=32, segments=4, mode="current"):
    n = A.shape[0]
    b = int(band)

    def step_current(k, S):
        m = S.shape[0]
        c = k * b
        Pt = lax.dynamic_slice(S, (0, c), (m, b)).T
        Rt, Vt, Tt = _panel_qr_pallas(Pt, c, b)
        W = pdot(Vt, S)
        S = S - pdot(Vt.T, pdot(Tt, W))
        S = lax.dynamic_update_slice(S, Rt.T, (0, c))
        Sl = lax.dynamic_slice(S, (c, 0), (b, m))
        Rt2, Vt2, Tt2 = _panel_qr_pallas(Sl, c + b, b)
        AV = pdot(S, Vt2.T)
        S = S - pdot(pdot(AV, Tt2.T), Vt2)
        S = lax.dynamic_update_slice(S, Rt2, (c, 0))
        return S

    def step_fused(k, S):
        m = S.shape[0]
        c = k * b
        Pt = lax.dynamic_slice(S, (0, c), (m, b)).T
        Rt, Vt, Tt = _panel_qr_pallas(Pt, c, b)
        W = pdot(Vt, S)                      # big read 1
        C1 = pdot(Tt, W)                     # (b, m)
        # LQ panel input rows [c, c+b) of the left-updated S; panel block
        # columns [c, c+b) must carry the exact R (they are what the LQ
        # kernel finalizes into Rt2's left block).
        Vr = lax.dynamic_slice(Vt, (0, c), (b, b)).T   # V rows c..c+b
        Sl = lax.dynamic_slice(S, (c, 0), (b, m)) - pdot(Vr, C1)
        Rblk = lax.dynamic_slice(Rt, (0, c), (b, b)).T  # R rows c..c+b of panel
        Sl = lax.dynamic_update_slice(Sl, Rblk, (0, c))
        Rt2, Vt2, Tt2 = _panel_qr_pallas(Sl, c + b, b)
        Y = pdot(S, Vt2.T)                   # big read 2 (pre-update S)
        D = pdot(C1, Vt2.T)                  # (b, b)
        AV = Y - pdot(Vt.T, D)               # (m, b)
        Z = pdot(AV, Tt2.T)                  # (m, b)
        U2 = jnp.concatenate([Vt.T, Z], axis=1)      # (m, 2b)
        C2 = jnp.concatenate([C1, Vt2], axis=0)      # (2b, m)
        S = S - pdot(U2, C2)                 # big read 3 + write, K=2b
        S = lax.dynamic_update_slice(S, Rt.T, (0, c))
        S = lax.dynamic_update_slice(S, Rt2, (c, 0))
        return S

    step = step_current if mode == "current" else step_fused
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
    modes = sys.argv[1:] or ["current", "fused"]
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.uniform(0, 5, (N, N)).astype(np.float32))
    ref = np.linalg.svd(np.asarray(A, np.float64), compute_uv=False)
    for band, segs in ((32, 4), (32, 8), (32, 12), (64, 4), (128, 4)):
        for mode in modes:
            f = lambda: stage1(A, band=band, segments=segs, mode=mode)
            sync(f())
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                out = None
                for _ in range(5):
                    out = f()
                sync(out)
                best = min(best, (time.perf_counter() - t0) / 5)
            s = np.linalg.svd(np.asarray(out, np.float64), compute_uv=False)
            err = np.max(np.abs(s - ref)) / ref[0]
            print(
                f"band={band:4d} seg={segs:2d} mode={mode:8s}: "
                f"{best*1e3:8.2f} ms  max|dsigma|/s0 = {err:.2e}",
                flush=True,
            )


if __name__ == "__main__":
    main()
