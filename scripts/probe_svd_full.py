"""Loop-timed per-stage breakdown of the FULL svd() pipeline at a given n
(default 3840, band=128): stage1 records, recording chase, bisection,
TGK inverse iteration + polish, the batched chase back-transform walk, and
the batched Stage-I record walk.  Each stage is jitted and timed on its own
(inputs pre-synced), so the numbers are device-true and sum to roughly the
jitted svd() wall minus XLA's cross-stage overlap.

Usage: PYTHONPATH=.:$AXON python scripts/probe_svd_full.py [n] [band] [reps]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from svdsolver_tpu.models.vectors import (
    _apply_chase_reflectors_wy_pair,
    _apply_stage1_reflectors_pair,
    bidiagonal_svd,
    svd,
    tgk_vectors,
)
from svdsolver_tpu.utils.timing import sync

n = int(sys.argv[1]) if len(sys.argv) > 1 else 3840
b = int(sys.argv[2]) if len(sys.argv) > 2 else 128
reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3


def loop_time(fn, *args):
    r = fn(*args)
    sync(r if not isinstance(r, tuple) else r[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(*args)
    sync(r if not isinstance(r, tuple) else r[0])
    return (time.perf_counter() - t0) / reps


def main():
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.uniform(0, 5, (n, n)).astype(np.float32))

    from svdsolver_tpu.ops.pallas.panel_qr import dense_to_band_rec_pallas
    from svdsolver_tpu.ops.pallas.band_chase_wave import (
        band_to_bidiagonal_pallas_wave_accum,
        wave_chase_accum_preferred,
    )
    from svdsolver_tpu.ops.pallas.band_chase import (
        band_to_bidiagonal_pallas_accum,
    )
    from svdsolver_tpu.ops.pallas.bisect import bisect_svdvals_pallas

    t = {}
    out1 = sync(dense_to_band_rec_pallas(A, band=b))
    Ab, Vq, Tq, Vl, Tl = out1
    t["stage1_rec"] = loop_time(dense_to_band_rec_pallas, A, b)

    if wave_chase_accum_preferred(n, b):
        chase = band_to_bidiagonal_pallas_wave_accum
        print("chase: wave_accum")
    else:
        chase = band_to_bidiagonal_pallas_accum
        print("chase: hbm_accum")
    d, e, VL, TL, VR, TR = sync(chase(Ab, band=b))
    t["chase_rec"] = loop_time(chase, Ab, b)
    s_used = max(0, -(-(n - (2 * (b + 1) - 1)) // b)) + 2
    if s_used < VL.shape[1]:
        VL, TL = VL[:, :s_used], TL[:, :s_used]
        VR, TR = VR[:, :s_used], TR[:, :s_used]

    sig = sync(bisect_svdvals_pallas(d, e))
    t["bisect"] = loop_time(bisect_svdvals_pallas, d, e)

    Ub, Vb = sync(tgk_vectors(d, e, sig))
    t["tgk_vectors"] = loop_time(tgk_vectors, d, e, sig)

    wy_pair = jax.jit(
        _apply_chase_reflectors_wy_pair, static_argnames=("band",)
    )
    LU, RV = sync(wy_pair(VL, TL, VR, TR, Ub, Vb, band=b))
    t["chase_backtransform"] = loop_time(
        lambda: wy_pair(VL, TL, VR, TR, Ub, Vb, band=b)
    )

    s1_pair = jax.jit(_apply_stage1_reflectors_pair)
    U, V = sync(s1_pair(Vq, Tq, Vl, Tl, LU, RV))
    t["stage1_backtransform"] = loop_time(
        lambda: s1_pair(Vq, Tq, Vl, Tl, LU, RV)
    )

    total = sum(t.values())
    for k, v in t.items():
        print(f"{k:22s} {v * 1e3:8.2f} ms  ({v / total * 100:4.1f}%)")
    print(f"{'sum':22s} {total * 1e3:8.2f} ms")

    svd_j = jax.jit(lambda A: svd(A, band=b))
    sync(svd_j(A))
    t_svd = loop_time(svd_j, A)
    print(f"{'jitted svd() wall':22s} {t_svd * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
