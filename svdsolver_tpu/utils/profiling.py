"""Tracing/profiling utilities.

The reference has no profiling subsystem beyond chrono timers (SURVEY §5;
its ``-lprofiler`` flag is commented out at CMakeLists.txt:15).  Here:

* :func:`trace` — context manager around ``jax.profiler`` writing a
  TensorBoard-loadable device trace;
* :func:`stage_timings` — per-stage wall-clock breakdown of the full SVD
  pipeline (with forced device sync — see utils/timing.sync).
"""

import contextlib
import time

import jax

from svdsolver_tpu.utils.timing import sync


@contextlib.contextmanager
def trace(logdir="/tmp/svdsolver_trace"):
    """Capture a device profiler trace: ``with trace('/tmp/t'): run()``."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def stage_timings(A, band=None, method="tpu2", diag="bisect", warmup=True,
                  reps=5):
    """Per-stage seconds for the two-stage pipeline on ``A``; returns a dict.

    Stages: dense->band, band->bidiagonal, diagonalization.  The first call
    per shape compiles; ``warmup=True`` excludes compilation.

    Each stage is timed as a ``reps``-call back-to-back loop with ONE final
    sync, reporting seconds per call.  A single-shot sync carries the
    tunnel's 25-50 ms round-trip on this platform (PERF_NOTES measurement
    note), which used to inflate every per-stage number here by a constant;
    the loop amortizes it to RTT/reps.
    """
    import jax.numpy as jnp

    from svdsolver_tpu.models.svd import _auto_block, use_pallas
    from svdsolver_tpu.models.two_stage import dense_to_band, band_to_bidiagonal
    from svdsolver_tpu.models.diagonalize import bisect_svdvals, bidiagonal_svdvals

    n = A.shape[0]
    band = band or _auto_block(n)
    pad = (-n) % band
    if pad:
        A = jnp.pad(A, ((0, pad), (0, pad)))

    stage1 = dense_to_band
    stage2 = band_to_bidiagonal
    if method == "tpu2" and use_pallas(A.dtype):
        from svdsolver_tpu.ops.pallas.band_chase import band_to_bidiagonal_pallas
        from svdsolver_tpu.ops.pallas.band_chase_stream import (
            band_to_bidiagonal_pallas_stream,
            stream_chase_preferred,
        )
        from svdsolver_tpu.ops.pallas.panel_qr import dense_to_band_pallas

        from svdsolver_tpu.ops.pallas.band_chase_wave import (
            band_to_bidiagonal_pallas_wave,
            wave_chase_preferred,
        )

        stage1 = dense_to_band_pallas
        # mirror svd.py's routing so the breakdown reflects the real pipeline
        if wave_chase_preferred(A.shape[0], band):
            stage2 = band_to_bidiagonal_pallas_wave
        elif stream_chase_preferred(A.shape[0], band):
            stage2 = band_to_bidiagonal_pallas_stream
        else:
            stage2 = band_to_bidiagonal_pallas
    solver = bidiagonal_svdvals if diag == "qr" else bisect_svdvals
    if diag == "bisect" and method == "tpu2" and use_pallas(A.dtype):
        from svdsolver_tpu.ops.pallas.bisect import bisect_svdvals_pallas

        solver = bisect_svdvals_pallas

    out = {}
    if warmup:
        sync(solver(*sync(stage2(sync(stage1(A, band=band)), band=band))))
    reps = max(1, int(reps))

    def loop_time(fn):
        t0 = time.perf_counter()
        r = None
        for _ in range(reps):
            r = fn()
        sync(r if not isinstance(r, tuple) else r[0])
        return (time.perf_counter() - t0) / reps

    Ab = sync(stage1(A, band=band))
    out["stage1_dense_to_band_s"] = loop_time(
        lambda: stage1(A, band=band)
    )
    d, e = sync(stage2(Ab, band=band))
    out["stage2_band_to_bidiagonal_s"] = loop_time(
        lambda: stage2(Ab, band=band)
    )
    out["diagonalization_s"] = loop_time(lambda: solver(d, e))
    out["total_s"] = sum(out.values())
    out["band"] = band
    return out
