"""Headline benchmark: two-stage Stage-I dense->band reduction, N=3200 fp32.

Baseline: the reference's published V100 CUDA-1 band-reduction wall-clock at
N=3200, band=32 — 22.0778 s (reference README.md:203; see BASELINE.md).
``vs_baseline`` is the speedup factor (baseline_seconds / our_seconds).

Prints exactly one JSON line to stdout; diagnostics go to stderr.
"""

import json
import sys
import time

import numpy as np

N = 3200
BAND = 32
BASELINE_S = 22.0778  # V100 CUDA-1, README.md:203


def main():
    import jax
    import jax.numpy as jnp
    from svdsolver_tpu.models.two_stage import dense_to_band

    print(f"devices: {jax.devices()}", file=sys.stderr)
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.uniform(0.0, 5.0, size=(N, N)).astype(np.float32))

    def run(x):
        # Force a device->host read: block_until_ready does not reliably
        # block on the tunneled TPU platform.
        return float(np.asarray(dense_to_band(x, band=BAND)[0, 0]))

    t0 = time.perf_counter()
    run(A)
    print(f"compile+first run: {time.perf_counter() - t0:.2f}s", file=sys.stderr)

    reps = 3
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        run(A)
        times.append(time.perf_counter() - t0)
    t = min(times)
    flops = 8 / 3 * N**3  # two-sided blocked reduction FLOP count
    gflops = flops / t / 1e9
    print(f"times: {times}  gflops: {gflops:.1f}", file=sys.stderr)

    # full-pipeline breakdown (flagship tpu2 path, auto band) to stderr
    try:
        from svdsolver_tpu.utils.profiling import stage_timings

        st = stage_timings(A, method="tpu2")
        print(f"full pipeline (tpu2, band={st['band']}): {st}", file=sys.stderr)
    except Exception as exc:  # diagnostics only — never break the bench line
        print(f"stage_timings failed: {exc}", file=sys.stderr)

    print(json.dumps({
        "metric": f"stage1_dense_to_band_N{N}_band{BAND}_fp32_wallclock",
        "value": round(t, 4),
        "unit": "seconds",
        "vs_baseline": round(BASELINE_S / t, 2),
    }))


if __name__ == "__main__":
    main()
