"""Headline benchmark: one JSON line to stdout, diagnostics to stderr.

Primary metric (round-comparable): two-stage Stage-I dense->band reduction,
N=3200 band=32 fp32 — the reference's canonical CUDA sweep config.  Baseline:
the reference's published V100 CUDA-1 band-reduction wall-clock at N=3200,
band=32 — 22.0778 s (reference README.md:203; see BASELINE.md).
``vs_baseline`` is the speedup factor (baseline_seconds / our_seconds).

The same JSON line also carries the BASELINE.json north-star: full singular
values at 3840x3840 fp32 (flagship tpu2 path) — wall-clock and max relative
error vs LAPACK (gate: within 1e-6 * ||A||_2).
"""

import json
import sys
import time

import numpy as np

N = 3200
BAND = 32
BASELINE_S = 22.0778  # V100 CUDA-1, README.md:203
NS_N = 3840  # north-star size (BASELINE.json)


def main():
    import os

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    from svdsolver_tpu.models.svd import svdvals, use_pallas
    from svdsolver_tpu.models.two_stage import dense_to_band

    print(f"devices: {jax.devices()}", file=sys.stderr)
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.uniform(0.0, 5.0, size=(N, N)).astype(np.float32))

    if use_pallas(A.dtype):
        from svdsolver_tpu.ops.pallas.panel_qr import dense_to_band_pallas

        stage1 = dense_to_band_pallas
    else:
        stage1 = dense_to_band

    def run(x):
        # Force a device->host read: block_until_ready does not reliably
        # block on the tunneled TPU platform.
        return float(np.asarray(stage1(x, band=BAND)[0, 0]))

    t0 = time.perf_counter()
    run(A)
    print(f"stage1 compile+first run: {time.perf_counter() - t0:.2f}s",
          file=sys.stderr)

    # Loop-timed (5 back-to-back calls, one final sync): a single-shot
    # sync carries the ~25-50 ms tunnel RTT, which is platform overhead,
    # not device time.  MEDIAN of 5 loop measurements (not min-of-3):
    # remote-compile binary variance swings same-code sessions ~1.3x
    # (PERF_NOTES "Session variance"), and the median is the stabler
    # round-over-round statistic (VERDICT r4 #4).
    reps = 5
    loop = 5
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = None
        for _ in range(loop):
            out = stage1(A, band=BAND)
        float(np.asarray(out[0, 0]))
        times.append((time.perf_counter() - t0) / loop)
    t = _median(times)
    flops = 8 / 3 * N**3  # two-sided blocked reduction FLOP count
    gflops = flops / t / 1e9
    print(f"stage1 times: {times}  gflops: {gflops:.1f}", file=sys.stderr)

    # ---- north star: full sigma at 3840^2 fp32 (tpu2), acc vs LAPACK ----
    ns_s = ns_err = None
    try:
        Ans = jnp.asarray(
            rng.uniform(0.0, 5.0, size=(NS_N, NS_N)).astype(np.float32)
        )

        def run_ns(x):
            return np.asarray(svdvals(x, method="tpu2"))

        t0 = time.perf_counter()
        run_ns(Ans)  # compile
        print(f"northstar compile+first run: {time.perf_counter() - t0:.2f}s",
              file=sys.stderr)
        ns_times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            sig = run_ns(Ans)
            ns_times.append(time.perf_counter() - t0)
        ns_s = _median(ns_times)
        ref = np.linalg.svd(np.asarray(Ans, np.float64), compute_uv=False)
        ns_err = float(np.max(np.abs(sig - ref)) / ref[0])
        print(
            f"north star: svdvals {NS_N}^2 fp32 times {ns_times} "
            f"rel_err {ns_err:.2e}",
            file=sys.stderr,
        )
    except Exception as exc:  # diagnostics only — never break the bench line
        print(f"north-star bench failed: {exc}", file=sys.stderr)

    # ---- scale point: full sigma at 7680^2 fp32 (grouped streamed chase) --
    sc_s = None
    try:
        SCN = 7680
        Asc = jnp.asarray(rng.normal(size=(SCN, SCN)).astype(np.float32))

        def run_sc(x):
            return np.asarray(svdvals(x, method="tpu2")[0])

        t0 = time.perf_counter()
        run_sc(Asc)  # compile
        print(f"scale compile+first run: {time.perf_counter() - t0:.2f}s",
              file=sys.stderr)
        sc_times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            run_sc(Asc)
            sc_times.append(time.perf_counter() - t0)
        sc_s = _median(sc_times)
        print(f"scale: svdvals {SCN}^2 fp32 times {sc_times}", file=sys.stderr)
        del Asc
    except Exception as exc:
        print(f"scale bench failed: {exc}", file=sys.stderr)

    # full-pipeline breakdown (flagship tpu2 path, auto band): the three
    # stage timings go INTO the JSON line so the drift guard covers the
    # component that actually swings between sessions (VERDICT r4 #4 —
    # BENCH_r04 recorded stage2 67 ms where the judge re-measured 43 ms,
    # invisible to a guard that only sees the headline).
    pipe_metrics = {}
    try:
        from svdsolver_tpu.utils.profiling import stage_timings

        t0 = time.perf_counter()
        st = stage_timings(A, method="tpu2")
        print(
            f"full pipeline (tpu2, band={st['band']}, incl compile "
            f"{time.perf_counter() - t0:.1f}s): {st}",
            file=sys.stderr,
        )
        pipe_metrics = {
            "pipeline_N3200_stage1_s": round(st["stage1_dense_to_band_s"], 4),
            "pipeline_N3200_stage2_s": round(
                st["stage2_band_to_bidiagonal_s"], 4
            ),
            "pipeline_N3200_diag_s": round(st["diagonalization_s"], 4),
        }
    except Exception as exc:
        print(f"stage_timings failed: {exc}", file=sys.stderr)

    # ---- full SVD with singular vectors (beyond the reference) ----------
    svd_metrics = {}
    try:
        from svdsolver_tpu import svd
        from svdsolver_tpu.utils.timing import sync

        fsvd = jax.jit(svd)  # the public svd() is jit-compatible

        for SN, sv_loop in ((2048, 3), (3840, 2)):
            Asv = jnp.asarray(rng.normal(size=(SN, SN)).astype(np.float32))

            def run_svd(x, k):
                out = None
                for _ in range(k):
                    out = fsvd(x)
                # one output of the single jitted program syncs the whole
                # call (eager composition would need one RTT per output)
                sync(out[1])
                return out

            t0 = time.perf_counter()
            run_svd(Asv, 1)  # compile
            print(
                f"svd {SN} compile+first run: "
                f"{time.perf_counter() - t0:.2f}s",
                file=sys.stderr,
            )
            sv_times = []
            for _ in range(reps):
                t0 = time.perf_counter()
                out = run_svd(Asv, sv_loop)
                sv_times.append((time.perf_counter() - t0) / sv_loop)
            svd_s = _median(sv_times)
            U, s, Vh = (np.asarray(o) for o in out)
            An = np.asarray(Asv)
            svd_err = float(
                np.abs(U @ np.diag(s) @ Vh - An).max() / np.abs(An).max()
            )
            svd_metrics[f"full_svd_N{SN}_fp32_s"] = round(svd_s, 4)
            svd_metrics[f"full_svd_N{SN}_max_recon_rel_err"] = float(
                f"{svd_err:.3e}"
            )
            print(
                f"full svd {SN}^2 fp32 times {sv_times} recon {svd_err:.2e}",
                file=sys.stderr,
            )
            del Asv, out, U, s, Vh, An
    except Exception as exc:
        print(f"full-svd bench failed: {exc}", file=sys.stderr)

    # ---- Jacobi relative accuracy on a graded spectrum (fp32: 6 decades) --
    # Headline: the preconditioned (dgejsv-class) flagship; standalone
    # svd_jacobi kept as the secondary (rank-revealing, no QR in front).
    jac_metrics = {}
    try:
        from svdsolver_tpu import svd_jacobi, svd_jacobi_pre
        from svdsolver_tpu.utils.timing import sync

        JN = 512
        # 6 decades: the fp32 limit (12-decade relative accuracy needs
        # f64 — demonstrated in tests/test_jacobi.py on the emulated-f64 path)
        g = rng.normal(size=(JN, JN)) @ np.diag(np.logspace(0, -6, JN))
        Aj = jnp.asarray(g.astype(np.float32))
        refj = np.linalg.svd(np.asarray(Aj, np.float64), compute_uv=False)
        for name, fn in (("jacobi_pre", svd_jacobi_pre), ("jacobi", svd_jacobi)):
            out = fn(Aj)
            sync(out[1])
            jac_s = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                for _ in range(2):
                    out = fn(Aj)
                sync(out[1])
                jac_s = min(jac_s, (time.perf_counter() - t0) / 2)
            jac_err = float(np.max(np.abs(np.asarray(out[1]) - refj) / refj))
            jac_metrics[f"{name}_graded6dec_N{JN}_s"] = round(jac_s, 4)
            jac_metrics[f"{name}_graded6dec_max_RELATIVE_err"] = float(
                f"{jac_err:.3e}"
            )
            print(
                f"{name} graded {JN}^2: {jac_s:.3f}s max RELATIVE err "
                f"{jac_err:.2e}",
                file=sys.stderr,
            )
    except Exception as exc:
        print(f"jacobi bench failed: {exc}", file=sys.stderr)

    # ---- complex SVD (split re/im — no complex dtype on this backend) ---
    # Loop-timed on device-resident (re, im) pairs: host numpy complex
    # in/out adds two big transfers per call (tunnel-RTT, not device time).
    cx_s = cx_err = None
    try:
        from svdsolver_tpu.models.complex_svd import svd_c
        from svdsolver_tpu.utils.timing import sync

        CN = 512
        Ac = (
            rng.normal(size=(CN, CN)) + 1j * rng.normal(size=(CN, CN))
        ).astype(np.complex64)
        pair = (
            jnp.asarray(Ac.real.astype(np.float32)),
            jnp.asarray(Ac.imag.astype(np.float32)),
        )
        Uc, sc, Vhc = svd_c(pair)  # compile
        sync(sc)
        cx_s = float("inf")
        cx_loop = 3
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(cx_loop):
                Uc, sc, Vhc = svd_c(pair)
            sync(sc)
            cx_s = min(cx_s, (time.perf_counter() - t0) / cx_loop)
        Un = np.asarray(Uc[0]) + 1j * np.asarray(Uc[1])
        Vn = np.asarray(Vhc[0]) + 1j * np.asarray(Vhc[1])
        cx_err = float(
            np.abs(Un @ np.diag(np.asarray(sc)) @ Vn - Ac).max()
            / np.abs(Ac).max()
        )
        print(
            f"complex svd {CN}^2 (device pairs, loop-timed): {cx_s:.3f}s "
            f"recon {cx_err:.2e}",
            file=sys.stderr,
        )
    except Exception as exc:
        print(f"complex bench failed: {exc}", file=sys.stderr)

    line = {
        "metric": f"stage1_dense_to_band_N{N}_band{BAND}_fp32_wallclock",
        "value": round(t, 4),
        "unit": "seconds",
        "vs_baseline": round(BASELINE_S / t, 2),
        # MFU vs the fp32-effective MXU peak (v5e: 197 bf16 TFLOP/s, and
        # Precision.HIGHEST spends 6 bf16 passes per fp32 contraction)
        "stage1_tflops": round(gflops / 1e3, 2),
        "stage1_mfu_fp32eff": round(gflops / 1e3 / (197.0 / 6), 4),
    }
    if ns_s is not None:
        line["northstar_svdvals_N3840_fp32_s"] = round(ns_s, 4)
        line["northstar_max_rel_err_vs_lapack"] = float(f"{ns_err:.3e}")
    if sc_s is not None:
        line["svdvals_N7680_fp32_s"] = round(sc_s, 4)
    line.update(pipe_metrics)
    line.update(svd_metrics)
    line.update(jac_metrics)
    if cx_s is not None:
        line["complex_svd_N512_s"] = round(cx_s, 4)
        line["complex_svd_N512_recon_rel_err"] = float(f"{cx_err:.3e}")
    _drift_check(line)
    print(json.dumps(line))


def _median(xs):
    xs = sorted(xs)
    m = len(xs) // 2
    return xs[m] if len(xs) % 2 else 0.5 * (xs[m - 1] + xs[m])


def _drift_check(line, factor=1.5):
    """Warn on stderr for any time metric regressing > ``factor`` vs the
    most recent BENCH_r*.json (round-over-round drift guard — VERDICT r3 #8).
    Timing keys are those ending in ``_s`` plus the headline ``value``."""
    import glob
    import os
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    prev = sorted(
        glob.glob(os.path.join(here, "BENCH_r*.json")),
        key=lambda p: int(re.search(r"_r(\d+)", p).group(1)),
    )
    if not prev:
        return
    try:
        with open(prev[-1]) as f:
            old = json.load(f).get("parsed", {})
    except Exception as exc:
        print(f"drift check: cannot read {prev[-1]}: {exc}", file=sys.stderr)
        return
    warned = False
    for key, new_val in line.items():
        is_time = key.endswith("_s") or key == "value"
        if not is_time or key not in old:
            continue
        old_val = old[key]
        if isinstance(old_val, (int, float)) and old_val > 0:
            if new_val > factor * old_val:
                print(
                    f"WARN drift: {key} = {new_val} vs {old_val} in "
                    f"{os.path.basename(prev[-1])} "
                    f"({new_val / old_val:.2f}x regression)",
                    file=sys.stderr,
                )
                warned = True
    if not warned:
        print(
            f"drift check vs {os.path.basename(prev[-1])}: clean",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
