"""A/B the stream chase's phase-A group width LG at past-VMEM sizes.

Usage: python scripts/ab_stream_lg.py [n ...]   (default 7680 15360)

Monkeypatches band_chase_stream.LG and re-jits the underlying (unjitted)
builder per LG — the module-level jit caches on (shape, band) only, so a
fresh jit per variant is required.  Times back-to-back loops in ONE process
(see PERF_NOTES measurement warning).
"""

import functools
import os
import sys
import time

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np
import jax.numpy as jnp

from svdsolver_tpu.ops.pallas import band_chase_stream as bs
from svdsolver_tpu.ops.pallas.panel_qr import dense_to_band_pallas
from svdsolver_tpu.utils.timing import sync

B = 128
REPS = 3
LOOP = 3


def time_chase(Ab, lg):
    old = bs.LG
    bs.LG = lg
    try:
        raw = bs._band_to_bidiagonal_pallas_stream.__wrapped__
        fn = jax.jit(functools.partial(raw, band=B))

        def run():
            d = e = None
            for _ in range(LOOP):
                d, e = fn(Ab)
            sync(d)
            return d, e

        d, e = run()  # compile
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            run()
            ts.append((time.perf_counter() - t0) / LOOP)
        return min(ts), np.asarray(d), np.asarray(e)
    finally:
        bs.LG = old


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [7680, 15360]
    rng = np.random.default_rng(0)
    for n in sizes:
        A = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))
        Ab = dense_to_band_pallas(A, band=B)
        sync(Ab)
        del A
        base = None
        for lg in (4, 6, 2, 8):
            try:
                t, d, e = time_chase(Ab, lg)
            except Exception as exc:
                print(f"n={n} LG={lg}: FAILED {type(exc).__name__}: {exc}")
                continue
            if base is None:
                base = (d, e)
                tag = ""
            else:
                bit = np.array_equal(base[0], d) and np.array_equal(base[1], e)
                tag = "  d/e bitwise==LG4" if bit else "  d/e DIFFER vs LG4!"
            print(f"n={n} LG={lg}: {t*1e3:.1f} ms{tag}", flush=True)
        del Ab


if __name__ == "__main__":
    main()
