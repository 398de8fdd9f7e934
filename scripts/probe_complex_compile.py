"""Root-cause the complex-SVD cold compile (VERDICT r3 item 4 / r4 #7).

Runs with the persistent compilation cache DISABLED (no
jax_compilation_cache_dir set, and the in-process cache is per-function
first-call anyway), timing compile+first-run of each component of
svd_c(512) separately:

  gk        _bidiagonalize_gk_c(512, uv=True)   (the reduction loop)
  bisect    bisect_svdvals_pallas on the 512-bidiagonal
  tgk       tgk_vectors (inverse iteration + cluster CholQR + polish)
  bsvd      bidiagonal_svd (bisect + tgk together)
  core      _svd_c_core (the whole jitted pipeline)

Usage: python scripts/probe_complex_compile.py [n]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

n = int(sys.argv[1]) if len(sys.argv) > 1 else 512


def timed(label, fn):
    t0 = time.perf_counter()
    out = fn()
    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "ravel") and getattr(leaf, "size", 0) > 0:
            np.asarray(leaf.ravel()[0])
    dt = time.perf_counter() - t0
    print(f"{label:8s} compile+first: {dt:7.2f} s", flush=True)
    return out


def main():
    from svdsolver_tpu.models.complex_svd import (
        _bidiagonalize_gk_c,
        _svd_c_core,
    )
    from svdsolver_tpu.models.vectors import bidiagonal_svd, tgk_vectors
    from svdsolver_tpu.ops.pallas.bisect import bisect_svdvals_pallas

    rng = np.random.default_rng(0)
    pr = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))
    pi = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))
    d = jnp.asarray(rng.normal(size=n).astype(np.float32))
    e = jnp.asarray(rng.normal(size=n - 1).astype(np.float32))

    gk = jax.jit(lambda a, b: _bidiagonalize_gk_c(a, b, uv=True))
    timed("gk", lambda: gk(pr, pi))
    sig = timed("bisect", lambda: bisect_svdvals_pallas(d, e))
    timed("tgk", lambda: tgk_vectors(d, e, sig))
    timed("bsvd", lambda: bidiagonal_svd(d, e))
    timed("core", lambda: _svd_c_core(pr, pi))


if __name__ == "__main__":
    main()
