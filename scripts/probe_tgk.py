"""Loop-timed breakdown of tgk_vectors at scale: the Pallas tridiagonal
solve, the cluster re-coupling (CholeskyQR passes), and the polar polish —
the three candidate hogs of the 154 ms tgk_vectors wall at n=3840 fp32.

Usage: python scripts/probe_tgk.py [n] [reps]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from svdsolver_tpu.models.two_stage import bidiagonalize_two_stage
from svdsolver_tpu.models.vectors import (
    _cluster_orthogonalize,
    tgk_vectors,
)
from svdsolver_tpu.ops.pallas.bisect import bisect_svdvals_pallas
from svdsolver_tpu.ops.pallas.tridiag_solve import tgk_solve_pallas
from svdsolver_tpu.ops.precision import pdot
from svdsolver_tpu.utils.timing import sync

n = int(sys.argv[1]) if len(sys.argv) > 1 else 3840
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3


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
    d, e = bidiagonalize_two_stage(A, band=128)
    sig = sync(bisect_svdvals_pallas(d, e))
    N = 2 * n
    dtype = jnp.float32
    eps = float(jnp.finfo(dtype).eps)
    smax = float(jnp.max(jnp.abs(sig)))
    linked = np.abs(np.asarray(sig[1:]) - np.asarray(sig[:-1])) <= 64 * eps * smax
    print(f"n={n}: clustered lanes ~ {int(linked.sum())} of {n - 1} gaps")

    z = jnp.zeros((N - 1,), dtype).at[0::2].set(d).at[1::2].set(e)
    pivmin = jnp.asarray(smax * eps * eps, dtype)
    big = jnp.asarray(float(jnp.finfo(dtype).max) ** 0.5 / 16.0, dtype)
    x = jax.random.normal(jax.random.PRNGKey(0), (N, n), dtype)

    t = {}
    solve = jax.jit(lambda x: tgk_solve_pallas(z, sig, x, pivmin, big))
    sync(solve(x))
    t["tridiag_solve (x1)"] = loop_time(solve, x)

    co = jax.jit(lambda v: _cluster_orthogonalize(v, sig, 64 * eps))
    v = x[0::2]
    sync(co(v))
    t["cluster_orth (x1)"] = loop_time(co, v)

    eye = jnp.eye(n, dtype=dtype)

    @jax.jit
    def polish2(uv):
        def p(j, M):
            G = pdot(jnp.swapaxes(M, -1, -2), M)
            return pdot(M, 1.5 * eye - 0.5 * G)

        return jax.lax.fori_loop(0, 2, p, uv)

    uv = jnp.stack([x[1::2], v])
    sync(polish2(uv))
    t["polish (2 passes)"] = loop_time(polish2, uv)

    tv = jax.jit(tgk_vectors)
    sync(tv(d, e, sig))
    t["tgk_vectors total"] = loop_time(tv, d, e, sig)

    for k, vdt in t.items():
        print(f"{k:22s} {vdt * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
