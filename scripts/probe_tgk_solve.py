"""Isolate tgk_solve_pallas cost at n=3840 (the dominant tgk_vectors
component candidate) + time tgk_vectors and its pieces."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from svdsolver_tpu.models.vectors import tgk_vectors
from svdsolver_tpu.ops.pallas.tridiag_solve import tgk_solve_pallas
from svdsolver_tpu.utils.timing import sync

n = int(sys.argv[1]) if len(sys.argv) > 1 else 3840
reps = 5


def loop_time(fn, *args):
    r = fn(*args)
    sync(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(*args)
    sync(r)
    return (time.perf_counter() - t0) / reps


def main():
    rng = np.random.default_rng(0)
    A = rng.normal(size=(n, n)).astype(np.float32)
    sig = np.linalg.svd(A, compute_uv=False).astype(np.float32)
    d = jnp.asarray(rng.normal(size=n).astype(np.float32))
    e = jnp.asarray(rng.normal(size=n - 1).astype(np.float32))
    sigj = jnp.asarray(sig)

    N = 2 * n
    z = jnp.zeros((N - 1,), jnp.float32).at[0::2].set(d).at[1::2].set(e)
    rhs = jnp.asarray(rng.normal(size=(N, n)).astype(np.float32))
    pivmin = jnp.float32(1e-20)
    big = jnp.float32(1e16)

    f = jax.jit(lambda z, s, r: tgk_solve_pallas(z, s, r, pivmin, big))
    t = loop_time(f, z, sigj, rhs)
    print(f"tgk_solve_pallas n={n}: {t * 1e3:7.2f} ms", flush=True)

    t = loop_time(lambda d, e, s: tgk_vectors(d, e, s)[0], d, e, sigj)
    print(f"tgk_vectors      n={n}: {t * 1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
