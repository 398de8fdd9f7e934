"""Sweep-count probe for the dqds shift battery (run on CPU, f64).

Measures dqds_svdvals sweep counts + max relative error on a battery of
spectra classes; used to A/B shift-selection changes (VERDICT r3 item 6:
stall spectrum <= 500 sweeps).  LAPACK dlasq2 reference counts on the same
class of spectra are "a few hundred" (~2-4 sweeps per eigenvalue).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

from svdsolver_tpu.models.diagonalize import dqds_svdvals


def spectra():
    g = np.random.default_rng(0)
    yield "stall_random_n120_seed0", g.standard_normal(120), g.standard_normal(119)
    g = np.random.default_rng(1)
    yield "random_n200_seed1", g.standard_normal(200), g.standard_normal(199)
    g = np.random.default_rng(2)
    n = 150
    d = g.standard_normal(n) * np.logspace(0, -12, n)
    e = g.standard_normal(n - 1) * np.logspace(0, -12, n - 1)
    yield "graded_1e12_n150", d, e
    g = np.random.default_rng(3)
    yield "uniform_n160", g.uniform(0.5, 1.5, 160), g.uniform(0.5, 1.5, 159)
    # clustered: many near-equal sigma
    g = np.random.default_rng(4)
    n = 128
    d = 1.0 + 1e-8 * g.standard_normal(n)
    e = 1e-4 * g.standard_normal(n - 1)
    yield "clustered_n128", d, e
    # Wilkinson-ish / hard deflation pattern
    g = np.random.default_rng(5)
    n = 140
    d = np.abs(g.standard_normal(n)) + 0.01
    e = 10.0 * np.abs(g.standard_normal(n - 1))
    yield "large_offdiag_n140", d, e


def main():
    total = 0
    for name, d, e in spectra():
        dj, ej = jnp.asarray(d, jnp.float64), jnp.asarray(e, jnp.float64)
        sig, info = dqds_svdvals(dj, ej, with_info=True)
        sig = np.asarray(sig)
        B = np.diag(d) + np.diag(e, 1)
        want = np.linalg.svd(B, compute_uv=False)
        rel = np.max(np.abs(sig - want) / np.maximum(want, 1e-300))
        n = len(d)
        total += int(info)
        print(
            f"{name:28s} n={n:4d} sweeps={int(info):5d} "
            f"({int(info) / n:5.2f}/ev) rel={rel:.2e}"
        )
    print(f"TOTAL sweeps: {total}")


if __name__ == "__main__":
    main()
