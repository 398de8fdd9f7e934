"""Tests for the implicit zero-shift QR diagonalization."""

import numpy as np
import jax.numpy as jnp
import pytest

import jax

from svdsolver_tpu.models import diagonalize as dg
from svdsolver_tpu.models.svd import svdvals

zero_shift_sweep = jax.jit(dg.zero_shift_sweep)
diag_reduce_fixed_iter = jax.jit(dg.diag_reduce_fixed_iter, static_argnums=2)
bidiagonal_svdvals = dg.bidiagonal_svdvals  # already jitted
bisect_svdvals = dg.bisect_svdvals  # already jitted
convergence_threshold = jax.jit(dg.convergence_threshold)


def rand_bidiag(rng, n):
    d = jnp.asarray(rng.normal(size=n))
    e = jnp.asarray(rng.normal(size=n - 1))
    return d, e


def sigma_of(d, e):
    B = np.diag(np.asarray(d)) + np.diag(np.asarray(e), 1)
    return np.linalg.svd(B, compute_uv=False)


def test_sweep_preserves_singular_values(rng):
    d, e = rand_bidiag(rng, 12)
    want = sigma_of(d, e)
    d2, e2 = zero_shift_sweep(d, e)
    got = sigma_of(d2, e2)
    np.testing.assert_allclose(np.sort(got), np.sort(want), rtol=1e-10)


def test_sweep_subblock_only_touches_block(rng):
    d, e = rand_bidiag(rng, 12)
    d2, e2 = zero_shift_sweep(d, e, 3, 7)
    # outside [3,7] (d) and [3,6] (e) untouched
    np.testing.assert_array_equal(np.asarray(d2)[:3], np.asarray(d)[:3])
    np.testing.assert_array_equal(np.asarray(d2)[8:], np.asarray(d)[8:])
    np.testing.assert_array_equal(np.asarray(e2)[:3], np.asarray(e)[:3])
    np.testing.assert_array_equal(np.asarray(e2)[7:], np.asarray(e)[7:])
    # sub-block singular values preserved
    want = sigma_of(np.asarray(d)[3:8], np.asarray(e)[3:7])
    got = sigma_of(np.asarray(d2)[3:8], np.asarray(e2)[3:7])
    np.testing.assert_allclose(np.sort(got), np.sort(want), rtol=1e-10)


def test_fixed_iter_converges_superdiagonal(rng):
    d, e = rand_bidiag(rng, 8)
    d2, e2 = diag_reduce_fixed_iter(d, e, 200)
    # zero-shift sweeps drive e -> 0
    assert np.max(np.abs(np.asarray(e2))) < 1e-8 * np.max(np.abs(np.asarray(d2)))


@pytest.mark.parametrize("n", [2, 5, 16, 64])
def test_svdvals_vs_lapack(rng, n):
    d, e = rand_bidiag(rng, n)
    want = sigma_of(d, e)
    got = np.asarray(bidiagonal_svdvals(d, e))
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-12 * want[0])


def test_svdvals_with_deflation_splits(rng):
    # exact zeros in e force independent blocks
    d = jnp.asarray(rng.normal(size=10))
    e = jnp.asarray(rng.normal(size=9)).at[3].set(0.0).at[7].set(0.0)
    want = sigma_of(d, e)
    got = np.asarray(bidiagonal_svdvals(d, e))
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-12 * want[0])


@pytest.mark.parametrize("n", [1, 2, 5, 16, 64])
def test_bisect_vs_lapack(rng, n):
    d = jnp.asarray(rng.normal(size=n))
    e = jnp.asarray(rng.normal(size=max(n - 1, 0)))
    B = np.diag(np.asarray(d)) + np.diag(np.asarray(e), 1)
    want = np.linalg.svd(B, compute_uv=False)
    got = np.asarray(bisect_svdvals(d, e))
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12 * max(want[0], 1))


def test_bisect_with_exact_zeros(rng):
    d = jnp.asarray(rng.normal(size=10)).at[4].set(0.0)
    e = jnp.asarray(rng.normal(size=9)).at[6].set(0.0)
    B = np.diag(np.asarray(d)) + np.diag(np.asarray(e), 1)
    want = np.linalg.svd(B, compute_uv=False)
    got = np.asarray(bisect_svdvals(d, e))
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-13 * want[0])


def test_bisect_repeated_values():
    # identity-like bidiagonal: all sigma equal
    d = jnp.ones((8,))
    e = jnp.zeros((7,))
    got = np.asarray(bisect_svdvals(d, e))
    np.testing.assert_allclose(got, np.ones(8), rtol=1e-12)


def test_threshold_positive(rng):
    d, e = rand_bidiag(rng, 20)
    t = float(convergence_threshold(d, e))
    assert t > 0


@pytest.mark.parametrize("method", ["base", "singlecore", "multicore"])
def test_full_svdvals_pipeline(rng, method):
    A = jnp.asarray(rng.normal(size=(32, 32)))
    want = np.linalg.svd(np.asarray(A), compute_uv=False)
    got = np.asarray(svdvals(A, method=method, block=8))
    np.testing.assert_allclose(got, want, rtol=1e-7, atol=1e-9 * want[0])


@pytest.mark.parametrize("shape", [(48, 20), (20, 48)])
def test_svdvals_rectangular(rng, shape):
    A = jnp.asarray(rng.normal(size=shape))
    want = np.linalg.svd(np.asarray(A), compute_uv=False)
    got = np.asarray(svdvals(A, method="tpu2", block=8))
    np.testing.assert_allclose(got, want, rtol=1e-7, atol=1e-9 * want[0])


def test_svdvals_batch(rng):
    from svdsolver_tpu.models.svd import svdvals_batch

    As = jnp.asarray(rng.normal(size=(3, 24, 24)).astype(np.float32))
    got = np.asarray(svdvals_batch(As, block=8))
    want = np.linalg.svd(np.asarray(As, np.float64), compute_uv=False)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5 * want.max())


def test_full_svdvals_padding(rng):
    # n not divisible by block exercises the padding path
    A = jnp.asarray(rng.normal(size=(30, 30)))
    want = np.linalg.svd(np.asarray(A), compute_uv=False)
    got = np.asarray(svdvals(A, method="tpu2", block=8))
    np.testing.assert_allclose(got, want, rtol=1e-7, atol=1e-9 * want[0])


def test_dqds_random(rng):
    from svdsolver_tpu.models.diagonalize import dqds_svdvals

    for n in (8, 48, 120):
        d = jnp.asarray(rng.normal(size=n))
        e = jnp.asarray(rng.normal(size=n - 1))
        got = np.asarray(dqds_svdvals(d, e))
        B = np.diag(np.asarray(d)) + np.diag(np.asarray(e), 1)
        want = np.linalg.svd(B, compute_uv=False)
        # full RELATIVE accuracy, every value (dlasq2-style splitting —
        # measured ~1e-13 on random spectra; was normwise-only pre-split)
        rel = np.max(np.abs(got - want) / np.maximum(want, 1e-300))
        assert rel < 1e-10, (n, rel)


def test_dqds_graded_relative_accuracy(rng):
    # the property dqds exists for: high RELATIVE accuracy on graded spectra
    # (fixed-count bisection only brackets to absolute ~||B||*2^-iters)
    from svdsolver_tpu.models.diagonalize import dqds_svdvals, bisect_svdvals

    n = 64
    d = jnp.asarray(np.logspace(0, -12, n))
    e = jnp.asarray(np.logspace(-1, -12, n - 1))
    B = np.diag(np.asarray(d)) + np.diag(np.asarray(e), 1)
    want = np.linalg.svd(B, compute_uv=False)
    got = np.asarray(dqds_svdvals(d, e))
    rel = np.max(np.abs(got - want) / want)  # RELATIVE, every value
    assert rel < 1e-11, rel
    rel_bis = np.max(np.abs(np.asarray(bisect_svdvals(d, e)) - want) / want)
    assert rel < rel_bis / 100  # decisively better than bisection here


def test_dqds_fp32(rng):
    from svdsolver_tpu.models.diagonalize import dqds_svdvals

    n = 48
    d = jnp.asarray(rng.normal(size=n).astype(np.float32))
    e = jnp.asarray(rng.normal(size=n - 1).astype(np.float32))
    got = np.asarray(dqds_svdvals(d, e))
    B = np.diag(np.asarray(d, np.float64)) + np.diag(np.asarray(e, np.float64), 1)
    want = np.linalg.svd(B, compute_uv=False)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-5 * want[0])


def test_svdvals_diag_dqds(rng):
    from svdsolver_tpu.models.svd import svdvals

    n = 48
    A = jnp.asarray(rng.uniform(0, 5, (n, n)).astype(np.float32))
    got = np.asarray(svdvals(A, diag="dqds"))
    want = np.linalg.svd(np.asarray(A, np.float64), compute_uv=False)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-5 * want[0])


def test_dqds_sweep_count_regression():
    # the recorded stall-class spectrum (random n=120, seed 0): sweep
    # counts 5594 (pre-splitting) -> 1293 (round-2 battery) -> 1028
    # (dlasq4 twisted-case split) -> 865 (round-4 full dlasq4 battery +
    # dlasq3 exact-2x2 deflation + qd reversal).  LAPACK dlasq2 itself,
    # called head-to-head on this spectrum via ctypes, reports 877
    # iterations (Z(2N+3)) — the gate below is LAPACK-parity class.
    # Gate both the count and the relative accuracy so shift-battery
    # changes can't silently regress either.
    from svdsolver_tpu.models.diagonalize import dqds_svdvals

    g = np.random.default_rng(0)
    n = 120
    d = jnp.asarray(g.standard_normal(n))
    e = jnp.asarray(g.standard_normal(n - 1))
    sig, info = dqds_svdvals(d, e, with_info=True)
    assert int(info) <= 900, int(info)
    B = np.diag(np.asarray(d)) + np.diag(np.asarray(e), 1)
    want = np.linalg.svd(B, compute_uv=False)
    rel = np.max(
        np.abs(np.asarray(sig) - want) / np.maximum(want, 1e-300)
    )
    assert rel < 1e-10, rel


def test_dqds_two_entry_window(rng):
    # 2-entry windows take the EXACT trailing-2x2 shift and must deflate
    # in O(1) sweeps with full relative accuracy
    from svdsolver_tpu.models.diagonalize import dqds_svdvals

    d = jnp.asarray([3.0, 1e-6])
    e = jnp.asarray([2.0])
    sig, info = dqds_svdvals(d, e, with_info=True)
    B = np.diag(np.asarray(d)) + np.diag(np.asarray(e), 1)
    want = np.linalg.svd(B, compute_uv=False)
    rel = np.max(np.abs(np.asarray(sig) - want) / want)
    assert rel < 1e-12, rel
    assert int(info) <= 6, int(info)


def test_dqds_interior_split(rng):
    # an explicitly decoupled spectrum: the interior split must not stall
    # the chase nor corrupt the frozen upper block's values
    from svdsolver_tpu.models.diagonalize import dqds_svdvals

    d = np.concatenate([np.linspace(2, 1, 30), np.linspace(0.5, 0.1, 30)])
    e = np.concatenate(
        [np.linspace(1, 0.5, 29), [1e-200], np.linspace(0.2, 0.1, 29)]
    )
    got = np.asarray(dqds_svdvals(jnp.asarray(d), jnp.asarray(e)))
    B = np.diag(d) + np.diag(e, 1)
    want = np.linalg.svd(B, compute_uv=False)
    rel = np.max(np.abs(got - want) / np.maximum(want, 1e-300))
    assert rel < 1e-10, rel


def test_qr_chunked_matches_single_shot(rng):
    # chunked host-driven deflation (watchdog guard) must agree with one
    # full-length compiled loop on the same input
    from svdsolver_tpu.models.diagonalize import bidiagonal_svdvals

    n = 96
    d = jnp.asarray(rng.uniform(0, 5, n).astype(np.float32))
    e = jnp.asarray(rng.uniform(0, 5, n - 1).astype(np.float32))
    whole = np.asarray(bidiagonal_svdvals(d, e, chunk_sweeps=30 * n))
    chunked = np.asarray(bidiagonal_svdvals(d, e, chunk_sweeps=16))
    B = np.diag(np.asarray(d, np.float64)) + np.diag(np.asarray(e, np.float64), 1)
    want = np.linalg.svd(B, compute_uv=False)
    assert np.max(np.abs(whole - want)) / want[0] < 1e-5
    assert np.max(np.abs(chunked - want)) / want[0] < 1e-5


def test_qr_threshold_floor_converges_fast(rng):
    # regression: DK's tol*lbound underflows on random bidiagonals
    # (sigma_min exponentially small in n); without the absolute
    # eps*||B|| floor nothing deflates and the solver runs to its 30n cap
    from svdsolver_tpu.models.diagonalize import (
        _qr_diag_chunk,
        _qr_diag_thresh,
    )

    n = 192
    d = jnp.asarray(rng.uniform(0, 5, n).astype(np.float32))
    e = jnp.asarray(rng.uniform(0, 5, n - 1).astype(np.float32))
    thresh = _qr_diag_thresh(d, e)
    assert float(thresh) > 1e-9  # floored near eps*||B||, not underflowed
    d1, e1, _ = _qr_diag_chunk(d, e, thresh, max_sweeps=4 * n)
    live = int(np.sum(np.abs(np.asarray(e1)) > float(thresh)))
    assert live < n // 2  # deflation is actually progressing
