"""Differential tests: every bidiagonalization model must preserve singular
values (checked against LAPACK via np.linalg.svd), mirroring the reference's
cross-implementation testing strategy (README.md:225-254)."""

import jax
import numpy as np
import jax.numpy as jnp
import pytest

from svdsolver_tpu.models.golub_kahan import bidiagonalize_gk_jit as bidiagonalize_gk
from svdsolver_tpu.models.blocked import bidiagonalize_blocked
from svdsolver_tpu.models.two_stage import (
    dense_to_band,
    band_to_bidiagonal,
    bidiagonalize_two_stage,
)


def bidiag_svd(d, e):
    d = np.asarray(d)
    e = np.asarray(e)
    B = np.diag(d) + np.diag(e, 1)
    return np.linalg.svd(B, compute_uv=False)


def check_sigma(d, e, A, rtol=1e-9):
    want = np.linalg.svd(np.asarray(A), compute_uv=False)
    got = bidiag_svd(d, e)
    np.testing.assert_allclose(got, want, rtol=rtol, atol=1e-10 * want[0])


def test_gk_square(rng):
    A = jnp.asarray(rng.normal(size=(24, 24)))
    d, e = bidiagonalize_gk(A)
    assert d.shape == (24,) and e.shape == (23,)
    check_sigma(d, e, A)


def test_gk_rectangular(rng):
    A = jnp.asarray(rng.normal(size=(30, 20)))
    d, e = bidiagonalize_gk(A)
    check_sigma(d, e, A)


@pytest.mark.parametrize("n,b", [(24, 8), (32, 8), (30, 8), (16, 16), (20, 7)])
def test_blocked(rng, n, b):
    A = jnp.asarray(rng.normal(size=(n, n)))
    d, e = bidiagonalize_blocked(A, panel=b)
    check_sigma(d, e, A)


def test_blocked_matches_gk(rng):
    A = jnp.asarray(rng.normal(size=(24, 24)))
    d1, e1 = bidiagonalize_gk(A)
    d2, e2 = bidiagonalize_blocked(A, panel=8)
    np.testing.assert_allclose(np.abs(d1), np.abs(d2), rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.abs(e1), np.abs(e2), rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize("n,b", [(32, 8), (64, 16), (48, 8)])
def test_dense_to_band(rng, n, b):
    A = jnp.asarray(rng.normal(size=(n, n)))
    Ab = np.asarray(dense_to_band(A, band=b))
    # band structure: zeros outside diagonal band [0, b]
    i, j = np.ogrid[:n, :n]
    outside = (j - i < 0) | (j - i > b)
    np.testing.assert_allclose(Ab[outside], 0, atol=1e-9)
    # orthogonal invariance of singular values
    want = np.linalg.svd(np.asarray(A), compute_uv=False)
    got = np.linalg.svd(Ab, compute_uv=False)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-10 * want[0])


@pytest.mark.parametrize("n,b", [(32, 4), (32, 8), (48, 8), (24, 3)])
def test_band_to_bidiagonal(rng, n, b):
    # start from a genuine band matrix
    A = jnp.asarray(rng.normal(size=(n, n)))
    i, j = np.ogrid[:n, :n]
    band = np.where((j - i >= 0) & (j - i <= b), np.asarray(A), 0.0)
    d, e = band_to_bidiagonal(jnp.asarray(band), band=b)
    want = np.linalg.svd(band, compute_uv=False)
    got = bidiag_svd(d, e)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-10 * want[0])


@pytest.mark.parametrize("n,b", [(32, 8), (64, 16)])
def test_two_stage_end_to_end(rng, n, b):
    A = jnp.asarray(rng.normal(size=(n, n)))
    d, e = bidiagonalize_two_stage(A, band=b)
    check_sigma(d, e, A)


@pytest.mark.parametrize("n,b", [(32, 8), (64, 16)])
def test_tiled_stage1(rng, n, b):
    from svdsolver_tpu.models.tiled import dense_to_band_tiled

    A = jnp.asarray(rng.normal(size=(n, n)))
    Ab = np.asarray(dense_to_band_tiled(A, band=b))
    i, j = np.ogrid[:n, :n]
    outside = (j - i < 0) | (j - i > b)
    np.testing.assert_allclose(Ab[outside], 0, atol=1e-9)
    want = np.linalg.svd(np.asarray(A), compute_uv=False)
    got = np.linalg.svd(Ab, compute_uv=False)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-10 * want[0])


def test_wavefront_matches_sequential_exactly(rng):
    from svdsolver_tpu.models.two_stage import band_to_bidiagonal_wavefront

    n, b = 48, 8
    A = jnp.asarray(rng.normal(size=(n, n)))  # f64: schedules agree bitwise
    Ab = dense_to_band(A, band=b)
    d1, e1 = band_to_bidiagonal(Ab, band=b)
    d2, e2 = band_to_bidiagonal_wavefront(Ab, band=b)
    # The two schedules perform identical arithmetic; f64-tight allclose
    # rather than bitwise because the remote compile service can serve the
    # two programs from different compiler generations (persistent cache)
    # with different fusion/rounding.
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-12, atol=1e-13)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), rtol=1e-12, atol=1e-13)


def test_tiled_feeds_stage2(rng):
    from svdsolver_tpu.models.tiled import dense_to_band_tiled

    n, b = 48, 8
    A = jnp.asarray(rng.normal(size=(n, n)))
    Ab = dense_to_band_tiled(A, band=b)
    d, e = band_to_bidiagonal(Ab, band=b)
    check_sigma(d, e, A)


def test_dense_to_band_segments_match(rng):
    # Segmented trailing updates (static shrinking sub-blocks) compute the
    # same reduction as the full-width schedule up to contraction rounding.
    n, b = 96, 16
    A = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))
    A1 = np.asarray(dense_to_band(A, band=b, segments=1))
    A4 = np.asarray(dense_to_band(A, band=b, segments=4))
    np.testing.assert_allclose(A4, A1, atol=5e-5)
    want = np.linalg.svd(np.asarray(A, np.float64), compute_uv=False)
    got = np.linalg.svd(A4.astype(np.float64), compute_uv=False)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-5 * want[0])
