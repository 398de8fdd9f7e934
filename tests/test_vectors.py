"""Full-SVD (singular vector) tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from svdsolver_tpu.models.vectors import (
    svd,
    bidiagonal_svd,
    bidiagonalize_blocked_uv,
)


def test_blocked_uv_reconstructs(rng):
    n = 48
    A = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))
    d, e, U, V = bidiagonalize_blocked_uv(A, panel=16)
    B = np.diag(np.asarray(d)) + np.diag(np.asarray(e), 1)
    rec = np.asarray(U) @ B @ np.asarray(V).T
    np.testing.assert_allclose(rec, np.asarray(A), atol=2e-5)
    # factors orthogonal
    Un = np.asarray(U)
    np.testing.assert_allclose(Un.T @ Un, np.eye(n), atol=2e-5)


def test_bidiagonal_svd_residuals(rng):
    n = 64
    d = jnp.asarray(rng.normal(size=n).astype(np.float32))
    e = jnp.asarray(rng.normal(size=n - 1).astype(np.float32))
    U_b, s, V_b = bidiagonal_svd(d, e)
    B = np.diag(np.asarray(d)) + np.diag(np.asarray(e), 1)
    res = np.linalg.norm(
        B @ np.asarray(V_b) - np.asarray(U_b) * np.asarray(s)[None, :], axis=0
    )
    assert res.max() / np.asarray(s)[0] < 1e-5


@pytest.mark.parametrize("shape", [(48, 20), (20, 48)])
def test_full_svd_rectangular(rng, shape):
    A = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    U, s, Vh = svd(A, panel=8)
    U, s, Vh = np.asarray(U), np.asarray(s), np.asarray(Vh)
    k = min(shape)
    assert U.shape == (shape[0], k) and Vh.shape == (k, shape[1])
    want = np.linalg.svd(np.asarray(A, np.float64), compute_uv=False)
    np.testing.assert_allclose(s, want, rtol=2e-5, atol=1e-5 * want[0])
    np.testing.assert_allclose(
        U @ np.diag(s) @ Vh, np.asarray(A), atol=3e-5 * want[0]
    )


@pytest.mark.parametrize("n,b", [(32, 8), (96, 16)])
def test_full_svd(rng, n, b):
    A = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))
    U, s, Vh = svd(A, panel=b)
    U, s, Vh = np.asarray(U), np.asarray(s), np.asarray(Vh)
    want = np.linalg.svd(np.asarray(A, np.float64), compute_uv=False)
    np.testing.assert_allclose(s, want, rtol=2e-5, atol=1e-5 * want[0])
    np.testing.assert_allclose(
        U @ np.diag(s) @ Vh, np.asarray(A), atol=3e-5 * want[0]
    )
    np.testing.assert_allclose(U.T @ U, np.eye(n), atol=5e-5)
    np.testing.assert_allclose(Vh @ Vh.T, np.eye(n), atol=5e-5)
