"""SVD-application tests: pinv / lstsq / rank / cond / norm2 / lowrank."""

import numpy as np
import jax.numpy as jnp

from svdsolver_tpu import pinv, lstsq, matrix_rank, cond, norm2, lowrank


def test_pinv_square(rng):
    n = 64
    A = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))
    P = np.asarray(pinv(A))
    An = np.asarray(A)
    np.testing.assert_allclose(An @ P @ An, An, atol=5e-4 * np.abs(An).max())
    np.testing.assert_allclose(P @ An @ P, P, atol=5e-4 * np.abs(P).max())


def test_pinv_rank_deficient(rng):
    m, n, r = 80, 48, 12
    L = rng.normal(size=(m, r)).astype(np.float32)
    R = rng.normal(size=(r, n)).astype(np.float32)
    A = jnp.asarray(L @ R)
    P = np.asarray(pinv(A, rtol=1e-5))
    An = np.asarray(A)
    # Moore-Penrose conditions (the two that are stable in fp32)
    np.testing.assert_allclose(An @ P @ An, An, atol=2e-3 * np.abs(An).max())
    np.testing.assert_allclose(P @ An @ P, P, atol=2e-3 * np.abs(P).max())


def test_lstsq_overdetermined(rng):
    m, n = 96, 40
    A = jnp.asarray(rng.normal(size=(m, n)).astype(np.float32))
    x_true = rng.normal(size=(n,)).astype(np.float32)
    b = jnp.asarray(np.asarray(A) @ x_true)
    x, resid, rank = lstsq(A, b)
    np.testing.assert_allclose(np.asarray(x), x_true, atol=5e-4)
    assert float(resid) < 1e-3
    assert int(rank) == n


def test_lstsq_multiple_rhs(rng):
    m, n, nrhs = 64, 32, 3
    A = jnp.asarray(rng.normal(size=(m, n)).astype(np.float32))
    B = jnp.asarray(rng.normal(size=(m, nrhs)).astype(np.float32))
    x, resid, rank = lstsq(A, B)
    assert x.shape == (n, nrhs) and resid.shape == (nrhs,)
    want, *_ = np.linalg.lstsq(np.asarray(A), np.asarray(B), rcond=None)
    np.testing.assert_allclose(np.asarray(x), want, atol=2e-3)


def test_rank_cond_norm2(rng):
    n, r = 64, 20
    L = rng.normal(size=(n, r)).astype(np.float32)
    A = jnp.asarray(L @ L.T)
    assert int(matrix_rank(A, rtol=1e-4)) == r
    B = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))
    want = np.linalg.svd(np.asarray(B, np.float64), compute_uv=False)
    assert abs(float(norm2(B)) - want[0]) / want[0] < 1e-5
    assert abs(float(cond(B)) - want[0] / want[-1]) / (want[0] / want[-1]) < 1e-3
    # rectangular spectral norm
    C = jnp.asarray(rng.normal(size=(48, 96)).astype(np.float32))
    wc = np.linalg.svd(np.asarray(C, np.float64), compute_uv=False)
    assert abs(float(norm2(C)) - wc[0]) / wc[0] < 1e-5


def test_lowrank_eckart_young(rng):
    n, k = 96, 10
    A = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))
    L, R = lowrank(A, k)
    assert L.shape == (n, k) and R.shape == (k, n)
    want = np.linalg.svd(np.asarray(A, np.float64), compute_uv=False)
    # Frobenius error of the best rank-k approximation = sqrt(sum tail sig^2)
    err = np.linalg.norm(np.asarray(L) @ np.asarray(R) - np.asarray(A))
    best = np.sqrt(np.sum(want[k:] ** 2))
    assert err <= best * (1 + 1e-3) + 1e-4 * want[0]
