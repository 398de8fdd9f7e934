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


def test_polar_right_left(rng):
    from svdsolver_tpu.linalg import polar

    A = jnp.asarray(rng.normal(size=(48, 32)).astype(np.float32))
    W, P = polar(A)
    An = np.asarray(A)
    Wn, Pn = np.asarray(W), np.asarray(P)
    assert np.abs(Wn.T @ Wn - np.eye(32)).max() < 1e-4
    assert np.abs(Pn - Pn.T).max() < 1e-4
    assert np.min(np.linalg.eigvalsh(Pn.astype(np.float64))) > -1e-3
    assert np.abs(Wn @ Pn - An).max() / np.abs(An).max() < 1e-4
    Wl, Pl = polar(A, side="left")
    assert np.abs(np.asarray(Pl) @ np.asarray(Wl) - An).max() / np.abs(An).max() < 1e-4


def test_eigh_symmetric_indefinite(rng):
    from svdsolver_tpu.linalg import eigh

    n = 64
    M = rng.normal(size=(n, n))
    A = jnp.asarray((M + M.T).astype(np.float32))  # indefinite spectrum
    w, V = eigh(A)
    wn, Vn = np.asarray(w), np.asarray(V)
    An = np.asarray(A)
    ref = np.linalg.eigvalsh(An.astype(np.float64))
    assert np.all(np.diff(wn) >= -1e-3)  # ascending
    assert np.max(np.abs(np.sort(wn) - ref)) / np.abs(ref).max() < 1e-4
    assert np.abs(An @ Vn - Vn * wn[None, :]).max() / np.abs(ref).max() < 1e-3
    assert np.abs(Vn.T @ Vn - np.eye(n)).max() < 1e-3


def test_orth_null_space(rng):
    from svdsolver_tpu.linalg import orth, null_space

    # rank-deficient tall: 40x24 of rank 16
    B = rng.normal(size=(40, 16)) @ rng.normal(size=(16, 24))
    A = jnp.asarray(B.astype(np.float32))
    Q = np.asarray(orth(A))
    assert Q.shape == (40, 16)
    assert np.abs(Q.T @ Q - np.eye(16)).max() < 1e-4
    # range check: projecting A onto Q changes nothing
    assert np.abs(Q @ (Q.T @ np.asarray(A)) - np.asarray(A)).max() < 1e-3
    N = np.asarray(null_space(A))
    assert N.shape == (24, 8)
    assert np.abs(np.asarray(A) @ N).max() < 1e-3
    assert np.abs(N.T @ N - np.eye(8)).max() < 1e-4
    # wide input: null space needs the padded full basis
    Aw = jnp.asarray(rng.normal(size=(16, 40)).astype(np.float32))
    Nw = np.asarray(null_space(Aw))
    assert Nw.shape == (40, 24)
    assert np.abs(np.asarray(Aw) @ Nw).max() < 1e-3
    assert np.abs(Nw.T @ Nw - np.eye(24)).max() < 1e-4


def test_rsvd(rng):
    from svdsolver_tpu.linalg import rsvd

    # fast-decaying spectrum: rsvd captures the top-k triplets accurately
    m, n, k = 96, 64, 8
    U0, _ = np.linalg.qr(rng.normal(size=(m, n)))
    V0, _ = np.linalg.qr(rng.normal(size=(n, n)))
    s0 = np.power(10.0, -np.arange(n, dtype=np.float64) / 4)
    A = jnp.asarray((U0 * s0[None, :] @ V0.T).astype(np.float32))
    U, s, Vh = (np.asarray(x) for x in rsvd(A, k))
    assert U.shape == (m, k) and s.shape == (k,) and Vh.shape == (k, n)
    assert np.max(np.abs(s - s0[:k]) / s0[:k]) < 1e-3
    assert np.abs(U.T @ U - np.eye(k)).max() < 1e-3
    An = np.asarray(A)
    # rank-k reconstruction error ~ sigma_{k+1}
    err = np.linalg.norm(U * s[None, :] @ Vh - An, 2)
    assert err < 3 * s0[k]
    # tiny k exercises the small-sketch exact-SVD tail
    U2, s2, _ = (np.asarray(x) for x in rsvd(A, 4))
    assert np.max(np.abs(s2 - s0[:4]) / s0[:4]) < 1e-3
