"""Robustness: degenerate and adversarial inputs through the full pipeline."""

import numpy as np
import jax
import jax.numpy as jnp

from svdsolver_tpu.models.svd import svdvals


def check(A, rtol=1e-7, **kw):
    want = np.linalg.svd(np.asarray(A, np.float64), compute_uv=False)
    got = np.asarray(svdvals(jnp.asarray(A), **kw))
    np.testing.assert_allclose(got, want, rtol=rtol, atol=1e-9 * max(want[0], 1))


def test_zero_matrix():
    A = np.zeros((24, 24))
    got = np.asarray(svdvals(jnp.asarray(A), block=8))
    np.testing.assert_array_equal(got, np.zeros(24))


def test_identity():
    check(np.eye(24), block=8)


def test_rank_one(rng):
    u = rng.normal(size=(24, 1))
    v = rng.normal(size=(1, 24))
    check(u @ v, block=8)


def test_rank_deficient(rng):
    A = rng.normal(size=(32, 5)) @ rng.normal(size=(5, 32))
    check(A, block=8)


def test_duplicate_singular_values(rng):
    # orthogonal * diag(repeated) * orthogonal
    q1, _ = np.linalg.qr(rng.normal(size=(24, 24)))
    q2, _ = np.linalg.qr(rng.normal(size=(24, 24)))
    s = np.repeat([5.0, 3.0, 1.0, 1e-6], 6)
    check(q1 @ np.diag(s) @ q2, block=8)


def test_wide_dynamic_range(rng):
    q1, _ = np.linalg.qr(rng.normal(size=(24, 24)))
    q2, _ = np.linalg.qr(rng.normal(size=(24, 24)))
    s = np.logspace(8, -8, 24)
    A = q1 @ np.diag(s) @ q2
    want = s
    got = np.asarray(svdvals(jnp.asarray(A), block=8))
    # absolute accuracy relative to sigma_max (fp arithmetic limit)
    np.testing.assert_allclose(got, want, atol=1e-12 * s[0], rtol=1e-8)


def test_already_bidiagonal(rng):
    A = np.diag(rng.normal(size=16)) + np.diag(rng.normal(size=15), 1)
    check(A, block=8)


def test_diagonal_matrix(rng):
    check(np.diag(rng.normal(size=24)), block=8)


def test_tiny_sizes(rng):
    for n in (1, 2, 3):
        A = rng.normal(size=(n, n))
        want = np.linalg.svd(A, compute_uv=False)
        got = np.asarray(svdvals(jnp.asarray(A), method="base"))
        np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)


def test_entry_point_compiles():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = np.asarray(jax.jit(fn)(*args))
    assert out.shape == (args[0].shape[0],)
    assert np.all(np.isfinite(out))
    assert np.all(np.diff(out) <= 0)  # descending


def test_fuzz_models_agree(rng):
    """All models must produce the same singular values (multi-seed fuzz)."""
    for seed in range(4):
        r = np.random.default_rng(seed)
        A = jnp.asarray(r.normal(size=(32, 32)))
        want = np.linalg.svd(np.asarray(A), compute_uv=False)
        for method in ("base", "singlecore", "multicore", "tpu1", "tpu2"):
            got = np.asarray(svdvals(A, method=method, block=8))
            np.testing.assert_allclose(
                got, want, rtol=1e-7, atol=1e-9 * want[0],
                err_msg=f"seed={seed} method={method}",
            )


def test_svds_and_linalg_edge_cases(rng):
    import jax.numpy as jnp
    import numpy as np
    from svdsolver_tpu import svds, pinv, lstsq, matrix_rank, lowrank

    n = 32
    # identity: all triplets trivial
    U, s, Vh = svds(jnp.eye(n, dtype=jnp.float32), 4)
    np.testing.assert_allclose(np.asarray(s), np.ones(4), atol=1e-5)
    # rank-one matrix: top triplet exact, k beyond rank returns ~zero sigma
    u = rng.normal(size=(n, 1)).astype(np.float32)
    v = rng.normal(size=(1, n)).astype(np.float32)
    A = jnp.asarray(u @ v)
    U, s, Vh = svds(A, 3)
    want0 = np.linalg.norm(u) * np.linalg.norm(v)
    assert abs(float(s[0]) - want0) / want0 < 1e-4
    assert float(s[1]) < 1e-4 * want0 and float(s[2]) < 1e-4 * want0
    assert int(matrix_rank(A, rtol=1e-4)) == 1
    # pinv of rank-one: A @ pinv(A) @ A == A
    P = np.asarray(pinv(A, rtol=1e-4))
    An = np.asarray(A)
    np.testing.assert_allclose(An @ P @ An, An, atol=2e-3 * np.abs(An).max())
    # lstsq with inconsistent rhs: minimum-norm least squares
    x, resid, rank = lstsq(A, jnp.asarray(rng.normal(size=n).astype(np.float32)),
                           rtol=1e-4)
    assert int(rank) == 1 and np.isfinite(float(resid))
    # lowrank of an exactly rank-k matrix reconstructs it
    r = 5
    L0 = rng.normal(size=(n, r)).astype(np.float32)
    R0 = rng.normal(size=(r, n)).astype(np.float32)
    B = jnp.asarray(L0 @ R0)
    L, R = lowrank(B, r)
    np.testing.assert_allclose(
        np.asarray(L) @ np.asarray(R), np.asarray(B),
        atol=5e-4 * float(jnp.abs(B).max()),
    )


def test_svd_batch_mixed_spectra(rng):
    """Batch entries with very different spectra (well-conditioned, clustered,
    near-singular) must not contaminate each other under vmap."""
    import jax.numpy as jnp
    import numpy as np
    from svdsolver_tpu import svd_batch

    n = 32
    Q1, _ = np.linalg.qr(rng.normal(size=(n, n)))
    Q2, _ = np.linalg.qr(rng.normal(size=(n, n)))
    specs = [
        np.linspace(2.0, 1.0, n),
        np.full(n, 1.5),
        np.concatenate([np.linspace(3, 1, n - 4), np.full(4, 1e-5)]),
    ]
    As = np.stack(
        [(Q1 * sp[None, :]) @ Q2.T for sp in specs]
    ).astype(np.float32)
    U, s, Vh = svd_batch(jnp.asarray(As))
    for i, sp in enumerate(specs):
        want = np.sort(sp)[::-1]
        np.testing.assert_allclose(
            np.asarray(s[i]), want, rtol=2e-4, atol=2e-5 * want[0]
        )
        rec = np.asarray(U[i]) @ np.diag(np.asarray(s[i])) @ np.asarray(Vh[i])
        np.testing.assert_allclose(rec, As[i], atol=5e-5 * want[0])


def test_jacobi_edge_cases(rng):
    # the Jacobi family on the degenerate inputs the other models cover
    from svdsolver_tpu import svd_jacobi

    n = 32
    Z = jnp.zeros((n, n), jnp.float32)
    U, s, Vh = (np.asarray(x) for x in svd_jacobi(Z))
    assert np.all(s == 0)
    I = jnp.eye(n, dtype=jnp.float32)
    _, s1, _ = (np.asarray(x) for x in svd_jacobi(I))
    assert np.max(np.abs(s1 - 1)) < 1e-5
    # rank-one
    u = rng.normal(size=(n, 1))
    A = jnp.asarray((u @ u.T).astype(np.float32))
    U, s, Vh = (np.asarray(x) for x in svd_jacobi(A))
    ref = np.linalg.svd(np.asarray(A, np.float64), compute_uv=False)
    assert np.max(np.abs(s - ref)) / ref[0] < 1e-4
    An = np.asarray(A)
    assert np.abs(U @ np.diag(s) @ Vh - An).max() / np.abs(An).max() < 1e-4
    # duplicate singular values (orthogonal matrix scaled)
    Q, _ = np.linalg.qr(rng.normal(size=(n, n)))
    _, s2, _ = (np.asarray(x) for x in svd_jacobi(jnp.asarray((3 * Q).astype(np.float32))))
    assert np.max(np.abs(s2 - 3)) < 1e-4


def test_complex_edge_cases(rng):
    from svdsolver_tpu.models.complex_svd import svdvals_c, svd_c

    n = 24
    # zero matrix
    s = np.asarray(svdvals_c(np.zeros((n, n), np.complex64)))
    assert np.all(s == 0)
    # pure-imaginary matrix: sigma equal to the real matrix it scales
    R = rng.normal(size=(n, n))
    s1 = np.asarray(svdvals_c((1j * R).astype(np.complex64)))
    ref = np.linalg.svd(R, compute_uv=False)
    assert np.max(np.abs(s1 - ref)) / ref[0] < 1e-5
    # rank-deficient complex
    u = (rng.normal(size=(n, 2)) + 1j * rng.normal(size=(n, 2)))
    v = (rng.normal(size=(2, n)) + 1j * rng.normal(size=(2, n)))
    A = (u @ v).astype(np.complex64)
    U, s2, Vh = svd_c(A)
    s2 = np.asarray(s2)
    refr = np.linalg.svd(A.astype(np.complex128), compute_uv=False)
    assert np.max(np.abs(s2 - refr)) / refr[0] < 1e-4
    assert np.abs(U @ np.diag(s2) @ Vh - A).max() / np.abs(A).max() < 1e-4
    # unitary diagonal phases: all sigma exactly 1
    ph = np.exp(1j * rng.uniform(0, 2 * np.pi, n)).astype(np.complex64)
    s3 = np.asarray(svdvals_c(np.diag(ph)))
    assert np.max(np.abs(s3 - 1)) < 1e-5
