"""Unit tests for Householder and Givens primitives."""

import jax
import numpy as np
import jax.numpy as jnp

from svdsolver_tpu.ops import householder as hh
from svdsolver_tpu.ops import givens as gv

# jit everything once — eager dispatch is pathologically slow in this env
householder_vector = jax.jit(hh.householder_vector)
apply_left = jax.jit(hh.apply_left)
apply_right = jax.jit(hh.apply_right)
givens = jax.jit(gv.givens)


def dense_H(v, tau):
    v = np.asarray(v)
    return np.eye(v.size) - tau * np.outer(v, v)


def test_householder_eliminates_tail(rng):
    x = jnp.asarray(rng.normal(size=12))
    for p in [0, 3, 10, 11]:
        v, tau, beta = householder_vector(x, p)
        Hx = dense_H(v, float(tau)) @ np.asarray(x)
        assert np.allclose(Hx[p + 1 :], 0, atol=1e-12)
        assert np.isclose(Hx[p], float(beta))
        # rows above the pivot untouched
        assert np.allclose(Hx[:p], np.asarray(x)[:p])
        # reflector structure
        assert np.asarray(v)[p] == 1.0
        assert np.allclose(np.asarray(v)[:p], 0)


def test_householder_orthogonality(rng):
    x = jnp.asarray(rng.normal(size=9))
    v, tau, _ = householder_vector(x, 2)
    H = dense_H(v, float(tau))
    assert np.allclose(H @ H.T, np.eye(9), atol=1e-12)


def test_householder_degenerate_zero_tail():
    x = jnp.asarray(np.array([1.0, 2.0, 0.0, 0.0]))
    v, tau, beta = householder_vector(x, 1)
    assert float(tau) == 0.0
    assert float(beta) == 2.0


def test_householder_out_of_range_pivot():
    x = jnp.asarray(np.array([1.0, 2.0, 3.0]))
    v, tau, beta = householder_vector(x, 3)
    assert float(tau) == 0.0


def test_apply_left_right(rng):
    A = jnp.asarray(rng.normal(size=(6, 5)))
    v, tau, _ = householder_vector(A[:, 0], 0)
    out = apply_left(A, v, tau)
    ref = dense_H(v, float(tau)) @ np.asarray(A)
    assert np.allclose(np.asarray(out), ref, atol=1e-12)

    u, tau_r, _ = householder_vector(A[0, :], 1)
    out = apply_right(A, u, tau_r)
    ref = np.asarray(A) @ dense_H(u, float(tau_r))
    assert np.allclose(np.asarray(out), ref, atol=1e-12)


def test_givens_matches_reference_semantics(rng):
    for f, g in [(3.0, 4.0), (-5.0, 2.0), (0.0, 7.0), (1e-3, -2e3), (0.0, 0.0)]:
        c, s, r = (float(t) for t in givens(f, g))
        # [c s; -s c]^T [f, g] = [r, 0]
        assert np.isclose(c * f + s * g, r, atol=1e-12)
        assert np.isclose(-s * f + c * g, 0, atol=1e-9 * max(1, abs(r)))
        assert np.isclose(c * c + s * s, 1.0) or (f == 0 and g == 0)
