"""Singular vectors — full SVD (beyond the reference, which computes only
singular values).

Two pieces:

* :func:`bidiagonal_svd` — vectors of the bidiagonal {d, e}: singular values
  from parallel bisection, then eigenvectors of the Golub-Kahan tridiagonal
  ``TGK`` by inverse iteration.  The tridiagonal solve (LU with partial
  pivoting, band-2 upper factor) runs *vectorized across all n shift lanes*,
  the same trick that makes the bisection TPU-shaped: sequential depth is
  O(2n) per iteration with (n,)-vector arithmetic.
* :func:`bidiagonalize_blocked_uv` — the one-stage blocked reduction with
  orthogonal-factor accumulation: per panel, ``U <- U (I - V T V^T)`` with
  the compact-WY ``T`` recovered in closed form
  (``T^{-1} = striu(V^T V) + diag(1/tau)``), so accumulation is all GEMMs.

Known limitation (documented, tested for the generic case): for singular
values that are *exactly* multiple, inverse iteration returns vectors
spanning the right subspace but not orthogonalized within it.
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax

from svdsolver_tpu.ops.householder import householder_vector
from svdsolver_tpu.ops.precision import pdot
from svdsolver_tpu.models.diagonalize import bisect_svdvals


def _larft_closed_form(V, taus):
    """Forward compact-WY T from reflectors: T^{-1} = striu(V^T V) + diag(1/tau).

    Columns with tau == 0 must already be zeroed in ``V`` (their identity
    reflectors then contribute nothing regardless of the 1/tau guard)."""
    b = taus.shape[0]
    dtype = V.dtype
    safe = jnp.where(taus == 0, jnp.ones((), dtype), taus)
    Tinv = jnp.triu(pdot(V.T, V), 1) + jnp.diag(1.0 / safe)
    return jax.scipy.linalg.solve_triangular(
        Tinv, jnp.eye(b, dtype=dtype), lower=False
    )


@functools.partial(jax.jit, static_argnames=("panel",))
def bidiagonalize_blocked_uv(A, panel=32):
    """Blocked one-stage bidiagonalization with U/V accumulation.

    Returns ``(d, e, U, V)`` with ``A = U @ bidiag(d, e) @ V.T`` (square A).
    Same panel math as models/blocked.py plus per-panel GEMM updates of the
    orthogonal factors.
    """
    m, n = A.shape
    if m != n:
        raise ValueError("bidiagonalize_blocked_uv expects a square matrix")
    dtype = A.dtype
    b = int(panel)
    n_panels = -(-n // b)
    d0 = jnp.zeros((n,), dtype)
    e0 = jnp.zeros((n,), dtype)
    U0 = jnp.eye(n, dtype=dtype)
    Vc0 = jnp.eye(n, dtype=dtype)

    def panel_body(k, carry):
        A, d, e, Uacc, Vacc = carry
        c = k * b
        V = jnp.zeros((m, b), dtype)
        Y = jnp.zeros((n, b), dtype)
        X = jnp.zeros((m, b), dtype)
        U = jnp.zeros((n, b), dtype)
        tl0 = jnp.zeros((b,), dtype)
        tr0 = jnp.zeros((b,), dtype)

        def col_body(j, pcarry):
            V, Y, X, U, d, e, tl, tr = pcarry
            g = c + j
            g_ok = g < n
            gc = jnp.minimum(g, n - 1)
            col = A[:, gc] - pdot(V, Y[gc, :]) - pdot(X, U[gc, :])
            v, tau, beta = householder_vector(col, g)
            tau = jnp.where(g_ok, tau, jnp.zeros((), dtype))
            d = d.at[gc].set(jnp.where(g_ok, beta, d[gc]))
            y = tau * (pdot(A.T, v) - pdot(Y, pdot(V.T, v)) - pdot(U, pdot(X.T, v)))
            vz = jnp.where(jnp.logical_and(g_ok, tau != 0), v, jnp.zeros((m,), dtype))
            V = V.at[:, j].set(vz)
            Y = Y.at[:, j].set(y)
            tl = tl.at[j].set(tau)
            row = A[gc, :] - pdot(Y, V[gc, :]) - pdot(U, X[gc, :])
            u, tau_r, beta_r = householder_vector(row, g + 1)
            tau_r = jnp.where(g_ok, tau_r, jnp.zeros((), dtype))
            e = e.at[gc].set(jnp.where(g_ok, beta_r, e[gc]))
            x = tau_r * (pdot(A, u) - pdot(V, pdot(Y.T, u)) - pdot(X, pdot(U.T, u)))
            X = X.at[:, j].set(x)
            uz = jnp.where(tau_r != 0, u, jnp.zeros((n,), dtype))
            U = U.at[:, j].set(uz)
            tr = tr.at[j].set(tau_r)
            return V, Y, X, U, d, e, tl, tr

        V, Y, X, U, d, e, tl, tr = lax.fori_loop(
            0, b, col_body, (V, Y, X, U, d, e, tl0, tr0)
        )
        A = A - pdot(V, Y.T) - pdot(X, U.T)
        # accumulate the orthogonal factors (forward products, compact-WY)
        TL = _larft_closed_form(V, tl)
        Uacc = Uacc - pdot(pdot(pdot(Uacc, V), TL), V.T)
        TR = _larft_closed_form(U, tr)
        Vacc = Vacc - pdot(pdot(pdot(Vacc, U), TR), U.T)
        return A, d, e, Uacc, Vacc

    A, d, e, Uacc, Vacc = lax.fori_loop(
        0, n_panels, panel_body, (A, d0, e0, U0, Vc0)
    )
    return d, e[: n - 1], Uacc, Vacc


@functools.partial(jax.jit, static_argnames=("iters",))
def tgk_vectors(d, e, sig, iters=3):
    """Singular vectors of the bidiagonal {d, e} for the values ``sig`` via
    inverse iteration on the Golub-Kahan tridiagonal, all lanes at once.

    Returns ``(U_b, V_b)`` with ``bidiag(d, e) @ V_b ~= U_b * sig``.
    """
    n = d.shape[0]
    N = 2 * n
    dtype = d.dtype
    z = jnp.zeros((N - 1,), dtype).at[0::2].set(d).at[1::2].set(e)
    pert = jnp.asarray(float(jnp.finfo(dtype).tiny) ** 0.5, dtype)
    lam = sig

    def solve(rhs):
        """(TGK - diag-per-lane(lam)) x = rhs; tridiagonal LU with partial
        pivoting, band-2 upper factor; lanes vectorized."""
        U0 = jnp.zeros((N, n), dtype)
        U1 = jnp.zeros((N, n), dtype)
        U2 = jnp.zeros((N, n), dtype)
        b0 = -lam
        c0 = jnp.broadcast_to(z[0], (n,)).astype(dtype)

        def fwd(i, carry):
            b, cc, dd, y, rhs_, U0, U1, U2 = carry
            ai = z[i - 1]
            bi = -lam
            ci = jnp.where(i < N - 1, z[jnp.minimum(i, N - 2)], jnp.zeros((), dtype))
            yi = rhs_[i]
            swap = jnp.abs(ai) > jnp.abs(b)
            p0 = jnp.where(swap, ai, b)
            p1 = jnp.where(swap, bi, cc)
            p2 = jnp.where(swap, ci, dd)
            py = jnp.where(swap, yi, y)
            q0 = jnp.where(swap, b, ai)
            q1 = jnp.where(swap, cc, bi)
            q2 = jnp.where(swap, dd, ci)
            qy = jnp.where(swap, y, yi)
            safe = jnp.where(p0 == 0, pert, p0)
            mlt = q0 / safe
            U0 = U0.at[i - 1].set(safe)
            U1 = U1.at[i - 1].set(p1)
            U2 = U2.at[i - 1].set(p2)
            rhs_ = rhs_.at[i - 1].set(py)
            return (
                q1 - mlt * p1,
                q2 - mlt * p2,
                jnp.zeros((n,), dtype),
                qy - mlt * py,
                rhs_,
                U0,
                U1,
                U2,
            )

        carry = (b0, c0, jnp.zeros((n,), dtype), rhs[0], rhs, U0, U1, U2)
        b, cc, dd, y, rhs_, U0, U1, U2 = lax.fori_loop(1, N, fwd, carry)
        U0 = U0.at[N - 1].set(jnp.where(b == 0, pert, b))
        rhs_ = rhs_.at[N - 1].set(y)

        def bwd(k, sol):
            i = N - 1 - k
            s1 = jnp.where(i + 1 < N, sol[jnp.minimum(i + 1, N - 1)], 0.0)
            s2 = jnp.where(i + 2 < N, sol[jnp.minimum(i + 2, N - 1)], 0.0)
            v = (rhs_[i] - U1[i] * s1 - U2[i] * s2) / U0[i]
            return sol.at[i].set(v)

        return lax.fori_loop(0, N, bwd, jnp.zeros((N, n), dtype))

    x = jax.random.normal(jax.random.PRNGKey(0), (N, n), dtype)

    def it(_, x):
        x = solve(x)
        # near-singular solves reach ~1/sqrt(tiny); scale by the max first
        # so the norm's squares cannot overflow fp32
        mx = jnp.maximum(
            jnp.max(jnp.abs(x), axis=0, keepdims=True),
            jnp.asarray(jnp.finfo(dtype).tiny, dtype),
        )
        x = x / mx
        return x / jnp.linalg.norm(x, axis=0, keepdims=True)

    x = lax.fori_loop(0, int(iters), it, x)
    sqrt2 = jnp.sqrt(jnp.asarray(2.0, dtype))
    return x[1::2] * sqrt2, x[0::2] * sqrt2  # (U_b, V_b)


def bidiagonal_svd(d, e):
    """Full SVD of the bidiagonal {d, e}: returns (U_b, sig, V_b)."""
    sig = bisect_svdvals(d, e)
    U_b, V_b = tgk_vectors(d, e, sig)
    return U_b, sig, V_b


def svd(A, panel=32):
    """Full (thin) singular value decomposition of ``A``.

    Returns ``(U, s, Vh)`` with ``A ~= U @ diag(s) @ Vh``, s descending;
    for m x n input, U is (m, k) and Vh (k, n) with k = min(m, n).
    One-stage blocked reduction with accumulated factors + TGK inverse
    iteration for the bidiagonal vectors.  No reference counterpart (the
    reference computes singular values only).  Rectangular inputs reduce to
    the square triangular factor by a one-sided QR first.
    """
    m, n = A.shape
    if m != n:
        if m < n:
            U, s, Vh = svd(A.T, panel=panel)
            return Vh.T, s, U.T
        Q, R = jnp.linalg.qr(A, mode="reduced")  # (m, n), (n, n)
        Ur, s, Vh = svd(R, panel=panel)
        return pdot(Q, Ur), s, Vh
    d, e, Ug, Vg = bidiagonalize_blocked_uv(A, panel=panel)
    U_b, s, V_b = bidiagonal_svd(d, e)
    U = pdot(Ug, U_b)
    V = pdot(Vg, V_b)
    return U, s, V.T
