"""SVD applications: pseudo-inverse, least squares, rank, condition number,
spectral norm, best low-rank approximation.

No reference counterpart (the reference stops at singular values —
svd_serial.h:368 ``qrd`` is its last pipeline stage); these are the standard
consumers of an SVD that make the solver usable as a framework.  Everything
routes through the flagship two-stage pipeline (:func:`svdsolver_tpu.svd` /
:func:`svdsolver_tpu.svdvals`), so the hot FLOPs land on the MXU.
"""

import jax.numpy as jnp

from svdsolver_tpu.models.svd import svdvals
from svdsolver_tpu.models.vectors import svd, svds
from svdsolver_tpu.ops.precision import pdot


def _default_rtol(A, s0=None):
    """LAPACK-gelsd-style default relative cutoff: max(m, n) * eps."""
    return max(A.shape) * float(jnp.finfo(A.dtype).eps)


def pinv(A, rtol=None, method="tpu2"):
    """Moore-Penrose pseudo-inverse via the two-stage SVD.

    Singular values below ``rtol * sigma_max`` (default ``max(m,n)*eps``)
    are treated as zero, exactly as ``numpy.linalg.pinv``.
    """
    if rtol is None:
        rtol = _default_rtol(A)
    U, s, Vh = svd(A, method=method)
    cutoff = rtol * s[0]
    sinv = jnp.where(s > cutoff, 1.0 / jnp.where(s > cutoff, s, 1.0), 0.0)
    return pdot(Vh.T * sinv[None, :], U.T)


def lstsq(A, b, rtol=None, method="tpu2"):
    """Minimum-norm least-squares solution of ``A x ~= b`` via the SVD.

    ``b`` may be a vector (m,) or a block of right-hand sides (m, nrhs).
    Returns ``(x, resid_norm, rank)`` — the solution, the Euclidean residual
    norm per right-hand side, and the numerical rank used.
    """
    if rtol is None:
        rtol = _default_rtol(A)
    vec = b.ndim == 1
    B = b[:, None] if vec else b
    U, s, Vh = svd(A, method=method)
    cutoff = rtol * s[0]
    keep = s > cutoff
    sinv = jnp.where(keep, 1.0 / jnp.where(keep, s, 1.0), 0.0)
    x = pdot(Vh.T, sinv[:, None] * pdot(U.T, B))
    r = pdot(A, x) - B
    resid = jnp.sqrt(jnp.sum(r * r, axis=0))
    rank = jnp.sum(keep)
    if vec:
        return x[:, 0], resid[0], rank
    return x, resid, rank


def matrix_rank(A, rtol=None):
    """Numerical rank: number of singular values above ``rtol * sigma_max``."""
    if rtol is None:
        rtol = _default_rtol(A)
    if A.ndim != 2:
        raise ValueError("matrix_rank expects a 2-D array")
    m, n = A.shape
    if m != n:  # svdvals expects square; reduce via the Gram-free fold
        if m < n:
            return matrix_rank(A.T, rtol=rtol)
        A = jnp.linalg.qr(A, mode="r")
    s = svdvals(A)
    return jnp.sum(s > rtol * s[0])


def cond(A):
    """Spectral condition number sigma_max / sigma_min."""
    if A.ndim != 2 or A.shape[0] != A.shape[1]:
        raise ValueError("cond expects a square matrix")
    s = svdvals(A)
    return s[0] / s[-1]


def norm2(A):
    """Spectral norm (largest singular value)."""
    if A.ndim != 2:
        raise ValueError("norm2 expects a 2-D array")
    m, n = A.shape
    if m != n:
        if m < n:
            return norm2(A.T)
        A = jnp.linalg.qr(A, mode="r")
    return svdvals(A)[0]


def lowrank(A, k, band=None):
    """Best rank-``k`` approximation factors (Eckart-Young).

    Returns ``(L, R)`` with ``A ~= L @ R``, L (m, k), R (k, n) — the
    truncated SVD with the singular values folded into ``L``.
    """
    U, s, Vh = svds(A, k, band=band)
    return U * s[None, :], Vh
