"""Successive band reduction (models/sbr.py): structure, spectrum, and
composition with the scalar chase.

Oracle strategy mirrors the reference's cross-implementation testing
(SURVEY.md §4): the SBR path must agree with the established scalar chase
(two_stage.band_to_bidiagonal) and with LAPACK on the spectrum.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from svdsolver_tpu.models.sbr import band_reduce_width, band_to_bidiagonal_sbr
from svdsolver_tpu.models.two_stage import dense_to_band, band_to_bidiagonal


def _band_matrix(rng, n, b, dtype=np.float64):
    A = rng.normal(size=(n, n)).astype(dtype)
    i, j = np.indices((n, n), sparse=True)
    A *= ((j - i >= 0) & (j - i <= b)).astype(dtype)
    return A


@pytest.mark.parametrize(
    "n,b1,b2,nb",
    [
        (32, 8, 3, 3),
        (48, 12, 4, 4),
        (40, 8, 2, 2),
        (37, 10, 5, 3),  # nb < b2, n not a multiple of anything
        (96, 16, 8, 8),
    ],
)
def test_band_reduce_width_structure_and_spectrum(rng, n, b1, b2, nb):
    A = _band_matrix(rng, n, b1)
    Am = np.asarray(band_reduce_width(jnp.asarray(A), b1=b1, b2=b2, nb=nb))
    i, j = np.indices((n, n), sparse=True)
    # exact band structure: zeros below the diagonal and beyond b2
    assert np.abs(Am[(j - i < 0)]).max() == 0.0
    assert np.abs(Am[(j - i > b2)]).max() == 0.0
    s0 = np.linalg.svd(A, compute_uv=False)
    s1 = np.linalg.svd(Am, compute_uv=False)
    assert np.max(np.abs(s1 - s0)) / s0[0] < 1e-12


def test_band_to_bidiagonal_sbr_matches_scalar_chase(rng):
    n, b1, b2 = 64, 16, 4
    A = _band_matrix(rng, n, b1)
    d, e = (np.asarray(x) for x in band_to_bidiagonal_sbr(
        jnp.asarray(A), band=b1, mid=b2))
    s = np.linalg.svd(np.diag(d) + np.diag(e, 1), compute_uv=False)
    d0, e0 = (np.asarray(x) for x in band_to_bidiagonal(
        jnp.asarray(A), band=b1))
    s0 = np.linalg.svd(np.diag(d0) + np.diag(e0, 1), compute_uv=False)
    assert np.max(np.abs(s - s0)) / s0[0] < 1e-12


def test_sbr_full_pipeline_vs_lapack(rng):
    n, band, mid = 96, 16, 8
    A = rng.normal(size=(n, n))
    Ab = dense_to_band(jnp.asarray(A), band=band)
    d, e = (np.asarray(x) for x in band_to_bidiagonal_sbr(
        Ab, band=band, mid=mid))
    s = np.linalg.svd(np.diag(d) + np.diag(e, 1), compute_uv=False)
    ref = np.linalg.svd(A, compute_uv=False)
    assert np.max(np.abs(s - ref)) / ref[0] < 1e-12


def test_band_reduce_width_validation(rng):
    A = jnp.asarray(_band_matrix(rng, 16, 4))
    with pytest.raises(ValueError):
        band_reduce_width(A, b1=4, b2=4)
    with pytest.raises(ValueError):
        band_reduce_width(A, b1=4, b2=2, nb=3)  # nb > b2
    with pytest.raises(ValueError):
        band_reduce_width(jnp.zeros((4, 5)), b1=2, b2=1)
