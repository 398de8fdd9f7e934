"""Differential tests for the Pallas device-resident kernels.

These run only on a real TPU backend (the kernels are fp32/TPU-only); on CPU
runs they skip.  Oracle: the XLA implementations of the same math.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

if jax.default_backend() != "tpu":
    pytest.skip("Pallas TPU kernels need a TPU backend", allow_module_level=True)

from svdsolver_tpu.models.two_stage import dense_to_band, band_to_bidiagonal
from svdsolver_tpu.models.diagonalize import bisect_svdvals
from svdsolver_tpu.ops.pallas.band_chase import band_to_bidiagonal_pallas
from svdsolver_tpu.ops.pallas.bisect import bisect_svdvals_pallas


@pytest.mark.parametrize("n,b", [(64, 8), (96, 16)])
def test_pallas_chase_sigma(rng, n, b):
    A = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))
    Ab = dense_to_band(A, band=b)
    d, e = band_to_bidiagonal_pallas(Ab, band=b)
    B = np.diag(np.asarray(d)) + np.diag(np.asarray(e), 1)
    want = np.linalg.svd(np.asarray(A).astype(np.float64), compute_uv=False)
    got = np.linalg.svd(B.astype(np.float64), compute_uv=False)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-5 * want[0])


def test_pallas_chase_matches_xla_leading(rng):
    # elementwise agreement up to fp32 rounding drift on the leading entries
    n, b = 64, 8
    A = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))
    Ab = dense_to_band(A, band=b)
    d1, e1 = band_to_bidiagonal(Ab, band=b)
    d2, e2 = band_to_bidiagonal_pallas(Ab, band=b)
    np.testing.assert_allclose(
        np.abs(np.asarray(d1))[:8], np.abs(np.asarray(d2))[:8], rtol=1e-4
    )


def test_pallas_chase_wavefront_sigma(rng):
    n, b = 96, 16
    A = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))
    Ab = dense_to_band(A, band=b)
    d, e = band_to_bidiagonal_pallas(Ab, band=b, wavefront=True)
    B = np.diag(np.asarray(d)) + np.diag(np.asarray(e), 1)
    want = np.linalg.svd(np.asarray(A).astype(np.float64), compute_uv=False)
    got = np.linalg.svd(B.astype(np.float64), compute_uv=False)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-5 * want[0])


def test_pallas_chase_rejects_bad_band(rng):
    A = jnp.asarray(rng.normal(size=(20, 20)).astype(np.float32))
    with pytest.raises(ValueError):
        band_to_bidiagonal_pallas(A, band=5)


@pytest.mark.parametrize("n", [8, 64, 200])
def test_pallas_bisect_matches_xla(rng, n):
    d = jnp.asarray(rng.normal(size=n).astype(np.float32))
    e = jnp.asarray(rng.normal(size=n - 1).astype(np.float32))
    s_ref = np.asarray(bisect_svdvals(d, e))
    s = np.asarray(bisect_svdvals_pallas(d, e))
    # The Pallas kernel counts pivots via a twisted (two-ended)
    # factorization; its count function transitions within an fp32 ulp of
    # the XLA one-sided count's (both are valid inertias), so each lane
    # converges to a boundary up to ~ulp(sigma) away.
    np.testing.assert_allclose(
        s, s_ref, rtol=1e-6, atol=float(np.max(np.abs(s_ref))) * 1e-7
    )
    # and both agree with LAPACK
    B = np.diag(np.asarray(d, np.float64)) + np.diag(np.asarray(e, np.float64), 1)
    want = np.linalg.svd(B, compute_uv=False)
    np.testing.assert_allclose(s, want, rtol=2e-5, atol=1e-5 * want[0])


def test_pallas_panel_qr_matches_xla(rng):
    from svdsolver_tpu.ops.pallas.panel_qr import panel_qr_pallas
    from svdsolver_tpu.ops.householder import householder_vector

    m, b, roff = 32, 8, 4
    A = jnp.asarray(rng.normal(size=(m, b)).astype(np.float32))
    P = A
    V = jnp.zeros((m, b), jnp.float32)
    T = jnp.zeros((b, b), jnp.float32)
    ridx = jnp.arange(m)
    for j in range(b):
        p = roff + j
        v, tau, beta = householder_vector(P[:, j], p)
        P = P - tau * jnp.outer(v, v @ P)
        colj = jnp.where(ridx > p, 0.0, P[:, j]).at[p].set(beta)
        P = P.at[:, j].set(colj)
        w = V.T @ v
        T = T.at[:, j].set(-tau * (T @ w)).at[j, j].set(tau)
        V = V.at[:, j].set(v)
    Rt, Vt, Tt = panel_qr_pallas(A.T, roff, b)
    np.testing.assert_allclose(np.asarray(Rt.T), np.asarray(P), atol=2e-5)
    np.testing.assert_allclose(np.asarray(Vt.T), np.asarray(V), atol=2e-6)
    np.testing.assert_allclose(np.asarray(Tt.T), np.asarray(T), atol=2e-6)


@pytest.mark.parametrize("n,b", [(64, 8), (96, 16)])
def test_pallas_dense_to_band(rng, n, b):
    from svdsolver_tpu.ops.pallas.panel_qr import dense_to_band_pallas

    A = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))
    Ab = np.asarray(dense_to_band_pallas(A, band=b))
    i, j = np.ogrid[:n, :n]
    outside = (j - i < 0) | (j - i > b)
    np.testing.assert_allclose(Ab[outside], 0, atol=1e-6)
    want = np.linalg.svd(np.asarray(A).astype(np.float64), compute_uv=False)
    got = np.linalg.svd(Ab.astype(np.float64), compute_uv=False)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-5 * want[0])


def test_pallas_end_to_end_svdvals(rng):
    from svdsolver_tpu.models.svd import svdvals

    n = 64
    A = jnp.asarray(rng.uniform(0, 5, (n, n)).astype(np.float32))
    want = np.linalg.svd(np.asarray(A).astype(np.float64), compute_uv=False)
    got = np.asarray(svdvals(A, method="tpu2", block=16))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-5 * want[0])


def test_pallas_chase_pipelined_bitwise(rng):
    n, b = 256, 128
    A = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))
    Ab = dense_to_band(A, band=b)
    d1, e1 = band_to_bidiagonal_pallas(Ab, band=b, pipelined=False)
    d2, e2 = band_to_bidiagonal_pallas(Ab, band=b, pipelined=True)
    # identical arithmetic/schedule; allclose (not bitwise) because the two
    # programs may be served by different compiler generations (cache)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), rtol=1e-6, atol=1e-7)


def test_pallas_chase_mega_matches_sequential(rng):
    n, b = 512, 128
    A = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))
    Ab = dense_to_band(A, band=b)
    d1, e1 = band_to_bidiagonal_pallas(Ab, band=b, mega=False)
    d2, e2 = band_to_bidiagonal_pallas(Ab, band=b, mega=True, khops=2)
    # identical arithmetic/schedule; allclose (not bitwise) across programs
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), rtol=1e-6, atol=1e-7)


def test_pallas_chase_sigma_large_band(rng):
    # flagship geometry: band=128 at n >= 1024 (VERDICT round-1 gap)
    from svdsolver_tpu.ops.pallas.panel_qr import dense_to_band_pallas

    n, b = 1024, 128
    A = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))
    Ab = dense_to_band_pallas(A, band=b)
    d, e = band_to_bidiagonal_pallas(Ab, band=b)
    s = np.asarray(bisect_svdvals_pallas(d, e))
    want = np.linalg.svd(np.asarray(A).astype(np.float64), compute_uv=False)
    np.testing.assert_allclose(s, want, rtol=2e-5, atol=1e-5 * want[0])


def test_pallas_chase_accum_matches_plain_and_factorizes(rng):
    # reflector-recording chase: (d, e) must match the plain kernel exactly
    # (same arithmetic) and the recorded reflectors must reproduce the band
    # factorization Ab = L @ B @ R^T with orthogonal L.
    from svdsolver_tpu.ops.pallas.band_chase import (
        band_to_bidiagonal_pallas_accum,
    )
    from svdsolver_tpu.models.vectors import _apply_chase_reflectors

    n, b = 384, 64
    A = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))
    Ab = dense_to_band(A, band=b)
    d0, e0 = band_to_bidiagonal_pallas(Ab, band=b)
    d, e, VL, TL, VR, TR = band_to_bidiagonal_pallas_accum(Ab, band=b)
    np.testing.assert_allclose(np.asarray(d), np.asarray(d0), rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(e), np.asarray(e0), rtol=1e-6, atol=1e-7)
    I = jnp.eye(n, dtype=jnp.float32)
    L = np.asarray(_apply_chase_reflectors(VL, TL, I, b, reverse=True))
    R = np.asarray(_apply_chase_reflectors(VR, TR, I, b, reverse=True))
    B = np.diag(np.asarray(d)) + np.diag(np.asarray(e), 1)
    nrm = np.abs(np.asarray(Ab)).max()
    assert np.abs(L @ B @ R.T - np.asarray(Ab)).max() / nrm < 1e-5
    assert np.abs(L.T @ L - np.eye(n)).max() < 1e-5


def test_pallas_chase_vmem_matches_spectrum(rng):
    # packed VMEM-resident chase variant: same schedule, different reduction
    # widths -> d/e differ elementwise (chaotic rounding), but the spectrum
    # must match LAPACK like the default kernel's does.
    from svdsolver_tpu.ops.pallas.band_chase_vmem import (
        band_to_bidiagonal_pallas_vmem,
        vmem_chase_supported,
    )

    n, b = 384, 64
    assert vmem_chase_supported(n, b)
    A = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))
    Ab = dense_to_band(A, band=b)
    d, e = band_to_bidiagonal_pallas_vmem(Ab, band=b)
    s = np.asarray(bisect_svdvals_pallas(d, e))
    want = np.linalg.svd(np.asarray(A).astype(np.float64), compute_uv=False)
    np.testing.assert_allclose(s, want, rtol=2e-5, atol=1e-5 * want[0])


@pytest.mark.parametrize(
    "n,b", [(384, 64), (640, 128), (200, 8), (4480, 128), (6400, 128)]
)
def test_pallas_chase_stream_bitwise_vs_vmem(rng, n, b):
    # two-phase packed chase: same schedule and shared elimination kernels
    # as the VMEM-resident variant (phase B runs them through the wavefront
    # tick), only the window streaming differs -> d/e must be BITWISE
    # identical to it (and hence spectrum-correct).  n=6400 crosses the
    # phase-A/phase-B split (R0=128: streamed sweeps, window-0 prefetch,
    # then the wavefront-resident tail); (200, 8) runs the b < 32
    # sequential-tail fallback; the rest run pure wavefront phase B.
    from svdsolver_tpu.ops.pallas.band_chase_stream import (
        band_to_bidiagonal_pallas_stream,
        stream_chase_supported,
    )
    from svdsolver_tpu.ops.pallas.band_chase_vmem import (
        band_to_bidiagonal_pallas_vmem,
    )

    assert stream_chase_supported(n, b)
    A = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))
    Ab = dense_to_band(A, band=b)
    d1, e1 = band_to_bidiagonal_pallas_vmem(Ab, band=b)
    d2, e2 = band_to_bidiagonal_pallas_stream(Ab, band=b)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))
    if n > 4480:
        return  # bitwise agreement is the point; skip the slow host SVD
    B = np.diag(np.asarray(d2)) + np.diag(np.asarray(e2), 1)
    want = np.linalg.svd(np.asarray(A).astype(np.float64), compute_uv=False)
    got = np.linalg.svd(B.astype(np.float64), compute_uv=False)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-5 * want[0])


def test_pallas_chase_wave_accum(rng):
    # recording wavefront chase: d/e bitwise vs the plain wave kernel, and
    # the records must reconstruct Ab = L B R^T with orthogonal L, R
    # (applied via the independent rank-1 code path).
    from svdsolver_tpu.ops.pallas.band_chase_wave import (
        band_to_bidiagonal_pallas_wave,
        band_to_bidiagonal_pallas_wave_accum,
        wave_chase_accum_supported,
    )
    from svdsolver_tpu.models.vectors import _apply_chase_reflectors

    n, b = 512, 128
    assert wave_chase_accum_supported(n, b)
    A = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))
    Ab = dense_to_band(A, band=b)
    d0, e0 = band_to_bidiagonal_pallas_wave(Ab, band=b)
    d, e, VL, TL, VR, TR = band_to_bidiagonal_pallas_wave_accum(Ab, band=b)
    np.testing.assert_array_equal(np.asarray(d0), np.asarray(d))
    np.testing.assert_array_equal(np.asarray(e0), np.asarray(e))
    B = np.diag(np.asarray(d)) + np.diag(np.asarray(e), 1)
    eye = jnp.eye(n, dtype=A.dtype)
    L = np.asarray(_apply_chase_reflectors(VL, TL, eye, b, reverse=True))
    R = np.asarray(_apply_chase_reflectors(VR, TR, eye, b, reverse=True))
    assert np.abs(L.T @ L - np.eye(n)).max() < 1e-5
    assert np.abs(R.T @ R - np.eye(n)).max() < 1e-5
    nrm = np.abs(np.asarray(Ab)).max()
    assert np.abs(L @ B @ R.T - np.asarray(Ab)).max() / nrm < 1e-5


def test_pallas_dense_to_band_uv(rng):
    # Pallas-panel Stage I with factor accumulation: A = U1 Ab V1^T with
    # orthogonal U1/V1 and Ab matching the XLA uv path's band form.
    from svdsolver_tpu.ops.pallas.panel_qr import dense_to_band_uv_pallas

    n, b = 256, 64
    A = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))
    Ab, U1, V1 = (
        np.asarray(x) for x in dense_to_band_uv_pallas(A, band=b)
    )
    An = np.asarray(A)
    assert np.abs(U1.T @ U1 - np.eye(n)).max() < 1e-5
    assert np.abs(V1.T @ V1 - np.eye(n)).max() < 1e-5
    nrm = np.abs(An).max()
    assert np.abs(U1 @ Ab @ V1.T - An).max() / nrm < 1e-5
    # band structure: zero below diag and beyond band above
    assert np.abs(np.tril(Ab, -1)).max() < 1e-4 * nrm
    assert np.abs(np.triu(Ab, b + 1)).max() < 1e-4 * nrm


def test_pallas_dense_to_band_rec(rng):
    # The recording Pallas Stage I (production fp32 svd path) is the same
    # factorization as the eager uv kernel: identical band output and the
    # backward-applied records rebuild the same U1/V1 (fp32 eps class).
    from svdsolver_tpu.models.vectors import _apply_stage1_reflectors_pair
    from svdsolver_tpu.ops.pallas.panel_qr import (
        dense_to_band_rec_pallas,
        dense_to_band_uv_pallas,
    )

    n, b = 256, 64
    A = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))
    Ab_u, U1, V1 = (np.asarray(x) for x in dense_to_band_uv_pallas(A, band=b))
    Ab_r, Vq, Tq, Vl, Tl = dense_to_band_rec_pallas(A, band=b)
    np.testing.assert_allclose(
        np.asarray(Ab_r), Ab_u, rtol=0, atol=1e-5 * np.abs(Ab_u).max()
    )
    eye = jnp.eye(n, dtype=A.dtype)
    U1r, V1r = _apply_stage1_reflectors_pair(Vq, Tq, Vl, Tl, eye, eye)
    U1r, V1r = np.asarray(U1r), np.asarray(V1r)
    assert np.abs(U1r.T @ U1r - np.eye(n)).max() < 1e-5
    assert np.abs(V1r.T @ V1r - np.eye(n)).max() < 1e-5
    np.testing.assert_allclose(U1r, U1, rtol=0, atol=1e-4)
    np.testing.assert_allclose(V1r, V1, rtol=0, atol=1e-4)


@pytest.mark.parametrize(
    "n,b", [(384, 64), (640, 128), (192, 32), (520, 40), (5504, 128)]
)
def test_pallas_chase_wave_bitwise_vs_vmem(rng, n, b):
    # wavefront-batched chase: the pipelined-sweep schedule (3-tick spacing,
    # disjoint lanes) with larfg construction batched across lanes.  Lanes
    # operate on disjoint slabs and the reductions are per-lane, so d/e must
    # be BITWISE identical to the sequential VMEM kernel.  (520, 40) covers
    # non-128-aligned n and a non-power-of-two band; 640/128 runs 2 lanes;
    # (5504, 128) lands in the residency range only reachable at the packed
    # width D=512 (it would overflow VMEM at the round-2 width 640).
    from svdsolver_tpu.ops.pallas.band_chase_wave import (
        band_to_bidiagonal_pallas_wave,
        wave_chase_supported,
    )
    from svdsolver_tpu.ops.pallas.band_chase_vmem import (
        band_to_bidiagonal_pallas_vmem,
    )

    assert wave_chase_supported(n, b)
    A = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))
    Ab = dense_to_band(A, band=b)
    d1, e1 = band_to_bidiagonal_pallas_vmem(Ab, band=b)
    d2, e2 = band_to_bidiagonal_pallas_wave(Ab, band=b)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))
    if n > 1024:
        return  # bitwise agreement is the point; skip the slow host SVD
    B = np.diag(np.asarray(d2)) + np.diag(np.asarray(e2), 1)
    want = np.linalg.svd(np.asarray(A).astype(np.float64), compute_uv=False)
    got = np.linalg.svd(B.astype(np.float64), compute_uv=False)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-5 * want[0])


@pytest.mark.parametrize("n", [512, 1280])
def test_pallas_tgk_solve_matches_xla(rng, n):
    # single-launch shifted tridiagonal solve (inverse-iteration inner loop):
    # identical pivoting decisions and arithmetic order as the XLA scan, so
    # the normalized solutions must agree to fp32 roundoff even though the
    # raw solutions are near-singular amplifications.  1280 exercises lane
    # padding (1280 % 1024 != 0) and row padding (2560 % 128 == 0 but the
    # spurious-row patch block), 512 the aligned path.
    from svdsolver_tpu.models.vectors import tgk_solve_xla
    from svdsolver_tpu.ops.pallas.tridiag_solve import tgk_solve_pallas

    N = 2 * n
    d = rng.normal(size=(n,)).astype(np.float32) * 5
    e = rng.normal(size=(n - 1,)).astype(np.float32) * 5
    z = np.zeros((N - 1,), np.float32)
    z[0::2] = d
    z[1::2] = e
    B = np.diag(d) + np.diag(e, 1)
    sig = np.linalg.svd(B, compute_uv=False).astype(np.float32)
    eps = np.finfo(np.float32).eps
    smax = float(np.abs(sig).max())
    pivmin = jnp.float32(max(smax * eps * eps, np.finfo(np.float32).tiny))
    big = jnp.float32(float(np.finfo(np.float32).max) ** 0.5 / 16.0)
    rhs = jnp.asarray(rng.normal(size=(N, n)).astype(np.float32))
    zj, lam = jnp.asarray(z), jnp.asarray(sig)
    xs = np.asarray(tgk_solve_xla(zj, lam, rhs, pivmin, big))
    xp = np.asarray(tgk_solve_pallas(zj, lam, rhs, pivmin, big))
    xs = xs / np.linalg.norm(xs, axis=0)
    xp = xp / np.linalg.norm(xp, axis=0)
    assert np.abs(xs - xp).max() < 64 * eps


def test_pallas_chase_stream_accum(rng):
    # recording streamed chase (past the wave kernel's VMEM residency):
    # d/e bitwise vs the plain streamed kernel (same schedule; only the
    # window geometry and the record stores differ), and the records must
    # reconstruct Ab = L B R^T with orthogonal L, R via the production
    # compact-WY back-transform.  n=6656 exercises BOTH phases of the
    # W_REC=2560 recording geometry (R0=1920 grouped streamed sweeps +
    # 4736-row resident tail).
    from svdsolver_tpu.ops.pallas.band_chase_stream import (
        band_to_bidiagonal_pallas_stream,
        band_to_bidiagonal_pallas_stream_accum,
        stream_chase_accum_preferred,
        _stream_accum_params,
    )
    from svdsolver_tpu.ops.pallas.band_chase_wave import (
        wave_chase_accum_supported,
    )
    from svdsolver_tpu.models.vectors import _apply_chase_reflectors_wy
    from svdsolver_tpu.ops.precision import pdot

    n, b = 6656, 128
    assert stream_chase_accum_preferred(n, b)
    assert not wave_chase_accum_supported(n, b)  # this kernel's routing slot
    assert _stream_accum_params(n, b)[1] > 0  # R0 > 0: phase A exercised
    A = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))
    Ab = dense_to_band(A, band=b)
    d0, e0 = band_to_bidiagonal_pallas_stream(Ab, band=b)
    d, e, VL, TL, VR, TR = band_to_bidiagonal_pallas_stream_accum(Ab, band=b)
    np.testing.assert_array_equal(np.asarray(d0), np.asarray(d))
    np.testing.assert_array_equal(np.asarray(e0), np.asarray(e))
    eye = jnp.eye(n, dtype=A.dtype)
    L = _apply_chase_reflectors_wy(VL, TL, eye, b)
    R = _apply_chase_reflectors_wy(VR, TR, eye, b)
    B = jnp.diag(d) + jnp.diag(e, 1)
    orthL = float(jnp.abs(pdot(L.T, L) - eye).max())
    orthR = float(jnp.abs(pdot(R.T, R) - eye).max())
    assert orthL < 2e-4 and orthR < 2e-4
    recon = pdot(pdot(L, B), R.T)
    nrm = float(jnp.abs(Ab).max())
    assert float(jnp.abs(recon - Ab).max()) / nrm < 2e-4


def test_pallas_bisect_multisection_probes(rng):
    # probes > 1 (multisection) must match the probes=1 bisection brackets
    # to bracket-width accuracy; exercises the segment-sum / exact-endpoint
    # logic that probes=1 never touches
    import pytest
    from svdsolver_tpu.ops.pallas.bisect import bisect_svdvals_pallas

    if jax.default_backend() != "tpu":
        pytest.skip("Pallas TPU kernel")
    n = 200
    d = jnp.asarray(rng.uniform(0.5, 5, n).astype(np.float32))
    e = jnp.asarray(rng.uniform(0.5, 5, n - 1).astype(np.float32))
    ref = np.linalg.svd(
        np.diag(np.asarray(d, np.float64))
        + np.diag(np.asarray(e, np.float64), 1),
        compute_uv=False,
    )
    for k in (3, 7):
        s = np.asarray(bisect_svdvals_pallas(d, e, probes=k))
        assert np.max(np.abs(s - ref)) / ref[0] < 1e-5, k
    with pytest.raises(ValueError):
        bisect_svdvals_pallas(d, e, probes=0)
