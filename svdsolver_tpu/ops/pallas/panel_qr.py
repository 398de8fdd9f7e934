"""Pallas kernel: compact-WY panel QR factorization.

Stage I's inner loop — b sequential Householder columns per panel — is the
serial bottleneck the reference's CUDA-2 attacked by keeping tau device-side
(hh_kernel, svd_cuda_2.cu:220).  Here the *entire* panel factorization runs
in one kernel: the panel lives transposed in VMEM (columns = buffer rows, so
the sequential column loop indexes the sublane axis), reflectors/taus never
leave the chip, and the compact-WY T factor accumulates in VMEM alongside.

Outputs (R, V, T) feed the XLA trailing update
``A <- A - V T^T (V^T A)`` (MXU GEMMs) exactly as the XLA panel path does —
differential-tested against models/two_stage._panel_qr_step.
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dot(a, b):
    return jnp.matmul(
        a, b, precision=lax.Precision.HIGHEST, preferred_element_type=a.dtype
    )


def _panel_kernel(b, m, roff_ref, Pt_in, Rt, Vt, Tt):
    """Factor the (b, m) transposed panel: column j of the panel is buffer
    row j; its pivot sits at lane ``roff + j``.

    Rt doubles as the working panel buffer (finalized in place); Vt holds
    the transposed reflectors; Tt is T^T (larft accumulated transposed so
    per-column writes are row writes).  Row extraction and the Vt row write
    use 8-aligned (8, m) blocks — the only dynamic sublane offsets Mosaic
    accepts — with an 8-row mask select, keeping per-column traffic at
    ~3 full-panel passes.
    """
    dtype = Pt_in.dtype
    one = jnp.ones((), dtype)
    zero = jnp.zeros((), dtype)
    roff = roff_ref[0, 0]
    rows = lax.broadcasted_iota(jnp.int32, (b, 1), 0)
    rows8 = lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    cols = lax.broadcasted_iota(jnp.int32, (1, m), 1)
    bcols = lax.broadcasted_iota(jnp.int32, (1, b), 1)

    Rt[:] = Pt_in[:]  # working copy of the panel (becomes R)
    Vt[:] = jnp.zeros((b, m), dtype)
    Tt[:] = jnp.zeros((b, b), dtype)

    def col(j, carry):
        # extract panel column j (buffer row j) from its aligned 8-row block
        j8 = pl.multiple_of((j // 8) * 8, 8)
        blk = Rt[pl.ds(j8, 8), :]
        x = jnp.sum(
            jnp.where(rows8 == j - j8, blk, zero), axis=0, keepdims=True
        )  # (1, m)
        p = roff + j
        tail = cols > p
        xt = jnp.where(tail, x, zero)
        pivot = jnp.sum(jnp.where(cols == p, x, zero))
        sigma2 = jnp.sum(xt * xt)
        norm = jnp.sqrt(pivot * pivot + sigma2)
        sign = jnp.where(pivot >= 0, one, -one)
        beta = -sign * norm
        trivial = sigma2 == 0
        denom = jnp.where(trivial, one, pivot - beta)
        v = jnp.where(tail, xt / denom, zero) + jnp.where(cols == p, one, zero)
        safe_beta = jnp.where(beta == 0, one, beta)
        tau = jnp.where(trivial, zero, (beta - pivot) / safe_beta)
        # apply H to the whole panel: finished rows (< j) have zeros in v's
        # support so they are no-ops, and row j finalizes to its R row.
        # Matvec + rank-1 as VPU broadcast-reductions — exact fp32 in one
        # pass each, where the MXU route costs 6 bf16 passes per contraction
        # (HIGHEST) and pads K=1 to a full tile.
        u = jnp.sum(Rt[:] * v, axis=1, keepdims=True)  # (b, 1)
        Rt[:] = Rt[:] - (tau * u) * v
        # larft (transposed): Tt[j, :] = -tau * w^T Tt + tau * e_j
        w = jnp.sum(Vt[:] * v, axis=1, keepdims=True)  # (b, 1); rows >= j zero
        t_row = -tau * jnp.sum(w * Tt[:], axis=0, keepdims=True) + jnp.where(
            bcols == j, tau, zero
        )
        Tt[:] = jnp.where(rows == j, t_row, Tt[:])
        # Vt row j write via its aligned 8-row block
        vblk = Vt[pl.ds(j8, 8), :]
        Vt[pl.ds(j8, 8), :] = jnp.where(rows8 == j - j8, v, vblk)
        return carry

    lax.fori_loop(jnp.int32(0), jnp.int32(b), col, 0, unroll=4)
    # R: the fully-applied panel with exact zeros beyond each pivot
    Rt[:] = jnp.where(cols > roff + rows, zero, Rt[:])


def panel_qr_pallas(A_panel_t, r_off, band):
    """Factor a transposed panel (b, m); returns (R_t, V_t, T_t).

    ``A_panel_t[j]`` is panel column j; pivots at ``r_off + j``.
    """
    with jax.enable_x64(False):
        return _panel_qr_pallas(
            A_panel_t, jnp.asarray(r_off, jnp.int32), band
        )


def _auto_segments(n, b):
    """Trailing-update segment count: more segments the more panels there
    are (full-width GEMMs cost 3x the true trailing flops; segment
    shrinking recovers most of it).  Measured at n=3200 (5-rep loops):
    band=32 fused 27.0 / 23.4 / 21.6 ms at 4 / 8 / 12 segments; band=128
    (25 panels) stays at 4."""
    return max(4, min(12, (n // b) // 8))


def _fused_panel_pair_step(pdot, b, S, c):
    """One QR+LQ panel pair with the FUSED two-sided trailing update.

    The reference overlaps panel k+1's factorization with panel k's
    trailing GEMMs (lookahead, svd_parallel.h:458-460, :482-484).  On TPU
    XLA ops run sequentially on the one core, so the win is reshaped into
    cutting big-array HBM passes per pair from ~6 to 4 and merging the two
    rank-b corrections into one K=2b GEMM:

        W  = V^T S                      (big read 1)
        C1 = T^T W
        Sl = S[c:c+b,:] - Vr C1         (the LQ panel's input rows, small)
        factor LQ panel -> V2, T2
        Y  = S V2^T                     (big read 2; pre-left-update S,
                                         corrected: AV = Y - V (C1 V2^T))
        Z  = (AV) T2^T
        S -= [V | Z] @ [[C1],[V2]]      (big read 3 + write, K=2b)

    Measured (n=3200, 5-rep loops, scripts/probe_stage1_fused.py):
    band=32 32.2 -> 26.8 ms at segments=4, 21.6 ms with segments=12;
    band=64 20.9 -> 18.4; band=128 15.3 -> 14.7.  Sigma error unchanged
    (7.2e-8 at band=32 vs LAPACK f64).
    """
    m = S.shape[0]
    Pt = lax.dynamic_slice(S, (0, c), (m, b)).T
    Rt, Vt, Tt = _panel_qr_pallas(Pt, c, b)
    W = pdot(Vt, S)  # (b, m)
    C1 = pdot(Tt, W)  # (b, m); Tt = T^T
    # LQ panel input rows [c, c+b) of the left-updated S; its panel-block
    # columns [c, c+b) carry the exact R (what the sequential path reads
    # after the Rt.T write-back).
    Vr = lax.dynamic_slice(Vt, (0, c), (b, b)).T
    Sl = lax.dynamic_slice(S, (c, 0), (b, m)) - pdot(Vr, C1)
    Rblk = lax.dynamic_slice(Rt, (0, c), (b, b)).T
    Sl = lax.dynamic_update_slice(Sl, Rblk, (0, c))
    Rt2, Vt2, Tt2 = _panel_qr_pallas(Sl, c + b, b)
    Y = pdot(S, Vt2.T)  # (m, b); pre-update S
    D = pdot(C1, Vt2.T)  # (b, b)
    AV = Y - pdot(Vt.T, D)  # == (S - V C1) V2^T
    Z = pdot(AV, Tt2.T)  # (m, b)
    U2 = jnp.concatenate([Vt.T, Z], axis=1)  # (m, 2b)
    C2 = jnp.concatenate([C1, Vt2], axis=0)  # (2b, m)
    S = S - pdot(U2, C2)
    S = lax.dynamic_update_slice(S, Rt.T, (0, c))
    S = lax.dynamic_update_slice(S, Rt2, (c, 0))
    return S, (Vt, Tt, Vt2, Tt2)


def dense_to_band_pallas(A, band=128, segments=None):
    """Stage I with Pallas panel factorizations + XLA MXU trailing updates.

    Same schedule/output class as models/two_stage.dense_to_band; the panel
    inner loops run on-chip instead of as ~2n XLA loop iterations, the
    two-sided trailing update is fused (see
    :func:`_fused_panel_pair_step`), and the updates shrink per segment
    exactly as there.  ``segments=None`` picks the measured-optimal count
    per band (:func:`_auto_segments`).  fp32/TPU.
    """
    n = A.shape[0]
    if segments is None:
        segments = _auto_segments(n, int(band))
    with jax.enable_x64(False):
        return _dense_to_band_pallas(A, band=band, segments=segments)


@functools.partial(jax.jit, static_argnames=("band", "segments"))
def _dense_to_band_pallas(A, band=128, segments=4):
    from svdsolver_tpu.ops.precision import pdot
    from svdsolver_tpu.models.two_stage import segment_bounds

    n = A.shape[0]
    b = int(band)
    if A.shape[0] != A.shape[1]:
        raise ValueError("dense_to_band_pallas expects a square matrix")
    if n % b != 0:
        raise ValueError(f"n={n} must be divisible by band={b}")

    def step(k, S):
        S, _ = _fused_panel_pair_step(pdot, b, S, k * b)
        return S

    bounds = segment_bounds(n // b, segments)
    for s in range(len(bounds) - 1):
        k0, k1 = bounds[s], bounds[s + 1]
        if k0 == k1:
            continue
        s0 = k0 * b
        sub = lax.dynamic_slice(A, (s0, s0), (n - s0, n - s0))
        sub = lax.fori_loop(0, k1 - k0, step, sub)
        A = lax.dynamic_update_slice(A, sub, (s0, s0))
    return A


def dense_to_band_uv_pallas(A, band=128):
    """Stage I with U1/V1 accumulation, Pallas panel factorizations.

    Returns ``(Ab, U1, V1)`` with ``A = U1 @ Ab @ V1^T`` — the Pallas
    counterpart of models/two_stage.dense_to_band_uv (differential-tested):
    the panel column loops run on-chip and the per-panel factor updates
    ``U1 <- U1 (I - V T V^T)`` are MXU GEMMs on the kernel's (V, T^T)
    outputs.  No segment shrinking: the factor updates are full-width
    anyway.  fp32/TPU.
    """
    with jax.enable_x64(False):
        return _dense_to_band_uv_pallas(A, band=band)


@functools.partial(jax.jit, static_argnames=("band",))
def _dense_to_band_uv_pallas(A, band=128):
    from svdsolver_tpu.ops.precision import pdot

    n = A.shape[0]
    b = int(band)
    if A.shape[0] != A.shape[1]:
        raise ValueError("dense_to_band_uv_pallas expects a square matrix")
    if n % b != 0:
        raise ValueError(f"n={n} must be divisible by band={b}")
    dtype = A.dtype

    def step(k, carry):
        S, U1, V1 = carry
        S, (Vt, Tt, Vt2, Tt2) = _fused_panel_pair_step(pdot, b, S, k * b)
        U1 = U1 - pdot(pdot(pdot(U1, Vt.T), Tt.T), Vt)  # U1 (I - V T V^T)
        V1 = V1 - pdot(pdot(pdot(V1, Vt2.T), Tt2.T), Vt2)
        return S, U1, V1

    eye = jnp.eye(n, dtype=dtype)
    return lax.fori_loop(0, n // b, step, (A, eye, eye))


def dense_to_band_rec_pallas(A, band=128):
    """Stage I recording the panel block reflectors instead of eagerly
    accumulating U1/V1 (Pallas counterpart of
    ``models.two_stage.dense_to_band_rec``; same record contract:
    ``Vq[k] = V_k^T`` (b, n), ``Tq[k] = T_k^T``, QR then LQ per panel).

    The per-panel ~4n^2 b-FLOP factor GEMMs of ``dense_to_band_uv_pallas``
    leave the sequential critical path entirely — the caller applies the
    records backward to the (thin) matrices it actually needs.  fp32/TPU.
    """
    with jax.enable_x64(False):
        return _dense_to_band_rec_pallas(A, band=band)


@functools.partial(jax.jit, static_argnames=("band",))
def _dense_to_band_rec_pallas(A, band=128):
    from svdsolver_tpu.ops.precision import pdot

    n = A.shape[0]
    b = int(band)
    if A.shape[0] != A.shape[1]:
        raise ValueError("dense_to_band_rec_pallas expects a square matrix")
    if n % b != 0:
        raise ValueError(f"n={n} must be divisible by band={b}")

    def step(S, k):
        S, (Vt, Tt, Vt2, Tt2) = _fused_panel_pair_step(pdot, b, S, k * b)
        return S, (Vt, Tt, Vt2, Tt2)

    Ab, (Vq, Tq, Vl, Tl) = lax.scan(step, A, jnp.arange(n // b))
    return Ab, Vq, Tq, Vl, Tl


@functools.partial(jax.jit, static_argnames=("band",))
def _panel_qr_pallas(A_panel_t, r_off, band):
    b = int(band)
    m = A_panel_t.shape[1]
    dtype = A_panel_t.dtype
    assert A_panel_t.shape[0] == b
    return pl.pallas_call(
        functools.partial(_panel_kernel, b, m),
        out_shape=(
            jax.ShapeDtypeStruct((b, m), dtype),
            jax.ShapeDtypeStruct((b, m), dtype),
            jax.ShapeDtypeStruct((b, b), dtype),
        ),
        in_specs=[
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(jnp.reshape(r_off, (1, 1)), A_panel_t)
