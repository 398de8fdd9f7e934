"""Top-level singular-value driver: model dispatch over the capability ladder.

The reference exposes its four implementations through CLI model names
(svd_cpu.cpp:143-162: base | singlecore | multicore | diagonal, plus the CUDA
drivers).  Here the same ladder is a single ``svdvals`` entry point with a
``method`` switch; every path is jit-compiled end-to-end.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from svdsolver_tpu.models.golub_kahan import bidiagonalize_gk
from svdsolver_tpu.models.blocked import bidiagonalize_blocked
from svdsolver_tpu.models.two_stage import dense_to_band, band_to_bidiagonal
from svdsolver_tpu.models.tiled import dense_to_band_tiled
from svdsolver_tpu.models.diagonalize import (
    bidiagonal_svdvals,
    bisect_svdvals,
    dqds_svdvals,
)


def use_pallas(dtype):
    """The Pallas device-resident paths need a real TPU backend and fp32."""
    return jax.default_backend() == "tpu" and jnp.dtype(dtype) == jnp.float32

METHODS = ("base", "singlecore", "multicore", "tpu1", "tpu2")


class Bidiagonal(NamedTuple):
    """Bidiagonal factor {d, e} (reference: svd_serial.h:79-125)."""

    d: jnp.ndarray
    e: jnp.ndarray


def _pad_to_multiple(A, b):
    n = A.shape[0]
    r = (-n) % b
    if r == 0:
        return A, n
    return jnp.pad(A, ((0, r), (0, r))), n


def _auto_block(n):
    """Band/panel width tuning: wider bands shrink the sequential bulge-chase
    step count (n^2/b steps) and fatten Stage-I GEMMs; measured on v5e at
    n=3200: b=32 -> 1.96s, b=64 -> 1.19s, b=128 -> 0.78s, b=160 -> 0.70s.
    128 balances runtime against compile time."""
    if n >= 1024:
        return 128
    if n >= 256:
        return 64
    return 32


def bidiagonalize(A, method="tpu2", block=None):
    """Reduce ``A`` to bidiagonal form with the chosen model; returns Bidiagonal.

    base       : Golub-Kahan, unblocked           (reference `brd`)
    singlecore : blocked one-stage compact-WY     (reference `block_brd`)
    multicore / tpu1 / tpu2 : two-stage band reduction + bulge chase
                 (reference `brd_p1`+`brd_p2` / `cuda_brd_p1`); on TPU the
                 three share the XLA/Pallas path — thread fan-out and CUDA
                 kernel launches both map to compiled device code.

    ``block=None`` auto-selects the band/panel width by problem size.
    """
    if block is None:
        block = _auto_block(A.shape[0])
    if method == "base":
        d, e = bidiagonalize_gk(A)
    elif method == "singlecore":
        d, e = bidiagonalize_blocked(A, panel=block)
    elif method in ("multicore", "tpu1", "tpu2"):
        Ap, n = _pad_to_multiple(A, block)
        if method == "multicore":
            # the reference's tiled TS-QR schedule (brd_p1, svd_parallel.h)
            Ab = dense_to_band_tiled(Ap, band=block)
        elif method == "tpu2" and use_pallas(A.dtype):
            # device-resident panel factorization (the CUDA-2 analogue:
            # taus/reflectors never leave the chip) + shrinking trailing GEMMs
            from svdsolver_tpu.ops.pallas.panel_qr import dense_to_band_pallas

            Ab = dense_to_band_pallas(Ap, band=block)
        else:
            # the panel-sweep schedule of its CUDA drivers (cuda_brd_p1);
            # per-op XLA dispatch is the analogue of CUDA-1's per-op launches
            Ab = dense_to_band(Ap, band=block)
        if method == "tpu2" and use_pallas(A.dtype):
            # device-resident single-launch chase (the CUDA-2 analogue)
            from svdsolver_tpu.ops.pallas.band_chase import (
                band_to_bidiagonal_pallas,
            )
            from svdsolver_tpu.ops.pallas.band_chase_stream import (
                band_to_bidiagonal_pallas_stream,
                stream_chase_preferred,
            )
            from svdsolver_tpu.ops.pallas.band_chase_wave import (
                band_to_bidiagonal_pallas_wave,
                wave_chase_preferred,
            )

            if wave_chase_preferred(Ap.shape[0], block):
                # past the HBM kernel's row-stride cliff, band in VMEM:
                # wavefront-batched packed chase (larfg chains amortized
                # across the pipelined sweep lanes)
                d, e = band_to_bidiagonal_pallas_wave(Ab, band=block)
            elif stream_chase_preferred(Ap.shape[0], block):
                # past the cliff, beyond VMEM residency: streamed packed
                # chase (two-phase windows)
                d, e = band_to_bidiagonal_pallas_stream(Ab, band=block)
            else:
                d, e = band_to_bidiagonal_pallas(Ab, band=block)
        else:
            d, e = band_to_bidiagonal(Ab, band=block)
        d, e = d[:n], e[: n - 1]
    else:
        raise ValueError(f"unknown method {method!r}; choose from {METHODS}")
    return Bidiagonal(d, e)


def svdvals(A, method="tpu2", block=None, diag="bisect"):
    """Singular values of ``A`` (any shape), sorted descending.

    End-to-end: bidiagonalize with the chosen model, then diagonalize.
    ``diag``: 'bisect' (default — TPU-native parallel bisection), 'qr'
    (the reference's implicit-shift QR with deflation, svd_serial.h:368),
    or 'dqds' (Fernando-Parlett differential qd — high relative accuracy
    on graded spectra, with bisection fallback).

    Rectangular inputs are first reduced to a square triangular factor by a
    one-sided QR/LQ (sigma-preserving), then run through the square pipeline
    — the standard tall-matrix preprocessing the reference lacks (its
    two-stage models require square inputs).
    """
    import numpy as _np

    if _np.iscomplexobj(A):  # host numpy complex; no complex dtype on TPU
        if method != "tpu2" or diag != "bisect":
            raise ValueError(
                "complex input supports only method='tpu2', diag='bisect' "
                f"(got method={method!r}, diag={diag!r}); call "
                "svdsolver_tpu.models.complex_svd.svdvals_c directly"
            )
        from svdsolver_tpu.models.complex_svd import svdvals_c

        return svdvals_c(A)
    m, n = A.shape
    if m != n:
        if m < n:
            A = A.T
            m, n = n, m
        A = jnp.linalg.qr(A, mode="r")[:n, :n]
    B = bidiagonalize(A, method=method, block=block)
    if diag == "bisect":
        if method == "tpu2" and use_pallas(A.dtype):
            from svdsolver_tpu.ops.pallas.bisect import bisect_svdvals_pallas

            return bisect_svdvals_pallas(B.d, B.e)[:n]
        return bisect_svdvals(B.d, B.e)[:n]
    elif diag == "qr":
        return bidiagonal_svdvals(B.d, B.e)[:n]
    elif diag == "dqds":
        return dqds_svdvals(B.d, B.e)[:n]
    raise ValueError(f"unknown diag {diag!r}; 'bisect', 'qr' or 'dqds'")


def svdvals_batch(As, block=None):
    """Singular values of a batch of square matrices: (B, n, n) -> (B, n).

    Single-device batched execution (vmapped two-stage + bisection); for
    multi-chip sharded batches use parallel.distributed.svdvals_batch_sharded.
    """
    n = As.shape[-1]
    if block is None:
        block = _auto_block(n)

    def one(A):
        Ap, _ = _pad_to_multiple(A, block)
        Ab = dense_to_band(Ap, band=block)
        d, e = band_to_bidiagonal(Ab, band=block)
        return bisect_svdvals(d, e)[:n]

    return jax.vmap(one)(As)
