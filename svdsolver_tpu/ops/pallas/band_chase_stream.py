"""Streamed packed-band bulge chase for bands too large for VMEM residency.

The VMEM-resident packed chase (band_chase_vmem.py) wins above the HBM window
kernel's row-stride cliff but is capped by VMEM capacity (n <= ~5000 at
band=128).  Beyond that cap the dense HBM window kernel runs in its slow
~3 us/pair regime (PERF_NOTES "stride cliff").  This kernel extends the
packed-band escape to arbitrary n by keeping the packed band in HBM and
STREAMING it through VMEM in double-buffered row windows:

* The band is packed once (in-kernel DMAs) into a (Npad, 512) HBM array with
  the same block-aligned diagonal layout as the VMEM kernel —
  ``P[row, l] = A[row, 128*(row//128) - 128 + l]`` — but clipped to the 512
  lanes the eliminations can ever touch (modified lanes are provably < 511;
  see band_chase_vmem._left_elim).  Packed rows are 2 KB and contiguous:
  every window DMA runs far below the stride cliff.
* Each sweep walks its bulge down the band through a sliding window of
  W rows.  A window holds ``h`` chase hops; while window j computes, the
  fresh tail of window j+1 streams in and window j-1's finalized rows
  stream out — two DMA issues per h hops instead of per pair.
* Window bases are 128-ALIGNED (i128 + j*h*b with h*b % 128 == 0), so the
  zone/lane arithmetic of the shared elimination kernels is valid in
  window-local coordinates (it depends on row indices only mod 128).

Same schedule and elimination arithmetic as band_chase_vmem (shared code),
hence bitwise-identical d/e to the VMEM kernel; same output class as the
reference brd_p2 (svd_parallel.h:639).

Measured (3-rep loop, b=128): 2.05-2.42 us/pair — ~2x faster than the dense
HBM window kernel past its cliff (n=5248: 254 vs 579 ms; n=7680: 465 vs
935 ms), ~1.6x off the VMEM kernel's 1.4 us/pair (carry copy + window
boundary waits; see PERF_NOTES).
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from svdsolver_tpu.ops.pallas.band_chase_vmem import (
    _left_elim,
    _right_elim,
    vmem_chase_supported,
    _HBM_FAST_LANES,
)

DS = 512  # packed/streamed width: all live+bulge lanes are provably < 511
W = 2176  # window rows (17 * 128): must be >= (h + 1) * b + 136


def _hops_per_window(b):
    """Largest h with (h+1)*b + 136 <= W (window covers h hops plus the
    io <= 127 base-alignment offset and the 2b+8 elimination span) and
    h*b % 128 == 0 (keeps window bases 128-aligned)."""
    for h in range((W - 136) // b - 1, 0, -1):
        if (h * b) % 128 == 0:
            return h
    return None


def _stream_chase_kernel(
    n, b, h, Npad, A_in, d_out, e_out, P, BUF, stage, sem_pack, sem_in, sem_out
):
    """Streamed chase over HBM-packed ``P`` (Npad, DS) via window buffer
    ``BUF`` ((2W, DS) VMEM — two W-row slots, selected by window parity)."""
    w = b + 1
    dtype = P.dtype
    zero = jnp.zeros((), dtype)
    hb = h * b
    n128 = -(-n // 128) * 128

    # ---- pack: assemble each 128-row block in VMEM, DMA to HBM ----------
    for br in range(Npad // 128):
        r0 = 128 * br
        stage[...] = jnp.zeros(stage.shape, dtype)
        if r0 < n128:
            c0 = 128 * br - 128
            l0 = max(0, -c0)
            cs = c0 + l0
            cw = min(DS - l0, n128 - cs)
            if cw > 0:
                cp = pltpu.make_async_copy(
                    A_in.at[pl.ds(r0, 128), pl.ds(cs, cw)],
                    stage.at[:, pl.ds(l0, cw)],
                    sem_pack,
                )
                cp.start()
                cp.wait()
        cp = pltpu.make_async_copy(
            stage.at[...], P.at[pl.ds(r0, 128)], sem_pack
        )
        cp.start()
        cp.wait()

    # ---- sweeps ---------------------------------------------------------
    def sweep(i, carry):
        i128 = (i // 128) * 128
        io = i - i128
        n_chase = (
            jnp.maximum(
                jnp.int32(0), -(-(jnp.int32(n) - (i + 2 * w - 1)) // b)
            )
            + 1
        )
        S = (n_chase + (h - 1)) // h  # >= 1 since n_chase >= 1

        def in_tail(j):
            # fresh rows of window j+1: P[base_j + W, +hb) -> slot(j+1)[W-hb:]
            off_n = (1 - j % 2) * W
            return pltpu.make_async_copy(
                P.at[pl.ds(i128 + j * hb + W, hb)],
                BUF.at[pl.ds(off_n + (W - hb), hb)],
                sem_in,
            )

        def out_part(j):
            off_c = (j % 2) * W
            return pltpu.make_async_copy(
                BUF.at[pl.ds(off_c, hb)],
                P.at[pl.ds(i128 + j * hb, hb)],
                sem_out,
            )

        def out_full(j):
            off_c = (j % 2) * W
            return pltpu.make_async_copy(
                BUF.at[pl.ds(off_c, W)],
                P.at[pl.ds(i128 + j * hb, W)],
                sem_out,
            )

        # prologue: load window 0 into slot 0
        cp = pltpu.make_async_copy(
            P.at[pl.ds(i128, W)], BUF.at[pl.ds(i128 * 0, W)], sem_in
        )
        cp.start()
        cp.wait()

        def win(j, carry):
            # both offsets as parity * W products: Mosaic's alignment prover
            # accepts (traced) * (constant multiple of 8) but not W - off_c
            off_c = (j % 2) * W
            off_n = (1 - j % 2) * W
            # strict one-outstanding-copy-per-semaphore discipline: a DMA
            # semaphore counts bytes, so two equal-size copies in flight on
            # one sem would let a wait be satisfied by the WRONG completion
            pl.when(j >= 1)(lambda: out_part(j - 1).wait())
            pl.when(j >= 1)(lambda: in_tail(j - 1).wait())
            pl.when(j + 1 < S)(lambda: in_tail(j).start())

            @pl.when(j == 0)
            def _heads():
                _right_elim(BUF, b, off_c + io, 1, b + 8, w)
                _left_elim(BUF, b, off_c + io + 1)

            def hop(k2, carry):
                lr = off_c + io + 1 + k2 * b
                _right_elim(BUF, b, lr, b, 2 * b, 2 * b)
                _left_elim(BUF, b, lr + b)
                return carry

            hops_j = jnp.clip(n_chase - j * h, 0, h)
            lax.fori_loop(jnp.int32(0), hops_j, hop, 0)

            @pl.when(j + 1 < S)
            def _mid():
                # carry the unfinalized overlap into the next slot, retire
                # the h*b finalized rows to HBM
                BUF[pl.ds(off_n, W - hb), :] = BUF[pl.ds(off_c + hb, W - hb), :]
                out_part(j).start()

            pl.when(j + 1 >= S)(lambda: out_full(j).start())
            return carry

        lax.fori_loop(jnp.int32(0), S, win, 0)
        out_full(S - 1).wait()
        return carry

    lax.fori_loop(jnp.int32(0), jnp.int32(n - 1), sweep, 0)

    # ---- extract d/e (same mask-reduce as the VMEM kernel) --------------
    li = lax.broadcasted_iota(jnp.int32, (128, 256), 1)
    ri = lax.broadcasted_iota(jnp.int32, (128, 256), 0)
    for br in range(n128 // 128):
        cp = pltpu.make_async_copy(
            P.at[pl.ds(128 * br, 128), pl.ds(128, 256)],
            stage.at[:, :256],
            sem_pack,
        )
        cp.start()
        cp.wait()
        blk = stage[:, :256]
        dsum = jnp.sum(jnp.where(li == ri, blk, zero), axis=0, keepdims=True)
        esum = jnp.sum(
            jnp.where(li == ri + 1, blk, zero), axis=0, keepdims=True
        )
        d_out[br : br + 1, :] = dsum[:, 0:128]
        e_out[br : br + 1, :] = esum[:, 1:129]


def stream_chase_supported(n, band):
    """True when the streamed packed chase's band gate allows it."""
    b = int(band)
    if b < 8 or b > 128 or b % 8 != 0:
        return False
    return _hops_per_window(b) is not None and n >= 2


def stream_chase_preferred(n, band):
    """True when the streamed chase should replace the dense HBM window
    kernel: past the HBM kernel's row-stride cliff but too large for the
    VMEM-resident packed chase (which wins in its own range)."""
    b = int(band)
    if not stream_chase_supported(n, b) or vmem_chase_supported(n, b):
        return False
    mc = -(-2 * b // 128) * 128 + 128
    dense_lanes = -(-(n + b + mc + 16) // 128) * 128
    return dense_lanes > _HBM_FAST_LANES


def band_to_bidiagonal_pallas_stream(A, band=128):
    """Streamed packed chase; returns (d, e).  Callers gate via
    :func:`stream_chase_supported`."""
    with jax.enable_x64(False):
        return _band_to_bidiagonal_pallas_stream(A, band=band)


@functools.partial(jax.jit, static_argnames=("band",))
def _band_to_bidiagonal_pallas_stream(A, band=128):
    n = A.shape[0]
    b = int(band)
    dtype = A.dtype
    if n < 2:
        return jnp.abs(jnp.diag(A)), jnp.zeros((0,), dtype)
    h = _hops_per_window(b)
    if h is None:
        raise ValueError(f"band={b} must be a multiple of 8 in [8, 128]")
    assert (h + 1) * b + 136 <= W and (h * b) % 128 == 0
    n128 = -(-n // 128) * 128
    Npad = -(-(n + b + W + 128) // 128) * 128
    nb = n128 // 128
    if n128 != n:  # align for the pack DMAs
        A = jnp.pad(A, ((0, n128 - n), (0, n128 - n)))
    d2, e2, _ = pl.pallas_call(
        functools.partial(_stream_chase_kernel, n, b, h, Npad),
        out_shape=(
            jax.ShapeDtypeStruct((nb, 128), dtype),
            jax.ShapeDtypeStruct((nb, 128), dtype),
            jax.ShapeDtypeStruct((Npad, DS), dtype),  # HBM pack buffer
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2 * W, DS), dtype),
            pltpu.VMEM((128, DS), dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(A)
    d = d2.reshape(-1)[:n]
    e = e2.reshape(-1)[: n - 1]
    return d, e
