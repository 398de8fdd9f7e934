"""Pallas kernel: band -> bidiagonal bulge chase, single-launch.

The XLA version of Stage II (models/two_stage.py:band_to_bidiagonal) pays
~5-7us of op-dispatch overhead per elimination pair — with n^2/band pairs
that dominates the whole SVD at scale.  This kernel runs the *entire* chase
in one ``pallas_call``: the matrix stays in HBM, each elimination window is
DMA'd into a VMEM scratch tile, both Householder eliminations of the pair
execute on-chip, and the window is DMA'd back — the device-resident
discipline of the reference's CUDA-2 rewrite (one arena, scalars on device,
svd_cuda_2.cu:1117) taken to its TPU conclusion: one kernel launch for the
whole stage.

Alignment: Mosaic DMA requires (8, 128)-aligned offsets and shapes, but the
chase windows start at arbitrary (r, c).  So each DMA covers the *aligned
superset* ``[r - r%8, +(2b+8)) x [c - c%128, +(2b+128))`` and the two
Householder eliminations use dynamically *masked* reflectors with the pivot
at ``(r%8, c%128)`` inside the buffer (iota-mask extraction, full-buffer
rank-1 applies).  This is exact: every extra row/column the superset drags
in provably has zeros in the active range (it lies outside the band/bulge),
so the masked reflectors act as the identity there — the same masking
argument that makes the XLA models static-shape (see ops/householder.py).

Window geometry matches models/two_stage.py exactly (same math, schedule):
  sweep i:  top pair  at pivot (i, i+1),  left pivot offset 1
            chase k   at pivot (r, c) = (i+1 + k*b, i+1 + (k+1)*b),
                      left pivot offset b
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


def _masked_pair_eliminate(W, ro, co, lp, b):
    """Both eliminations of one chase pair on buffer ``W``; pivot at dynamic
    ``(ro, co)``, left-elimination pivot ``lp`` rows below (1 for the top
    pair, ``b`` for chase pairs).

    Right: Householder of row ``ro`` over cols ``[co, co+b)``, applied to all
    rows.  Left: Householder of col ``co`` over rows ``[ro+lp, ro+lp+b)``,
    applied to all cols.  Rows/cols outside the logical window carry zeros in
    the active ranges, so the full-buffer applies are exact.
    """
    wr, wc = W.shape
    dtype = W.dtype
    one = jnp.ones((), dtype)
    zero = jnp.zeros((), dtype)
    ci = lax.broadcasted_iota(jnp.int32, (1, wc), 1)
    ri = lax.broadcasted_iota(jnp.int32, (wr, 1), 0)

    # --- right elimination (row reflector) ---
    rowmask = (ri == ro).astype(dtype)
    xrow = _dot(rowmask.T, W)  # (1, wc): extract pivot row
    tail = jnp.logical_and(ci > co, ci < co + b)
    xt = jnp.where(tail, xrow, zero)
    pivot = jnp.sum(jnp.where(ci == co, xrow, zero))
    sigma2 = jnp.sum(xt * xt)
    norm = jnp.sqrt(pivot * pivot + sigma2)
    sign = jnp.where(pivot >= 0, one, -one)
    beta = -sign * norm
    trivial = sigma2 == 0
    denom = jnp.where(trivial, one, pivot - beta)
    v = jnp.where(tail, xt / denom, zero) + jnp.where(ci == co, one, zero)
    safe_beta = jnp.where(beta == 0, one, beta)
    tau = jnp.where(trivial, zero, (beta - pivot) / safe_beta)
    u = _dot(W, v.T)  # (wr, 1)
    W = W - tau * _dot(u, v)

    # --- left elimination (column reflector) ---
    ro2 = ro + lp
    colmask = (ci == co).astype(dtype)
    xcol = _dot(W, colmask.T)  # (wr, 1): extract pivot column
    tail2 = jnp.logical_and(ri > ro2, ri < ro2 + b)
    xt2 = jnp.where(tail2, xcol, zero)
    pivot2 = jnp.sum(jnp.where(ri == ro2, xcol, zero))
    sigma2_2 = jnp.sum(xt2 * xt2)
    norm2 = jnp.sqrt(pivot2 * pivot2 + sigma2_2)
    sign2 = jnp.where(pivot2 >= 0, one, -one)
    beta2 = -sign2 * norm2
    trivial2 = sigma2_2 == 0
    denom2 = jnp.where(trivial2, one, pivot2 - beta2)
    v2 = jnp.where(tail2, xt2 / denom2, zero) + jnp.where(ri == ro2, one, zero)
    safe_beta2 = jnp.where(beta2 == 0, one, beta2)
    tau2 = jnp.where(trivial2, zero, (beta2 - pivot2) / safe_beta2)
    u2 = _dot(v2.T, W)  # (1, wc)
    W = W - tau2 * _dot(v2, u2)
    return W


def _chase_kernel(n, b, A_in, A_out, W, sem_full, sem_w):
    wr = 2 * b + 8
    wc = -(-2 * b // 128) * 128 + 128  # superset width, 128-aligned
    w = b + 1

    # Bring the input band matrix into the (separately allocated) output.
    full = pltpu.make_async_copy(A_in, A_out, sem_full)
    full.start()
    full.wait()

    def do_pair(pr, pc, lp):
        """DMA aligned superset of the window pivoted at (pr, pc), eliminate
        with masked reflectors, DMA back."""
        r0 = (pr // 8) * 8
        c0 = (pc // 128) * 128
        cin = pltpu.make_async_copy(
            A_out.at[pl.ds(r0, wr), pl.ds(c0, wc)], W, sem_w
        )
        cin.start()
        cin.wait()
        W[:] = _masked_pair_eliminate(W[:], pr - r0, pc - c0, lp, b)
        cout = pltpu.make_async_copy(
            W, A_out.at[pl.ds(r0, wr), pl.ds(c0, wc)], sem_w
        )
        cout.start()
        cout.wait()

    def sweep(i, carry):
        do_pair(i, i + 1, 1)  # top pair (band_rd_top)
        n_chase = jnp.maximum(jnp.int32(0), -(-(jnp.int32(n) - (i + 2 * w - 1)) // b)) + 1

        def chase(k, carry):
            r = i + 1 + k * b
            do_pair(r, r + b, b)
            return carry

        return lax.fori_loop(jnp.int32(0), n_chase, chase, carry)

    # int32 bounds: Pallas cannot lower the int64 indices x64 mode produces
    lax.fori_loop(jnp.int32(0), jnp.int32(n - 1), sweep, 0)


def band_to_bidiagonal_pallas(A, band=128):
    # x64 mode sends the trace into an int-promotion recursion inside Mosaic
    # lowering; the kernel is 32-bit only, so trace it with x64 off.
    with jax.enable_x64(False):
        return _band_to_bidiagonal_pallas(A, band=band)


@functools.partial(jax.jit, static_argnames=("band",))
def _band_to_bidiagonal_pallas(A, band=128):
    """Stage II as one Pallas kernel; returns (d, e).

    Same schedule and arithmetic as models/two_stage.py:band_to_bidiagonal —
    differential-tested against it — with the whole chase in one launch.
    ``band`` must be a multiple of 8 (window shapes are DMA-tile aligned).
    """
    n = A.shape[0]
    b = int(band)
    dtype = A.dtype
    if n < 2:
        return jnp.abs(jnp.diag(A)), jnp.zeros((0,), dtype)
    if b % 8 != 0:
        raise ValueError(
            f"band={b} must be a multiple of 8; use "
            "models.two_stage.band_to_bidiagonal otherwise"
        )
    wc = -(-2 * b // 128) * 128 + 128
    # Padding: max col window end = c_max + wc <= n + b - 1 + wc.
    pad = b + wc + 16
    Ap = jnp.pad(A, ((0, pad), (0, pad)))
    Np = n + pad

    out = pl.pallas_call(
        functools.partial(_chase_kernel, n, b),
        out_shape=jax.ShapeDtypeStruct((Np, Np), dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((2 * b + 8, wc), dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(Ap)
    B = out[:n, :n]
    return jnp.diag(B), jnp.diag(B, 1)
