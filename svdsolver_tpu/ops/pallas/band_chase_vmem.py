"""VMEM-resident packed-band bulge chase.

The HBM chase kernel (ops/pallas/band_chase.py) is DMA-issue bound: 2 issues
per elimination pair, ~2.3 us/pair net (PERF_NOTES row-cost model), and every
windowing scheme that round-trips windows through HBM hits the same ~2n^2
transferred-row invariant.  This kernel escapes the bound by keeping the band
in VMEM for the whole chase: one DMA pass in (packing), zero DMAs per pair,
one DMA pass out.

Layout — BLOCK-ALIGNED packing.  Row blocks of 128 keep their columns
lane-aligned; each block stores only its diagonal neighborhood:

    P[row, l] = A[row, 128*(row//128) - 128 + l],   l in [0, D)

with D = 640 covering the live band+bulge extent [row-(b-1), row+2b+2] for
b <= 128.  Packing and unpacking are therefore plain 2-D DMA copies per
block — no data reshuffling at all.  The price: a chase window's rows span
up to three 128-row blocks, and the SAME matrix column sits 128 lanes lower
in each successive block ("zones").  Eliminations handle zones with masked
reflector copies at 128-lane static rotations — no per-row shears, no
gathers, only iota masks, rowsums, and static rolls (the TPU's cheapest
vector ops).

Same schedule and arithmetic class as band_to_bidiagonal_pallas /
models/two_stage.band_to_bidiagonal (reference brd_p2, svd_parallel.h:639).
Reduction widths differ, so d/e are NOT elementwise-comparable across
kernels (the chase is chaotic in the rounding); the differential test
compares the SPECTRUM, which matches LAPACK to ~1.9e-7 relative at every
size tested.  Gate: 8 <= band <= 128, band % 8 == 0, packed array fits VMEM
(:func:`vmem_chase_supported`).

MEASURED OUTCOME (kept as a validated variant, not the default): at
n=3200/b=128 this kernel runs 58 ms vs the HBM window kernel's 44 ms — the
masked full-slab VPU arithmetic (~1.45 us/pair over (264, 512) slabs) costs
more than the HBM kernel's DMA round-trips, whose latency the sequential
window pipeline already hides well.  Zero-DMA residency alone is not a win;
a shape that narrows the per-pair VPU footprint below ~(264, 384) would be
needed first.  See PERF_NOTES.md.
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

D = 640  # packed width: covers live lanes [1, 512) for b <= 128
WR = 512  # right-elimination working lane width


def _vmem_chase_kernel(n, b, Npad, A_in, P_out, P, sem):
    """Packed chase over VMEM-resident ``P`` (Npad, D)."""
    w = b + 1
    dtype = P.dtype
    zero = jnp.zeros((), dtype)
    one = jnp.ones((), dtype)

    # ---- pack: one rectangular DMA per 128-row block --------------------
    def pack_block(br, carry):
        cp = pltpu.make_async_copy(
            A_in.at[pl.ds(br * 128, 128), pl.ds(br * 128, D)],
            P.at[pl.ds(br * 128, 128), :],
            sem,
        )
        cp.start()
        cp.wait()
        return carry

    lax.fori_loop(jnp.int32(0), jnp.int32(Npad // 128), pack_block, 0)

    lane_r = lax.broadcasted_iota(jnp.int32, (1, WR), 1)
    lane_l = lax.broadcasted_iota(jnp.int32, (1, D), 1)

    def make_v(xrow, x, lane):
        """larfg over lanes [x, x+b) of ``xrow`` (pivot at x): (v, tau)."""
        tail = jnp.logical_and(lane > x, lane < x + b)
        xt = jnp.where(tail, xrow, zero)
        pivot = jnp.sum(jnp.where(lane == x, xrow, zero))
        sigma2 = jnp.sum(xt * xt)
        norm = jnp.sqrt(pivot * pivot + sigma2)
        sign = jnp.where(pivot >= 0, one, -one)
        beta = -sign * norm
        trivial = sigma2 == 0
        denom = jnp.where(trivial, one, pivot - beta)
        v = jnp.where(tail, xt / denom, zero) + jnp.where(lane == x, one, zero)
        safe_beta = jnp.where(beta == 0, one, beta)
        tau = jnp.where(trivial, zero, (beta - pivot) / safe_beta)
        return v, tau

    def right_elim(r, co0, SL, RL):
        """Row reflector: pivot row ``r``, support cols [r+co0, r+co0+b),
        applied to rows [r, r+RL).  The (SL+8)-row slab starts at the 8-row
        boundary below ``r`` (dynamic sublane loads must be tile-aligned).

        Col r+co0+j sits at lane x - 128*zone + j of global row g, where
        x = co0 + r%128 + 128 and zone = g//128 - r//128 in {0,1,2}.
        """
        r8 = (r // 8) * 8
        ro = r - r8
        x = co0 + lax.rem(r, jnp.int32(128)) + 128
        rows = P[pl.ds(r8, SL + 8), :WR]
        qi = lax.broadcasted_iota(jnp.int32, (SL + 8, 1), 0)
        active = jnp.logical_and(qi >= ro, qi < ro + RL)
        prow = jnp.sum(
            jnp.where(qi == ro, rows, zero), axis=0, keepdims=True
        )
        v0, tau = make_v(prow, x, lane_r)
        v1 = pltpu.roll(v0, WR - 128, 1)  # static: zone-1 copy (128 left)
        v2 = pltpu.roll(v0, WR - 256, 1)  # zone-2 copy
        zone = (r8 + qi) // 128 - r // 128
        Vm = jnp.where(zone == 0, v0, jnp.where(zone == 1, v1, v2))
        Vm = jnp.where(active, Vm, zero)
        u = jnp.sum(rows * Vm, axis=1, keepdims=True)
        P[pl.ds(r8, SL + 8), :WR] = rows - (tau * u) * Vm

    def left_elim(r1):
        """Column reflector: pivot col ``r1``, support rows [r1, r1+b),
        applied to cols [r1, r1+2b).  Col r1+j sits at lane
        xl - 128*zone + j; zones in {0, 1}."""
        r8 = (r1 // 8) * 8
        ro1 = r1 - r8
        xl = lax.rem(r1, jnp.int32(128)) + 128
        rows = P[pl.ds(r8, b + 8), :]
        qi = lax.broadcasted_iota(jnp.int32, (b + 8, 1), 0)
        zone = (r8 + qi) // 128 - r1 // 128  # {-1?, 0, 1}; off-rows masked
        # pivot-column extraction (lane xl - 128*zone per row)
        lofs = xl - 128 * zone
        xcol = jnp.sum(
            jnp.where(lane_l == lofs, rows, zero), axis=1, keepdims=True
        )
        tail = jnp.logical_and(qi > ro1, qi < ro1 + b)
        xt = jnp.where(tail, xcol, zero)
        pivot = jnp.sum(jnp.where(qi == ro1, xcol, zero))
        sigma2 = jnp.sum(xt * xt)
        norm = jnp.sqrt(pivot * pivot + sigma2)
        sign = jnp.where(pivot >= 0, one, -one)
        beta = -sign * norm
        trivial = sigma2 == 0
        denom = jnp.where(trivial, one, pivot - beta)
        v = jnp.where(tail, xt / denom, zero) + jnp.where(
            qi == ro1, one, zero
        )
        safe_beta = jnp.where(beta == 0, one, beta)
        tau = jnp.where(trivial, zero, (beta - pivot) / safe_beta)
        # w[j] = sum_q v[q] * A[r1+q, r1+j]: accumulate per zone in zone-0
        # lane coordinates (shift zone-1 partials 128 right, statically)
        p0 = jnp.sum(jnp.where(zone == 0, v, zero) * rows, axis=0,
                     keepdims=True)
        p1 = jnp.sum(jnp.where(zone == 1, v, zero) * rows, axis=0,
                     keepdims=True)
        w0 = p0 + pltpu.roll(p1, 128, 1)
        csel = jnp.logical_and(lane_l >= xl, lane_l < xl + 2 * b)
        w0 = jnp.where(csel, w0, zero)
        w1 = pltpu.roll(w0, D - 128, 1)  # zone-1 coords
        Wm = jnp.where(zone == 0, w0, w1)
        P[pl.ds(r8, b + 8), :] = rows - (tau * v) * Wm

    # ---- sweeps ----------------------------------------------------------
    SLT = b + 8  # top right slab (logical b+1 rows)

    def sweep(i, carry):
        right_elim(i, 1, SLT, w)
        left_elim(i + 1)
        n_chase = (
            jnp.maximum(
                jnp.int32(0), -(-(jnp.int32(n) - (i + 2 * w - 1)) // b)
            )
            + 1
        )

        def chase(k, carry):
            r = i + 1 + k * b
            right_elim(r, b, 2 * b, 2 * b)
            left_elim(r + b)
            return carry

        return lax.fori_loop(jnp.int32(0), n_chase, chase, carry)

    lax.fori_loop(jnp.int32(0), jnp.int32(n - 1), sweep, 0)

    def unpack_block(br, carry):
        cp = pltpu.make_async_copy(
            P.at[pl.ds(br * 128, 128), :],
            P_out.at[pl.ds(br * 128, 128), :],
            sem,
        )
        cp.start()
        cp.wait()
        return carry

    lax.fori_loop(jnp.int32(0), jnp.int32(Npad // 128), unpack_block, 0)


def vmem_chase_supported(n, band):
    """True when the packed chase's band gate and VMEM footprint allow it."""
    b = int(band)
    if b < 8 or b > 128 or b % 8 != 0:
        return False
    Npad = -(-(n + 3 * b + 8) // 128) * 128
    # validated up to 13.8 MB resident (n=4992, band=128) on the 16 MB VMEM
    return Npad * D * 4 <= 14 * 1024 * 1024


# Measured on v5e: the HBM window kernel's per-pair cost jumps 1.26 -> 3.0 us
# when the padded matrix's physical row stride crosses ~15.4 KB (3840 fp32
# lanes) — a DMA striding cliff, invariant to odd/even 128-multiples (tested
# both).  Below the cliff the HBM kernel wins (1.26 vs 1.45 us/pair); above
# it, this VMEM-resident kernel (no HBM strides at all) is ~2x faster.
_HBM_FAST_LANES = 3840


def vmem_chase_preferred(n, band):
    """True when the packed VMEM chase should replace the HBM window kernel:
    the HBM kernel's padded row stride is past its measured cliff AND the
    packed band fits VMEM."""
    b = int(band)
    if not vmem_chase_supported(n, b):
        return False
    mc = -(-2 * b // 128) * 128 + 128
    dense_lanes = -(-(n + b + mc + 16) // 128) * 128
    return dense_lanes > _HBM_FAST_LANES


def band_to_bidiagonal_pallas_vmem(A, band=128):
    """Packed VMEM-resident chase; returns (d, e).  Callers gate via
    :func:`vmem_chase_supported`."""
    with jax.enable_x64(False):
        return _band_to_bidiagonal_pallas_vmem(A, band=band)


@functools.partial(jax.jit, static_argnames=("band",))
def _band_to_bidiagonal_pallas_vmem(A, band=128):
    n = A.shape[0]
    b = int(band)
    dtype = A.dtype
    if n < 2:
        return jnp.abs(jnp.diag(A)), jnp.zeros((0,), dtype)
    if b % 8 != 0 or b < 8 or b > 128:
        raise ValueError(f"band={b} must be a multiple of 8 in [8, 128]")
    Npad = -(-(n + 3 * b + 8) // 128) * 128
    # 128 zero columns on the left (block br reads cols from 128*(br-1));
    # right padding so every block's D-wide read stays in bounds
    Ad = jnp.pad(A, ((0, Npad - n), (128, Npad - n + D)))

    P = pl.pallas_call(
        functools.partial(_vmem_chase_kernel, n, b, Npad),
        out_shape=jax.ShapeDtypeStruct((Npad, D), dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((Npad, D), dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(Ad)
    # unpack d/e: row i's diagonal sits at lane (i % 128) + 128
    nb = Npad // 128
    P3 = P.reshape(nb, 128, D)
    j = jnp.arange(128)
    oh_d = (jnp.arange(D)[None, :] == (j + 128)[:, None]).astype(dtype)
    oh_e = (jnp.arange(D)[None, :] == (j + 129)[:, None]).astype(dtype)
    # elementwise multiply+sum (VPU, exact) — an einsum would round the
    # values through the bf16 MXU
    d = jnp.sum(P3 * oh_d[None], axis=2).reshape(-1)[:n]
    e = jnp.sum(P3 * oh_e[None], axis=2).reshape(-1)[: n - 1]
    return d, e
