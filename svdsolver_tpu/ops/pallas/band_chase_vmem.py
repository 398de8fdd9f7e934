"""VMEM-resident packed-band bulge chase.

The HBM chase kernel (ops/pallas/band_chase.py) is DMA-issue bound: 2 issues
per elimination pair, ~2.3 us/pair net (PERF_NOTES row-cost model), and every
windowing scheme that round-trips windows through HBM hits the same ~2n^2
transferred-row invariant.  This kernel escapes the bound by keeping the band
in VMEM for the whole chase: one DMA pass in (packing), zero DMAs per pair,
and d/e extracted in-kernel — the packed array never leaves the chip.

Layout — BLOCK-ALIGNED packing.  Row blocks of 128 keep their columns
lane-aligned; each block stores only its diagonal neighborhood:

    P[row, l] = A[row, 128*(row//128) - 128 + l],   l in [0, D)

with D = 512 covering every lane the chase can read or write for b <= 128:
the initial band occupies lanes <= 128 + 127 + b <= 383, and both
eliminations only modify lanes < 511 (right: x + b - 1 <= 383 + 127; left:
xl + 2b - 1 <= 255 + 255 — see their docstrings), so lanes past 511 stay
zero for the whole chase.  (Round 2 ran with D = 640; shrinking to the
proven 512 cut the resident footprint 20% and extended the wavefront
kernel's residency range by the same factor.)  Packing and unpacking are therefore plain 2-D DMA copies per
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

MEASURED OUTCOME: below the HBM kernel's stride cliff (n=3200/b=128) this
kernel runs ~1.4x slower (the masked full-slab VPU arithmetic costs more
than well-hidden DMA round-trips); above the cliff it is ~2x faster.
ROUTING STATUS: superseded by band_chase_stream.py, whose VMEM-resident
tail phase runs the same sweeps in a (2W, 512) contiguous buffer and
measured 3-4x more robust than this (Npad, 640) layout in-session across
3840 <= n <= 4992 (see stream_chase_preferred); this module remains the
home of the shared elimination kernels (_make_v/_right_elim/_left_elim)
and the bitwise differential oracle for the stream kernel's tests.
Ablation at n=3840 (see
PERF_NOTES "VMEM chase cost profile"): left elims ~34 ms, right elims
~32 ms, pack DMAs + memset < 1 ms.  The cost is per-pair latency chains,
not bandwidth — batching the independent elimination lanes of a pipelined
multi-sweep wavefront is the candidate lever, but the naive stacked
formulation measured as a wash; see PERF_NOTES "VMEM chase cost profile".
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

D = 512  # packed width: covers live lanes [1, 512) for b <= 128
WR = 512  # right-elimination working lane width


def _make_v(xrow, x, b, lane):
    """larfg over lanes [x, x+b) of ``xrow`` (pivot at x): (v, tau).

    Row-batched: ``xrow`` may be (L, WR) with per-row pivot lanes ``x``
    (L, 1) — every reduction is per-row, so one sqrt/div chain serves all
    L rows (the wave kernel's construction batching)."""
    dtype = xrow.dtype
    zero = jnp.zeros((), dtype)
    one = jnp.ones((), dtype)
    tail = jnp.logical_and(lane > x, lane < x + b)
    xt = jnp.where(tail, xrow, zero)
    pivot = jnp.sum(jnp.where(lane == x, xrow, zero), axis=-1, keepdims=True)
    sigma2 = jnp.sum(xt * xt, axis=-1, keepdims=True)
    norm = jnp.sqrt(pivot * pivot + sigma2)
    sign = jnp.where(pivot >= 0, one, -one)
    beta = -sign * norm
    trivial = sigma2 == 0
    denom = jnp.where(trivial, one, pivot - beta)
    v = jnp.where(tail, xt / denom, zero) + jnp.where(lane == x, one, zero)
    safe_beta = jnp.where(beta == 0, one, beta)
    tau = jnp.where(trivial, zero, (beta - pivot) / safe_beta)
    return v, tau


def _right_elim(P, b, r, co0, SL, RL):
    """Row reflector: pivot row ``r``, support cols [r+co0, r+co0+b),
    applied to rows [r, r+RL).  The (SL+8)-row slab starts at the 8-row
    boundary below ``r`` (dynamic sublane loads must be tile-aligned).

    Col r+co0+j sits at lane x - 128*zone + j of global row g, where
    x = co0 + r%128 + 128 and zone = g//128 - r//128 in {0,1,2}.

    ``P`` is the packed array (or any row window of it whose row 0 sits at
    a 128-ALIGNED packed row, with ``r`` given window-locally: the x/zone
    arithmetic only depends on row indices mod 128, which such windows
    preserve).
    """
    dtype = P.dtype
    zero = jnp.zeros((), dtype)
    lane_r = lax.broadcasted_iota(jnp.int32, (1, WR), 1)
    r8 = (r // 8) * 8
    ro = r - r8
    x = co0 + lax.rem(r, jnp.int32(128)) + 128
    rows = P[pl.ds(r8, SL + 8), :WR]
    qi = lax.broadcasted_iota(jnp.int32, (SL + 8, 1), 0)
    active = jnp.logical_and(qi >= ro, qi < ro + RL)
    # pivot row lives in the first 8-row group (ro < 8): reduce only it
    prow = jnp.sum(
        jnp.where(qi[:8] == ro, rows[:8], zero), axis=0, keepdims=True
    )
    v0, tau = _make_v(prow, x, b, lane_r)
    v1 = pltpu.roll(v0, WR - 128, 1)  # static: zone-1 copy (128 left)
    v2 = pltpu.roll(v0, WR - 256, 1)  # zone-2 copy
    zone = (r8 + qi) // 128 - r // 128
    Vm = jnp.where(zone == 0, v0, jnp.where(zone == 1, v1, v2))
    Vm = jnp.where(active, Vm, zero)
    u = jnp.sum(rows * Vm, axis=1, keepdims=True)
    P[pl.ds(r8, SL + 8), :WR] = rows - (tau * u) * Vm


def _left_elim(P, b, r1):
    """Column reflector: pivot col ``r1``, support rows [r1, r1+b),
    applied to cols [r1, r1+2b).  Col r1+j sits at lane
    xl - 128*zone + j; zones in {0, 1}.

    All lanes read or written live in [0, WR): live rows (qi in
    [ro1, ro1+b)) have zone in {0, 1}, so modified lanes are
    xl - 128*zone + j <= 255 + 255 = 510 — the slab is loaded and
    stored at WR=512 wide, not the full packed width D.

    Same window-local coordinate contract as :func:`_right_elim`."""
    dtype = P.dtype
    zero = jnp.zeros((), dtype)
    one = jnp.ones((), dtype)
    lane_r = lax.broadcasted_iota(jnp.int32, (1, WR), 1)
    r8 = (r1 // 8) * 8
    ro1 = r1 - r8
    xl = lax.rem(r1, jnp.int32(128)) + 128
    rows = P[pl.ds(r8, b + 8), :WR]
    qi = lax.broadcasted_iota(jnp.int32, (b + 8, 1), 0)
    zone = (r8 + qi) // 128 - r1 // 128  # {-1?, 0, 1}; off-rows masked
    # pivot-column extraction (lane xl - 128*zone per row)
    lofs = xl - 128 * zone
    xcol = jnp.sum(
        jnp.where(lane_r == lofs, rows, zero), axis=1, keepdims=True
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
    csel = jnp.logical_and(lane_r >= xl, lane_r < xl + 2 * b)
    w0 = jnp.where(csel, w0, zero)
    w1 = pltpu.roll(w0, WR - 128, 1)  # zone-1 coords
    Wm = jnp.where(zone == 0, w0, w1)
    P[pl.ds(r8, b + 8), :WR] = rows - (tau * v) * Wm


def _vmem_chase_kernel(n, b, Npad, A_in, d_out, e_out, P, sem):
    """Packed chase over VMEM-resident ``P`` (Npad, D).

    ``A_in`` is the UNPADDED (n, n) band matrix in HBM: padding it to the
    packed width first would give the source a >16 KB row stride, putting
    every pack DMA past the measured stride cliff (~2.6 us/row, ~11 ms
    fixed).  Instead each 128-row block's diagonal window is clipped to
    A's bounds with static sizes (n, D are trace-time constants) and the
    out-of-range remainder is left at the memset zero.  d/e are extracted
    in-kernel into (nb, 128) outputs — the packed array never leaves VMEM.
    """
    w = b + 1
    dtype = P.dtype
    zero = jnp.zeros((), dtype)

    # ---- pack: one clipped rectangular DMA per 128-row block ------------
    # HBM memref slices must be 128-aligned in the lane dim, so A_in is
    # (n128, n128) — the caller pads n up to a 128 multiple (identity for
    # the common 128-aligned sizes), keeping every clip aligned.
    n128 = -(-n // 128) * 128
    P[...] = jnp.zeros(P.shape, dtype)
    for br in range(Npad // 128):
        r0 = 128 * br
        if r0 >= n128:
            continue
        c0 = 128 * br - 128  # window start: one block left of the diagonal
        l0 = max(0, -c0)  # dest lane offset (block 0 has no left block)
        cs = c0 + l0
        cw = min(D - l0, n128 - cs)
        if cw <= 0:
            continue
        cp = pltpu.make_async_copy(
            A_in.at[pl.ds(r0, 128), pl.ds(cs, cw)],
            P.at[pl.ds(r0, 128), pl.ds(l0, cw)],
            sem,
        )
        cp.start()
        cp.wait()

    def right_elim(r, co0, SL, RL):
        _right_elim(P, b, r, co0, SL, RL)

    def left_elim(r1):
        _left_elim(P, b, r1)

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

    # ---- extract d/e: row j's diagonal sits at packed lane 128 + j ------
    # Masking block rows' [128, 384) lane window with (lane == j [+1]) and
    # summing over ROWS leaves d(r0+j) at lane j (e at lane j+1) — already
    # in lane layout, no (128,) -> (1, 128) transpose needed.
    li = lax.broadcasted_iota(jnp.int32, (128, 256), 1)
    ri = lax.broadcasted_iota(jnp.int32, (128, 256), 0)
    for br in range(Npad // 128):
        if 128 * br >= n:
            d_out[br : br + 1, :] = jnp.zeros((1, 128), dtype)
            e_out[br : br + 1, :] = jnp.zeros((1, 128), dtype)
            continue
        blk = P[128 * br : 128 * br + 128, 128:384]
        dsum = jnp.sum(jnp.where(li == ri, blk, zero), axis=0, keepdims=True)
        esum = jnp.sum(
            jnp.where(li == ri + 1, blk, zero), axis=0, keepdims=True
        )
        d_out[br : br + 1, :] = dsum[:, 0:128]
        e_out[br : br + 1, :] = esum[:, 1:129]


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
    nb = Npad // 128
    n128 = -(-n // 128) * 128
    if n128 != n:  # align for the pack DMAs (see kernel docstring)
        A = jnp.pad(A, ((0, n128 - n), (0, n128 - n)))
    d2, e2 = pl.pallas_call(
        functools.partial(_vmem_chase_kernel, n, b, Npad),
        out_shape=(
            jax.ShapeDtypeStruct((nb, 128), dtype),
            jax.ShapeDtypeStruct((nb, 128), dtype),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((Npad, D), dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(A)
    d = d2.reshape(-1)[:n]
    e = e2.reshape(-1)[: n - 1]
    return d, e
