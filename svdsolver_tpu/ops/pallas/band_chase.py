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

from svdsolver_tpu.ops.chase_schedule import nc_of, nc_of_static, s_max_of


def _masked_pair_eliminate(W, ro, co, lp, b):
    """Both eliminations of one chase pair on buffer ``W``; pivot at dynamic
    ``(ro, co)`` with ``ro < 8``, ``co < 128``; left-elimination pivot ``lp``
    rows below (static: 1 for the top pair, ``b`` for chase pairs).

    Right: Householder of row ``ro`` over cols ``[co, co+b)``, applied to all
    rows.  Left: Householder of col ``co`` over rows ``[ro+lp, ro+lp+b)``,
    applied to all cols.  Rows/cols outside the logical window carry zeros in
    the active ranges, so the applies are exact; since ``co + b < b + 128``
    and ``ro + lp + b < lp + b + 8``, each elimination's reads/writes are
    confined to a *static* subrange of the buffer, which roughly halves the
    VPU traffic per pair.
    """
    wr, wc = W.shape
    dtype = W.dtype
    one = jnp.ones((), dtype)
    zero = jnp.zeros((), dtype)

    # --- right elimination (row reflector): touches cols [0, b+128) only ---
    CR = min(b + 128, wc)
    Wr = W[:, :CR]
    ci = lax.broadcasted_iota(jnp.int32, (1, CR), 1)
    ri = lax.broadcasted_iota(jnp.int32, (wr, 1), 0)
    # exact fp32 pivot-row extraction on the VPU (an MXU mask-dot would both
    # cost a 6-pass HIGHEST matmul and round the data)
    xrow = jnp.sum(
        jnp.where(ri == ro, Wr, zero), axis=0, keepdims=True
    )  # (1, CR)
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
    # matvec + rank-1 on the VPU: exact fp32, single pass (the MXU path
    # would cost 6-pass HIGHEST matmuls for K=1/K=b contractions)
    u = jnp.sum(Wr * v, axis=1, keepdims=True)  # (wr, 1)
    parts = [Wr - (tau * u) * v] + ([W[:, CR:]] if CR < wc else [])
    W = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]

    # --- left elimination (column reflector): rows [lp, lp+b+8) only ---
    RL, RH = lp, min(lp + b + 8, wr)
    Ws = W[RL:RH, :]
    nr = RH - RL
    ri2 = lax.broadcasted_iota(jnp.int32, (nr, 1), 0) + RL
    ro2 = ro + lp
    # pivot column extraction needs cols [0, 128) only (co < 128)
    ci2 = lax.broadcasted_iota(jnp.int32, (1, min(128, wc)), 1)
    xcol = jnp.sum(
        jnp.where(ci2 == co, Ws[:, : min(128, wc)], zero),
        axis=1,
        keepdims=True,
    )  # (nr, 1)
    tail2 = jnp.logical_and(ri2 > ro2, ri2 < ro2 + b)
    xt2 = jnp.where(tail2, xcol, zero)
    pivot2 = jnp.sum(jnp.where(ri2 == ro2, xcol, zero))
    sigma2_2 = jnp.sum(xt2 * xt2)
    norm2 = jnp.sqrt(pivot2 * pivot2 + sigma2_2)
    sign2 = jnp.where(pivot2 >= 0, one, -one)
    beta2 = -sign2 * norm2
    trivial2 = sigma2_2 == 0
    denom2 = jnp.where(trivial2, one, pivot2 - beta2)
    v2 = jnp.where(tail2, xt2 / denom2, zero) + jnp.where(ri2 == ro2, one, zero)
    safe_beta2 = jnp.where(beta2 == 0, one, beta2)
    tau2 = jnp.where(trivial2, zero, (beta2 - pivot2) / safe_beta2)
    u2 = jnp.sum(v2 * Ws, axis=0, keepdims=True)  # (1, wc)
    parts = (
        ([W[:RL, :]] if RL > 0 else [])
        + [Ws - (tau2 * v2) * u2]
        + ([W[RH:, :]] if RH < wr else [])
    )
    return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]


def _masked_pair_eliminate_rec(W, ro, co, lp, b):
    """As :func:`_masked_pair_eliminate`, additionally returning the two
    reflectors: ``(W, v_r, tau_r, v_l, tau_l)`` with ``v_r`` the (1, CR) right
    (row) reflector in buffer-aligned form (pivot 1 at lane ``co``) and
    ``v_l`` the (nr, 1) left (column) reflector (pivot at sublane ``ro``
    within the ``[lp, lp+b+8)`` sub-buffer).

    MUST stay arithmetically identical to ``_masked_pair_eliminate`` — the
    differential test asserts bitwise-equal (d, e) between the recording and
    plain kernels.  Kept as a separate function so the non-recording hot path
    carries no record-extraction ops.
    """
    wr, wc = W.shape
    dtype = W.dtype
    one = jnp.ones((), dtype)
    zero = jnp.zeros((), dtype)

    CR = min(b + 128, wc)
    Wr = W[:, :CR]
    ci = lax.broadcasted_iota(jnp.int32, (1, CR), 1)
    ri = lax.broadcasted_iota(jnp.int32, (wr, 1), 0)
    xrow = jnp.sum(jnp.where(ri == ro, Wr, zero), axis=0, keepdims=True)
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
    u = jnp.sum(Wr * v, axis=1, keepdims=True)
    parts = [Wr - (tau * u) * v] + ([W[:, CR:]] if CR < wc else [])
    W = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]

    RL, RH = lp, min(lp + b + 8, wr)
    Ws = W[RL:RH, :]
    nr = RH - RL
    ri2 = lax.broadcasted_iota(jnp.int32, (nr, 1), 0) + RL
    ro2 = ro + lp
    ci2 = lax.broadcasted_iota(jnp.int32, (1, min(128, wc)), 1)
    xcol = jnp.sum(
        jnp.where(ci2 == co, Ws[:, : min(128, wc)], zero),
        axis=1,
        keepdims=True,
    )
    tail2 = jnp.logical_and(ri2 > ro2, ri2 < ro2 + b)
    xt2 = jnp.where(tail2, xcol, zero)
    pivot2 = jnp.sum(jnp.where(ri2 == ro2, xcol, zero))
    sigma2_2 = jnp.sum(xt2 * xt2)
    norm2 = jnp.sqrt(pivot2 * pivot2 + sigma2_2)
    sign2 = jnp.where(pivot2 >= 0, one, -one)
    beta2 = -sign2 * norm2
    trivial2 = sigma2_2 == 0
    denom2 = jnp.where(trivial2, one, pivot2 - beta2)
    v2 = jnp.where(tail2, xt2 / denom2, zero) + jnp.where(ri2 == ro2, one, zero)
    safe_beta2 = jnp.where(beta2 == 0, one, beta2)
    tau2 = jnp.where(trivial2, zero, (beta2 - pivot2) / safe_beta2)
    u2 = jnp.sum(v2 * Ws, axis=0, keepdims=True)
    parts = (
        ([W[:RL, :]] if RL > 0 else [])
        + [Ws - (tau2 * v2) * u2]
        + ([W[RH:, :]] if RH < wr else [])
    )
    W = jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
    return W, v, tau, v2, tau2


def _chase_kernel_rec(
    n, b, s_max,
    A_in,
    A_out, VRr, VLr,
    W, RVR, RVL,
    sem_full, sem_w, sems_rec,
):
    """Sequential chase kernel that also RECORDS every reflector.

    Records accumulate in small VMEM scratch buffers (one row per slot of the
    current sweep) and flush to the HBM outputs once per sweep — so record
    traffic adds 2 DMA issues per *sweep* against the data path's 2 per
    *pair*, keeping the kernel's measured DMA-issue bound intact.

    Record layout (2-D, row ``i*s_max + s``; reshaped to (n-1, s_max, b) by
    the host wrapper): reflectors are CANONICALIZED in-kernel — a dynamic
    lane rotate (``pltpu.roll``) moves the pivot to lane 0, so
    ``VRr/VLr[i*s_max+s, :b]`` is exactly the reflector over its support
    ``[i+1+s*b, i+1+(s+1)*b)``.  Host-side shifting is not an option: both a
    lane gather (costs as much as the whole chase, 83 ms vs 85 ms at n=2048)
    and its grouped static-slice equivalent (miscompiles) lost to this.

    Taus are NOT recorded: the wrapper recovers them from the larfg identity
    ``tau = 2 / (v^T v)`` (exact: v^T v = 1 + ||tail||^2 = 2*beta*(beta -
    alpha)/(alpha-beta)^2 gives (beta-alpha)/beta).  Stale-slot guard: the v
    scratch is zeroed per sweep, and an all-zero record maps to tau = 0 —
    an exact no-op in the back-transform.
    """
    wr = 2 * b + 8
    wc = -(-2 * b // 128) * 128 + 128
    w = b + 1
    CR = min(b + 128, wc)
    CRA = -(-CR // 128) * 128  # dynamic_rotate needs lane-aligned shapes
    RW = VRr.shape[1]
    dtype = A_out.dtype
    nr = b + 8

    full = pltpu.make_async_copy(A_in, A_out, sem_full)
    full.start()
    full.wait()

    cj_l = lax.broadcasted_iota(jnp.int32, (nr, CRA), 1)
    ri_l = lax.broadcasted_iota(jnp.int32, (nr, CRA), 0)

    per_sweep_roll = b % 128 == 0

    def do_pair(pr, pc, lp, s):
        r0 = (pr // 8) * 8
        c0 = (pc // 128) * 128
        cin = pltpu.make_async_copy(
            A_out.at[pl.ds(r0, wr), pl.ds(c0, wc)], W.at[:wr, :wc], sem_w
        )
        cin.start()
        cin.wait()
        Wn, vr, tr, vl, tl = _masked_pair_eliminate_rec(
            W[:wr, :wc], pr - r0, pc - c0, lp, b
        )
        W[:wr, :wc] = Wn
        # canonicalization (pivot to lane 0; v is zero outside its support, so
        # the circular wrap brings in only zeros): when b % 128 == 0, the lane
        # offset is sweep-invariant and the rotate happens ONCE per sweep on
        # the whole record buffer (see sweep below) — per-pair dynamic rotates
        # measured ~12 us/pair of pure overhead.
        if CRA > CR:
            vr = jnp.concatenate(
                [vr, jnp.zeros((1, CRA - CR), dtype)], axis=1
            )
        if not per_sweep_roll:
            vr = pltpu.roll(vr, -(pc - c0), axis=1)
        # column -> row transpose via mask-reduce on the VPU (Mosaic has no
        # cheap (nr, 1) transpose); vl row j = vl column entry j
        vl_row = jnp.sum(
            jnp.where(cj_l == ri_l, vl, jnp.zeros((), dtype)),
            axis=0,
            keepdims=True,
        )
        if not per_sweep_roll:
            vl_row = pltpu.roll(vl_row, -(pr - r0), axis=1)
        # trivial reflectors must record as ZERO rows (not e0): the host maps
        # an all-zero record to tau = 0; e0 would map to tau = 2
        vr = jnp.where(tr == 0, jnp.zeros((), dtype), vr)
        vl_row = jnp.where(tl == 0, jnp.zeros((), dtype), vl_row)
        RVR[pl.ds(s, 1), :] = vr
        RVL[pl.ds(s, 1), :] = vl_row
        cout = pltpu.make_async_copy(
            W.at[:wr, :wc], A_out.at[pl.ds(r0, wr), pl.ds(c0, wc)], sem_w
        )
        cout.start()
        cout.wait()

    def sweep(i, carry):
        RVR[:] = jnp.zeros(RVR.shape, dtype)
        RVL[:] = jnp.zeros(RVL.shape, dtype)
        # slot index must be a traced value: a constant pl.ds start here (with
        # traced ones in the chase loop below) trips a PyTreeDef mismatch in
        # the Mosaic swap lowering
        do_pair(i, i + 1, 1, i * 0)
        n_chase = nc_of(i, n, b)

        def chase(k, carry):
            r = i + 1 + k * b
            do_pair(r, r + b, b, k + 1)
            return carry

        lax.fori_loop(jnp.int32(0), n_chase, chase, carry)
        if per_sweep_roll:  # noqa: SIM108 — traced-index store quirk below
            # One rotate for the whole sweep's records.  All chase slots share
            # lane offset co = (i+1) % 128 and ro = (i+1) % 8 (b % 128 == 0);
            # the top slot's left offset is i % 8 = ro - 1 shifted one extra.
            co = lax.rem(i + 1, jnp.int32(128))
            ro = lax.rem(i + 1, jnp.int32(8))
            RVR[:] = pltpu.roll(RVR[:], -co, axis=1)
            vl_all = pltpu.roll(RVL[:], -ro, axis=1)
            top_fix = pltpu.roll(
                RVL[pl.ds(i * 0, 1), :], -lax.rem(i, jnp.int32(8)), axis=1
            )
            RVL[:] = vl_all
            RVL[pl.ds(i * 0, 1), :] = top_fix
        row = i * s_max
        flushes = [
            pltpu.make_async_copy(
                RVR.at[:, pl.ds(0, RW)],
                VRr.at[pl.ds(row, s_max)],
                sems_rec.at[0],
            ),
            pltpu.make_async_copy(
                RVL.at[:, pl.ds(0, RW)],
                VLr.at[pl.ds(row, s_max)],
                sems_rec.at[1],
            ),
        ]
        for cp in flushes:
            cp.start()
        for cp in flushes:
            cp.wait()
        return carry

    lax.fori_loop(jnp.int32(0), jnp.int32(n - 1), sweep, 0)


def _chase_kernel(n, b, K, A_in, A_out, W, sem_full, sem_w):
    """K-hop chase kernel: each DMA'd mega-window covers K consecutive chase
    pairs, eliminated on aligned static sub-views — K-fold fewer DMA issues
    (the dominant cost) for ~(K+1)/2K x the per-pair transfer volume.
    ``K > 1`` requires ``b % 128 == 0`` so sub-view offsets m*b stay aligned.
    """
    wr = 2 * b + 8          # single-pair superset rows
    wc = -(-2 * b // 128) * 128 + 128
    mr = (K + 1) * b + 8    # mega-window rows
    mc = -(-(K + 1) * b // 128) * 128 + 128
    w = b + 1

    # Bring the input band matrix into the (separately allocated) output.
    full = pltpu.make_async_copy(A_in, A_out, sem_full)
    full.start()
    full.wait()

    def do_top(pr, pc):
        r0 = (pr // 8) * 8
        c0 = (pc // 128) * 128
        cin = pltpu.make_async_copy(
            A_out.at[pl.ds(r0, wr), pl.ds(c0, wc)], W.at[:wr, :wc], sem_w
        )
        cin.start()
        cin.wait()
        W[:wr, :wc] = _masked_pair_eliminate(
            W[:wr, :wc], pr - r0, pc - c0, 1, b
        )
        cout = pltpu.make_async_copy(
            W.at[:wr, :wc], A_out.at[pl.ds(r0, wr), pl.ds(c0, wc)], sem_w
        )
        cout.start()
        cout.wait()

    def do_mega(pr, pc):
        """K chase pairs pivoted at (pr + m*b, pc + m*b), one DMA round-trip.
        Hops past the sweep's true chase count land in zero regions, where
        the masked eliminations are exact no-ops."""
        r0 = (pr // 8) * 8
        c0 = (pc // 128) * 128
        cin = pltpu.make_async_copy(
            A_out.at[pl.ds(r0, mr), pl.ds(c0, mc)], W, sem_w
        )
        cin.start()
        cin.wait()
        ro = pr - r0
        co = pc - c0
        for m in range(K):
            sub = W[m * b : m * b + wr, m * b : m * b + wc]
            W[m * b : m * b + wr, m * b : m * b + wc] = (
                _masked_pair_eliminate(sub, ro, co, b, b)
            )
        cout = pltpu.make_async_copy(
            W, A_out.at[pl.ds(r0, mr), pl.ds(c0, mc)], sem_w
        )
        cout.start()
        cout.wait()

    def sweep(i, carry):
        do_top(i, i + 1)  # top pair (band_rd_top)
        n_chase = nc_of(i, n, b)
        n_mega = -(-n_chase // K)

        def chase(mk, carry):
            r = i + 1 + mk * (K * b)
            do_mega(r, r + b)
            return carry

        return lax.fori_loop(jnp.int32(0), n_mega, chase, carry)

    # int32 bounds: Pallas cannot lower the int64 indices x64 mode produces
    lax.fori_loop(jnp.int32(0), jnp.int32(n - 1), sweep, 0)


def _chase_kernel_pipelined(n, b, A_in, A_out, Wb, sem_full, sem_t, sems_s, sems_o):
    """Software-pipelined chase (requires ``b % 128 == 0``).

    Along one sweep the alignment phases (pr % 8, pc % 128) are invariant, so
    consecutive windows overlap in a *statically*-placed (b, b) quadrant:
    window k+1's buffer is assembled from a VMEM shift of window k's computed
    buffer plus two L-strip DMAs (bottom (b, wc) rows, right (wr-b, b) cols).
    With 4 rotating buffers the strip DMAs for window k+2 and the write-back
    of window k fly during compute of window k, leaving compute + the VMEM
    carry on the critical path.

    Arithmetic and schedule are identical to the sequential kernel —
    validated bitwise against it.
    """
    wr = 2 * b + 8
    wc = -(-2 * b // 128) * 128 + 128
    w = b + 1

    full = pltpu.make_async_copy(A_in, A_out, sem_full)
    full.start()
    full.wait()

    def do_top(pr, pc):
        r0 = (pr // 8) * 8
        c0 = (pc // 128) * 128
        cin = pltpu.make_async_copy(
            A_out.at[pl.ds(r0, wr), pl.ds(c0, wc)], Wb.at[0], sem_t
        )
        cin.start()
        cin.wait()
        Wb[0] = _masked_pair_eliminate(Wb[0], pr - r0, pc - c0, 1, b)
        cout = pltpu.make_async_copy(
            Wb.at[0], A_out.at[pl.ds(r0, wr), pl.ds(c0, wc)], sem_t
        )
        cout.start()
        cout.wait()

    def sweep(i, carry):
        do_top(i, i + 1)
        n_chase = nc_of(i, n, b)
        r0_0 = ((i + 1) // 8) * 8          # aligned corners of window 0
        c0_0 = ((i + 1 + b) // 128) * 128  # advance by b per window

        def win_r0(k):
            return pl.multiple_of(r0_0 + k * b, 8)

        def win_c0(k):
            return pl.multiple_of(c0_0 + k * b, 128)

        def slot(k):
            return lax.rem(k, 4)

        def full_in(k):
            return pltpu.make_async_copy(
                A_out.at[pl.ds(win_r0(k), wr), pl.ds(win_c0(k), wc)],
                Wb.at[slot(k)],
                sem_t,
            )

        def strips(k):
            """L-strip copies completing window k's buffer (its top-left
            quadrant arrives via the VMEM carry)."""
            bottom = pltpu.make_async_copy(
                A_out.at[pl.ds(win_r0(k) + (wr - b), b), pl.ds(win_c0(k), wc)],
                Wb.at[slot(k), pl.ds(wr - b, b), :],
                sems_s.at[slot(k), 0],
            )
            right = pltpu.make_async_copy(
                A_out.at[
                    pl.ds(win_r0(k), wr - b), pl.ds(win_c0(k) + (wc - b), b)
                ],
                Wb.at[slot(k), pl.ds(0, wr - b), pl.ds(wc - b, b)],
                sems_s.at[slot(k), 1],
            )
            return bottom, right

        def out(k):
            return pltpu.make_async_copy(
                Wb.at[slot(k)],
                A_out.at[pl.ds(win_r0(k), wr), pl.ds(win_c0(k), wc)],
                sems_o.at[slot(k)],
            )

        # prologue: window 0 fully; strips for windows 1 and 2 in flight
        fi = full_in(0)
        fi.start()
        fi.wait()
        for cp in strips(1):
            cp.start()
        ro = (i + 1) - r0_0
        co = (i + 1 + b) - c0_0

        def body(k, carry):
            # strips(k) were issued two iterations ago (or in the prologue)
            @pl.when(k > 0)
            def _():
                b_cp, r_cp = strips(k)
                b_cp.wait()
                r_cp.wait()

            Wb[slot(k)] = _masked_pair_eliminate(Wb[slot(k)], ro, co, b, b)

            # the buffers carry/strips(k+2) touch were last read by out(k-2)
            @pl.when(k >= 2)
            def _():
                out(k - 2).wait()

            # carry the overlap quadrant into window k+1's buffer
            Wb[slot(k + 1), pl.ds(0, wr - b), pl.ds(0, wc - b)] = Wb[
                slot(k), pl.ds(b, wr - b), pl.ds(b, wc - b)
            ]
            out(k).start()
            for cp in strips(k + 2):
                cp.start()
            return carry

        lax.fori_loop(jnp.int32(0), n_chase, body, carry)
        # epilogue: drain the last two write-backs and the overshoot strips
        out_last = out(n_chase - 1)
        out_last.wait()

        @pl.when(n_chase >= 2)
        def _():
            out(n_chase - 2).wait()

        b_cp, r_cp = strips(n_chase)
        b_cp.wait()
        r_cp.wait()
        b_cp2, r_cp2 = strips(n_chase + 1)
        b_cp2.wait()
        r_cp2.wait()
        return carry

    lax.fori_loop(jnp.int32(0), jnp.int32(n - 1), sweep, 0)


def _chase_kernel_megapipe(n, b, K, A_in, A_out, Wb, Wp, sem_full, sem_t, sems_s, sems_o):
    """Mega-window software-pipelined chase (requires ``b % 128 == 0``).

    Each DMA'd mega-window covers ``K`` consecutive chase pairs of one sweep.
    Three fixes over the measured dead ends (PERF_NOTES):

    * every pair is eliminated on a dedicated aligned (wr, wc) scratch ``Wp``
      (two whole-buffer VMEM copies at static 128-aligned offsets) instead of
      in place on a mega-buffer sub-view — the sub-view RMW cost that sank
      the original K-hop kernel;
    * consecutive mega-windows overlap by a (b+8, b+128) quadrant, which is
      carried VMEM->VMEM (static shift: hop advance K*b is lane-aligned), so
      the in-DMAs shrink to two disjoint L-strips;
    * two rotating buffers let the write-back of mega k and the strips of
      mega k+1 fly during mega k+1's compute — 3 DMA issues per K pairs
      (the sequential kernel pays 2 per pair).

    Hazard discipline (all regions verified disjoint): strips(k+1) reads HBM
    rows/cols starting exactly where out(k)'s write region ends; out(k) is
    waited before the carry into its slot's successor; overlapping writes
    out(k), out(k+1) are ordered by the same wait.
    """
    wr = 2 * b + 8
    wc = -(-2 * b // 128) * 128 + 128
    mr = (K + 1) * b + 8
    mc = (K + 1) * b + 128
    w = b + 1

    full = pltpu.make_async_copy(A_in, A_out, sem_full)
    full.start()
    full.wait()

    def do_top(pr, pc):
        r0 = (pr // 8) * 8
        c0 = (pc // 128) * 128
        cin = pltpu.make_async_copy(
            A_out.at[pl.ds(r0, wr), pl.ds(c0, wc)], Wp, sem_t
        )
        cin.start()
        cin.wait()
        Wp[:] = _masked_pair_eliminate(Wp[:], pr - r0, pc - c0, 1, b)
        cout = pltpu.make_async_copy(
            Wp, A_out.at[pl.ds(r0, wr), pl.ds(c0, wc)], sem_t
        )
        cout.start()
        cout.wait()

    def sweep(i, carry):
        do_top(i, i + 1)
        n_chase = nc_of(i, n, b)
        n_mega = -(-n_chase // K)
        r0 = pl.multiple_of(((i + 1) // 8) * 8, 8)
        c0 = pl.multiple_of(((i + 1 + b) // 128) * 128, 128)
        ro = (i + 1) - r0
        co = (i + 1 + b) - c0

        def win_r(k):
            return pl.multiple_of(r0 + k * (K * b), 8)

        def win_c(k):
            return pl.multiple_of(c0 + k * (K * b), 128)

        def slot(k):
            return lax.rem(k, 2)

        def strips(k):
            """The part of mega k's buffer not covered by the carried
            (b+8, b+128) top-left quadrant: bottom rows + top-right block."""
            bottom = pltpu.make_async_copy(
                A_out.at[pl.ds(win_r(k) + (b + 8), mr - (b + 8)), pl.ds(win_c(k), mc)],
                Wb.at[slot(k), pl.ds(b + 8, mr - (b + 8)), :],
                sems_s.at[slot(k), 0],
            )
            right = pltpu.make_async_copy(
                A_out.at[
                    pl.ds(win_r(k), b + 8), pl.ds(win_c(k) + (b + 128), mc - (b + 128))
                ],
                Wb.at[slot(k), pl.ds(0, b + 8), pl.ds(b + 128, mc - (b + 128))],
                sems_s.at[slot(k), 1],
            )
            return bottom, right

        def out(k):
            return pltpu.make_async_copy(
                Wb.at[slot(k)],
                A_out.at[pl.ds(win_r(k), mr), pl.ds(win_c(k), mc)],
                sems_o.at[slot(k)],
            )

        # prologue: mega 0 arrives whole
        fi = pltpu.make_async_copy(
            A_out.at[pl.ds(win_r(0), mr), pl.ds(win_c(0), mc)], Wb.at[0], sem_t
        )
        fi.start()
        fi.wait()

        def body(k, carry):
            @pl.when(k > 0)
            def _():
                bcp, rcp = strips(k)
                bcp.wait()
                rcp.wait()

            s = slot(k)
            for m in range(K):
                Wp[:] = Wb[s, pl.ds(m * b, wr), pl.ds(m * b, wc)]
                Wp[:] = _masked_pair_eliminate(Wp[:], ro, co, b, b)
                Wb[s, pl.ds(m * b, wr), pl.ds(m * b, wc)] = Wp[:]

            # out(k-1) read this slot's successor buffer; it must land before
            # the carry overwrites it (also orders overlapping HBM writes)
            @pl.when(k > 0)
            def _():
                out(k - 1).wait()

            Wb[slot(k + 1), pl.ds(0, b + 8), pl.ds(0, b + 128)] = Wb[
                s, pl.ds(K * b, b + 8), pl.ds(K * b, b + 128)
            ]
            out(k).start()
            bcp, rcp = strips(k + 1)
            bcp.start()
            rcp.start()
            return carry

        lax.fori_loop(jnp.int32(0), n_mega, body, carry)
        # epilogue: drain the final write-back and the overshoot strips
        out(n_mega - 1).wait()
        bcp, rcp = strips(n_mega)
        bcp.wait()
        rcp.wait()
        return carry

    lax.fori_loop(jnp.int32(0), jnp.int32(n - 1), sweep, 0)


def _wavefront_kernel(n, b, s_max, n_lanes, A_in, A_out, Wb, sem_full, sems):
    """Pipelined-sweep chase: the wavefront schedule (sweep i's slot s at
    tick 3i+s — see models/two_stage.band_to_bidiagonal_wavefront for the
    disjointness proof) with one VMEM buffer per concurrent lane.  All lane
    DMAs of a tick are issued before any is awaited, so HBM latency is paid
    once per tick instead of once per elimination pair.

    Lane 0 is the (at most one) top pair of the tick; lanes 1..n_lanes-1 are
    chase pairs of the in-flight sweeps.  Inactive lanes are redirected to an
    all-zero aligned dummy corner where the masked eliminations are exact
    no-ops.  Lanes' logical windows are disjoint, but an aligned *superset*
    can cover a cell another lane modified this tick (the top lane's superset
    always reaches chase lane 1's pivot row), so write-backs are ordered
    lane 0 -> G: a later lane's buffer holds the fresh value of every cell it
    modified, and for band >= 16 no later lane's superset reaches an earlier
    lane's modified cells.
    """
    wr = 2 * b + 8
    wc = -(-2 * b // 128) * 128 + 128
    w = b + 1
    Np = A_out.shape[0]
    dummy_r = jnp.int32(Np - wr)
    dummy_c = jnp.int32(Np - wc)

    full = pltpu.make_async_copy(A_in, A_out, sem_full)
    full.start()
    full.wait()

    def lane_pos(t, j):
        """(r0, c0, ro, co) for lane j at tick t (dummy when inactive)."""
        if j == 0:
            i0 = t // 3
            ok = jnp.logical_and(t % 3 == 0, i0 <= n - 2)
            pr, pc = i0, i0 + 1
        else:
            q = (t - 1) // 3
            iv = q - (j - 1)
            sv = t - 3 * iv
            nch = (
                jnp.maximum(
                    jnp.int32(0), -(-(jnp.int32(n) - (iv + 2 * w - 1)) // b)
                )
                + 1
            )
            ok = (iv >= 0) & (iv <= n - 2) & (sv >= 1) & (sv <= nch)
            pr = iv + 1 + (sv - 1) * b
            pc = pr + b
        r0 = jnp.where(ok, (pr // 8) * 8, dummy_r)
        c0 = jnp.where(ok, (pc // 128) * 128, dummy_c)
        ro = jnp.where(ok, pr - r0, 0)
        co = jnp.where(ok, pc - c0, 0)
        # the select obscures divisibility from Mosaic; both arms are aligned
        return pl.multiple_of(r0, 8), pl.multiple_of(c0, 128), ro, co

    def tick(t, carry):
        pos = [lane_pos(t, j) for j in range(n_lanes)]
        copies_in = [
            pltpu.make_async_copy(
                A_out.at[pl.ds(pos[j][0], wr), pl.ds(pos[j][1], wc)],
                Wb.at[j],
                sems.at[j],
            )
            for j in range(n_lanes)
        ]
        for cp in copies_in:
            cp.start()
        for cp in copies_in:
            cp.wait()
        for j in range(n_lanes):
            lp = 1 if j == 0 else b
            Wb[j] = _masked_pair_eliminate(Wb[j], pos[j][2], pos[j][3], lp, b)
        # Write-backs are ORDERED (start+wait per lane): lanes' logical
        # windows are disjoint, but their aligned supersets are not — a
        # lane's stale superset cell can cover a cell another lane modified
        # this tick (top lane vs chase lane 1 always; adjacent chase lanes
        # at band=8), and concurrent DMAs have no completion-order guarantee.
        # Later lanes modify later-pivot cells, so lane order j=0..G writes
        # every modified cell last from the buffer that computed it.
        for j in range(n_lanes):
            cp = pltpu.make_async_copy(
                Wb.at[j],
                A_out.at[pl.ds(pos[j][0], wr), pl.ds(pos[j][1], wc)],
                sems.at[j],
            )
            cp.start()
            cp.wait()
        return carry

    T = 3 * (n - 2) + s_max + 1
    lax.fori_loop(jnp.int32(0), jnp.int32(T), tick, 0)


def band_to_bidiagonal_pallas(
    A, band=128, wavefront=False, pipelined=False, mega=False, khops=4
):
    """Band -> bidiagonal chase, single Pallas launch; returns (d, e).

    Default: the sequential window kernel — measured fastest.  The chase is
    DMA-descriptor-row bound (~4.6 ns per transferred row; PERF_NOTES), and
    total rows 2*(2b+8)*n^2/(2b) ~ 2n^2 are invariant to the windowing
    scheme, so the pipelined/mega/wavefront variants (kept behind flags,
    all differential-validated) only add VMEM-copy rows on top.
    """
    # x64 mode sends the trace into an int-promotion recursion inside Mosaic
    # lowering; the kernel is 32-bit only, so trace it with x64 off.
    with jax.enable_x64(False):
        if wavefront:
            return _band_to_bidiagonal_pallas_wf(A, band=band)
        if pipelined and band % 128 == 0:
            return _band_to_bidiagonal_pallas_pipe(A, band=band)
        if mega and band % 128 == 0 and khops > 1:
            return _band_to_bidiagonal_pallas_mega(A, band=band, khops=khops)
        return _band_to_bidiagonal_pallas(A, band=band)


def band_to_bidiagonal_pallas_accum(A, band=128):
    """Reflector-recording chase, single Pallas launch; returns
    ``(d, e, VL, TL, VR, TR)`` with the same record convention as
    models/two_stage.band_to_bidiagonal_accum (reflector (i, s) supported on
    rows/cols ``[i+1+s*band, i+1+(s+1)*band)``), consumable by
    models/vectors._apply_chase_reflectors.

    Same elimination arithmetic as :func:`band_to_bidiagonal_pallas`
    (bitwise-equal d/e, differential-tested); the records ride along in VMEM
    and flush once per sweep, so the full-SVD path keeps the single-launch
    chase speed instead of falling back to the per-window XLA accumulator.
    """
    with jax.enable_x64(False):
        return _band_to_bidiagonal_pallas_accum(A, band=band)


@functools.partial(jax.jit, static_argnames=("band",))
def _band_to_bidiagonal_pallas_accum(A, band=128):
    n = A.shape[0]
    b = int(band)
    dtype = A.dtype
    if n < 2:
        raise ValueError("band_to_bidiagonal_pallas_accum needs n >= 2")
    if b % 8 != 0:
        raise ValueError(
            f"band={b} must be a multiple of 8; use "
            "models.two_stage.band_to_bidiagonal_accum otherwise"
        )
    w = b + 1
    wr = 2 * b + 8
    wc = -(-2 * b // 128) * 128 + 128
    RW = -(-b // 128) * 128
    CRA = -(-min(b + 128, wc) // 128) * 128
    s_max = s_max_of(n, b)
    # sublane-align the per-sweep record block (Mosaic rejects unaligned
    # dim-0 slices); the pad slots stay zero -> tau 0 -> back-transform no-ops
    s_pad = -(-s_max // 8) * 8
    pad = b + wc + 16
    Ap = jnp.pad(A, ((0, pad), (0, pad)))
    Np = n + pad

    out, VRr, VLr = pl.pallas_call(
        functools.partial(_chase_kernel_rec, n, b, s_pad),
        out_shape=[
            jax.ShapeDtypeStruct((Np, Np), dtype),
            jax.ShapeDtypeStruct(((n - 1) * s_pad, RW), dtype),
            jax.ShapeDtypeStruct(((n - 1) * s_pad, RW), dtype),
        ],
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * 3,
        scratch_shapes=[
            pltpu.VMEM((wr, wc), dtype),
            pltpu.VMEM((s_pad, CRA), dtype),
            pltpu.VMEM((s_pad, CRA), dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(Ap)
    B = out[:n, :n]
    VR = VRr.reshape(n - 1, s_pad, RW)[:, :s_max, :b]
    VL = VLr.reshape(n - 1, s_pad, RW)[:, :s_max, :b]

    def tau_from_v(V):
        """larfg identity: tau = 2 / (v^T v) = (beta-alpha)/beta; all-zero
        records (stale/trivial slots) map to tau = 0."""
        nrm2 = jnp.sum(V * V, axis=-1)
        return jnp.where(nrm2 == 0, jnp.zeros((), dtype), 2.0 / nrm2)

    return jnp.diag(B), jnp.diag(B, 1), VL, tau_from_v(VL), VR, tau_from_v(VR)


@functools.partial(jax.jit, static_argnames=("band", "khops"))
def _band_to_bidiagonal_pallas_mega(A, band=128, khops=4):
    """Mega-window pipelined chase; band % 128 == 0; same arithmetic and
    schedule as the sequential kernel (differential-tested)."""
    n = A.shape[0]
    b = int(band)
    K = int(khops)
    dtype = A.dtype
    if n < 2:
        return jnp.abs(jnp.diag(A)), jnp.zeros((0,), dtype)
    wr = 2 * b + 8
    wc = -(-2 * b // 128) * 128 + 128
    mr = (K + 1) * b + 8
    mc = (K + 1) * b + 128
    # Overshoot: the last mega (and its prefetched strips) may extend up to
    # (2K+1) hops past the final genuine pivot — keep them in zero padding.
    pad = (2 * K + 3) * b + mc + 128
    Ap = jnp.pad(A, ((0, pad), (0, pad)))
    Np = n + pad

    out = pl.pallas_call(
        functools.partial(_chase_kernel_megapipe, n, b, K),
        out_shape=jax.ShapeDtypeStruct((Np, Np), dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((2, mr, mc), dtype),
            pltpu.VMEM((wr, wc), dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(Ap)
    B = out[:n, :n]
    return jnp.diag(B), jnp.diag(B, 1)


@functools.partial(jax.jit, static_argnames=("band",))
def _band_to_bidiagonal_pallas_pipe(A, band=128):
    """Software-pipelined chase; band % 128 == 0; bitwise-equal results to
    the sequential kernel."""
    n = A.shape[0]
    b = int(band)
    dtype = A.dtype
    if n < 2:
        return jnp.abs(jnp.diag(A)), jnp.zeros((0,), dtype)
    wr = 2 * b + 8
    wc = -(-2 * b // 128) * 128 + 128
    pad = 3 * b + wc + 160
    Ap = jnp.pad(A, ((0, pad), (0, pad)))
    Np = n + pad

    out = pl.pallas_call(
        functools.partial(_chase_kernel_pipelined, n, b),
        out_shape=jax.ShapeDtypeStruct((Np, Np), dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((4, wr, wc), dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((4, 2)),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(Ap)
    B = out[:n, :n]
    return jnp.diag(B), jnp.diag(B, 1)


@functools.partial(jax.jit, static_argnames=("band",))
def _band_to_bidiagonal_pallas_wf(A, band=128):
    """Wavefront-pipelined Pallas chase; fp32, returns (d, e)."""
    n = A.shape[0]
    b = int(band)
    dtype = A.dtype
    if n < 2:
        return jnp.abs(jnp.diag(A)), jnp.zeros((0,), dtype)
    if b % 8 != 0 or b < 16:
        # b >= 16 guarantees adjacent chase lanes' aligned supersets cannot
        # reach each other's modified cells (3b-1 >= (2b+8)+7); the remaining
        # top-vs-chase superset overlap is handled by ordered write-backs.
        raise ValueError(f"band={b} must be a multiple of 8 and >= 16")
    w = b + 1
    wr = 2 * b + 8
    wc = -(-2 * b // 128) * 128 + 128
    s_max = nc_of_static(0, n, b)
    n_lanes = (s_max + 2) // 3 + 2  # chase lanes + the top lane
    # pad so genuine windows fit and Np is 128-aligned (aligned dummy corner)
    base_pad = b + wc + 80
    Np = -(-(n + base_pad) // 128) * 128
    Ap = jnp.pad(A, ((0, Np - n), (0, Np - n)))

    out = pl.pallas_call(
        functools.partial(_wavefront_kernel, n, b, s_max, n_lanes),
        out_shape=jax.ShapeDtypeStruct((Np, Np), dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((n_lanes, wr, wc), dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((n_lanes,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(Ap)
    B = out[:n, :n]
    return jnp.diag(B), jnp.diag(B, 1)


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
    K = 1  # measured: K=3 mega-windows cost more VMEM RMW than they save in DMA
    mr = (K + 1) * b + 8
    mc = -(-(K + 1) * b // 128) * 128 + 128
    # Padding: max col window end = c_max + mc <= n + b - 1 + mc.
    pad = b + mc + 16
    Ap = jnp.pad(A, ((0, pad), (0, pad)))
    Np = n + pad

    out = pl.pallas_call(
        functools.partial(_chase_kernel, n, b, K),
        out_shape=jax.ShapeDtypeStruct((Np, Np), dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((mr, mc), dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(Ap)
    B = out[:n, :n]
    return jnp.diag(B), jnp.diag(B, 1)
