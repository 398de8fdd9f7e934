"""Wavefront-batched VMEM-resident packed-band chase.

The VMEM chase (band_chase_vmem.py) is bound by per-pair LATENCY CHAINS —
~0.7 us of serial larfg sqrt/div chain per elimination pair out of ~1.4 us
total (PERF_NOTES "VMEM chase cost profile") — not by bandwidth or op count.
This kernel amortizes those chains across the independent elimination lanes
of the pipelined-sweep wavefront schedule (sweep i's op k at tick 3i + k;
same schedule as models/two_stage.band_to_bidiagonal_wavefront, where its
bitwise-equivalence to the sequential order is established).

Per the round-2 probe (PERF_NOTES "Wavefront batching"), STACKING the lanes'
slabs into one big batched op is a wash: the gather/scatter scratch copies
cost what the batching saves.  This kernel batches ONLY the reflector-
construction math — the part with genuine serial latency — and leaves every
slab in place:

* tick T, hop lanes l = 0..L-1 handle sweeps i_l = floor((T-1)/3) - l at
  hops k_l = T - 3*i_l; pivot ROWS gather into an (Lp, 512) buffer (one
  masked 8-row reduce per active lane), then ONE batched larfg builds all
  L right reflectors — a single sqrt/div chain per tick instead of per lane;
* applies stay per-lane (predicated `pl.when`, slabs load/store in place,
  exactly the vmem kernel's arithmetic);
* left pivot COLUMNS extract into a (b+8, 128) lane buffer — fused into
  the right applies (the column is the static tail of the right slab, so
  it reads from registers: 3 slab accesses/pair instead of 4); one batched
  column larfg builds all L left reflectors; applies again per-lane.
* the sweep HEAD (k = 0, support at column offset 1 instead of b, at most
  one per tick) rides slot L of the same batched larfgs (its pivot lane /
  sublane override the hop formulas there); only its two applies and its
  column extract stay scalar under `pl.when(T % 3 == 0)`.

Measured (n=3840, b=128, same-process 5-rep A/B): extract fusion
60.3 -> 56.4 ms, head batching -> 55.3 ms; d/e bitwise-identical to the
sequential VMEM kernel throughout.

Disjointness at a tick: consecutive active lanes' pivot rows differ by
3b - 1 while a pair's touched span is < 2b + 16 rows, and the head spans
< b + 16 rows ending >= 8 rows before lane 0's slab — all slabs disjoint for
b >= 32 (gate).  Same packed layout, elimination arithmetic, and d/e
extraction as band_chase_vmem (shared code); differential-tested against it.

Reference provenance: same output class as brd_p2 (svd_parallel.h:639); the
schedule realizes the reference's `Tracker` lookahead intent
(svd_parallel.h:56) at elimination-pair granularity.
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from svdsolver_tpu.ops.pallas.band_chase_vmem import (
    D,
    WR,
    _left_elim,
    _make_v,
    _right_elim,
)

LANE_PAD = 8  # sublane padding of the pivot-row batch buffer


from svdsolver_tpu.ops.chase_schedule import nc_of as _nc_of
from svdsolver_tpu.ops.chase_schedule import s_max_of as _s_max_of


def _right_apply(P, b, r, v0, tau, SL, RL):
    """Apply half of band_chase_vmem._right_elim: reflector ``(v0, tau)``
    (zone-0 lane coords) applied to rows [r, r+RL) of the packed array."""
    dtype = P.dtype
    zero = jnp.zeros((), dtype)
    r8 = (r // 8) * 8
    ro = r - r8
    rows = P[pl.ds(r8, SL + 8), :WR]
    qi = lax.broadcasted_iota(jnp.int32, (SL + 8, 1), 0)
    active = jnp.logical_and(qi >= ro, qi < ro + RL)
    v1 = pltpu.roll(v0, WR - 128, 1)
    v2 = pltpu.roll(v0, WR - 256, 1)
    zone = (r8 + qi) // 128 - r // 128
    Vm = jnp.where(zone == 0, v0, jnp.where(zone == 1, v1, v2))
    Vm = jnp.where(active, Vm, zero)
    u = jnp.sum(rows * Vm, axis=1, keepdims=True)
    P[pl.ds(r8, SL + 8), :WR] = rows - (tau * u) * Vm


def _right_apply_xcol(P, b, r, v0, tau):
    """_right_apply (SL = RL = 2b) fused with the NEXT left elimination's
    pivot-column extraction.

    Region algebra: the right slab spans packed rows [r8, r8 + 2b + 8); the
    left pivot column at r1 = r + b lives in rows [r1_8, r1_8 + b + 8), and
    b % 8 == 0 gives r1_8 = r8 + b — exactly the static tail rows
    [b, 2b + 8) of the right slab.  Extracting from the in-register updated
    tail is therefore bitwise the post-store ``_left_xcol(P, b, r + b)``,
    at one slab access per pair instead of two (the extract's load was
    ~10 ms of the 57 ms tick budget at n=3840 — PERF_NOTES session-4).
    Safe per-lane: a tick's lane slabs are disjoint and the head region
    ends before lane 0's slab, so no other write lands in this slab
    between the apply and the extract.
    """
    dtype = P.dtype
    zero = jnp.zeros((), dtype)
    SL = 2 * b
    r8 = (r // 8) * 8
    ro = r - r8
    rows = P[pl.ds(r8, SL + 8), :WR]
    qi = lax.broadcasted_iota(jnp.int32, (SL + 8, 1), 0)
    active = jnp.logical_and(qi >= ro, qi < ro + SL)
    v1 = pltpu.roll(v0, WR - 128, 1)
    v2 = pltpu.roll(v0, WR - 256, 1)
    zone = (r8 + qi) // 128 - r // 128
    Vm = jnp.where(zone == 0, v0, jnp.where(zone == 1, v1, v2))
    Vm = jnp.where(active, Vm, zero)
    u = jnp.sum(rows * Vm, axis=1, keepdims=True)
    new = rows - (tau * u) * Vm
    P[pl.ds(r8, SL + 8), :WR] = new
    # fused extraction (same arithmetic as _left_xcol on the stored values)
    r1 = r + b
    lane_r = lax.broadcasted_iota(jnp.int32, (1, WR), 1)
    tail = lax.slice_in_dim(new, b, SL + 8, axis=0)  # static rows [b, 2b+8)
    qi_e = lax.broadcasted_iota(jnp.int32, (b + 8, 1), 0)
    xl = lax.rem(r1, jnp.int32(128)) + 128
    zone_e = (r8 + b + qi_e) // 128 - r1 // 128
    lofs = xl - 128 * zone_e
    return jnp.sum(
        jnp.where(lane_r == lofs, tail, zero), axis=1, keepdims=True
    )


def _left_xcol(P, b, r1):
    """Pivot-column extraction half of band_chase_vmem._left_elim:
    returns the (b+8, 1) packed pivot column of the left slab at ``r1``."""
    dtype = P.dtype
    zero = jnp.zeros((), dtype)
    lane_r = lax.broadcasted_iota(jnp.int32, (1, WR), 1)
    r8 = (r1 // 8) * 8
    xl = lax.rem(r1, jnp.int32(128)) + 128
    rows = P[pl.ds(r8, b + 8), :WR]
    qi = lax.broadcasted_iota(jnp.int32, (b + 8, 1), 0)
    zone = (r8 + qi) // 128 - r1 // 128
    lofs = xl - 128 * zone
    return jnp.sum(
        jnp.where(lane_r == lofs, rows, zero), axis=1, keepdims=True
    )


def _left_make_v_batched(XC, ro1v, b):
    """Batched column larfg: lane ``l`` of ``XC`` ((b+8, 128)) holds lane
    l's pivot column with its pivot at sublane ``ro1v[0, l]``.  One
    sqrt/div chain serves every lane.  Same op order as the scalar chain in
    band_chase_vmem._left_elim."""
    dtype = XC.dtype
    zero = jnp.zeros((), dtype)
    one = jnp.ones((), dtype)
    qi = lax.broadcasted_iota(jnp.int32, XC.shape, 0)
    tail = jnp.logical_and(qi > ro1v, qi < ro1v + b)
    xt = jnp.where(tail, XC, zero)
    pivot = jnp.sum(jnp.where(qi == ro1v, XC, zero), axis=0, keepdims=True)
    sigma2 = jnp.sum(xt * xt, axis=0, keepdims=True)
    norm = jnp.sqrt(pivot * pivot + sigma2)
    sign = jnp.where(pivot >= 0, one, -one)
    beta = -sign * norm
    trivial = sigma2 == zero
    denom = jnp.where(trivial, one, pivot - beta)
    v = jnp.where(tail, xt / denom, zero) + jnp.where(
        qi == ro1v, one, zero
    )
    safe_beta = jnp.where(beta == 0, one, beta)
    tau = jnp.where(trivial, zero, (beta - pivot) / safe_beta)
    return v, tau


def _left_apply(P, b, r1, v, tau):
    """Apply half of band_chase_vmem._left_elim: column reflector ``(v,
    tau)`` (``v`` (b+8, 1) in slab-local rows) applied to the left slab."""
    dtype = P.dtype
    zero = jnp.zeros((), dtype)
    lane_r = lax.broadcasted_iota(jnp.int32, (1, WR), 1)
    r8 = (r1 // 8) * 8
    xl = lax.rem(r1, jnp.int32(128)) + 128
    rows = P[pl.ds(r8, b + 8), :WR]
    qi = lax.broadcasted_iota(jnp.int32, (b + 8, 1), 0)
    zone = (r8 + qi) // 128 - r1 // 128
    p0 = jnp.sum(jnp.where(zone == 0, v, zero) * rows, axis=0,
                 keepdims=True)
    p1 = jnp.sum(jnp.where(zone == 1, v, zero) * rows, axis=0,
                 keepdims=True)
    w0 = p0 + pltpu.roll(p1, 128, 1)
    csel = jnp.logical_and(lane_r >= xl, lane_r < xl + 2 * b)
    w0 = jnp.where(csel, w0, zero)
    w1 = pltpu.roll(w0, WR - 128, 1)
    Wm = jnp.where(zone == 0, w0, w1)
    P[pl.ds(r8, b + 8), :WR] = rows - (tau * v) * Wm


def _wave_tick(P, n, b, L, PR, XC, T, i_lo=None, i_hi=None, row_off=None):
    """One wavefront tick over packed rows ``P``: sweep T//3's head pair
    plus hop lanes l = 0..L-1 (sweep i_base - l at hop T - 3*(i_base - l)),
    with the right/left larfg construction batched across lanes.

    ``P`` may be the full packed array or any row window whose row 0 sits
    at a 128-aligned packed row with ``n`` the window-local problem size
    (the elimination coordinate contract of band_chase_vmem._right_elim).
    ``PR`` ((Lp, WR)) batches right pivot rows; ``XC`` ((b+8, 128)) batches
    left pivot columns (lane l in lane-dim position l).

    ``i_lo``/``i_hi`` (optional, traced) clamp the active sweeps to
    [i_lo, i_hi] — the grouped streamed chase runs only its own group's
    sweeps even though the global tick index would map earlier/later
    sweeps onto the lanes.  ``row_off`` (optional, traced, must be
    128-aligned) is subtracted from every pivot row before indexing ``P``
    (window-local coordinates); the x/zone lane arithmetic is unaffected
    because it only depends on rows mod 128.
    """
    w = b + 1
    dtype = P.dtype
    zero = jnp.zeros((), dtype)
    Lp = PR.shape[0]
    assert Lp >= L + 1 and L + 1 <= 128, (Lp, L)  # head rides slot L
    lane_r = lax.broadcasted_iota(jnp.int32, (1, WR), 1)
    qi8 = lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    li = lax.broadcasted_iota(jnp.int32, (Lp, 1), 0)
    off = 0 if row_off is None else row_off

    # ---- head (sweep T//3's k=0 pair; geometry differs, <=1/tick) -------
    # The head's larfg chains BATCH with the hop lanes' (slot L of PR/XC;
    # same _make_v / same-op-order column larfg, so bitwise-identical to
    # the old sequential _right_elim/_left_elim pair); only its applies
    # stay scalar, under pl.when.  Head and lane slabs are disjoint
    # (docstring), so phase order between head and lanes is free.
    head_ok = jnp.logical_and(T % 3 == 0, T // 3 <= n - 2)
    if i_hi is not None:
        head_ok = jnp.logical_and(head_ok, T // 3 <= i_hi)
    r_h = T // 3 - off  # head pivot row (window-local)

    @pl.when(head_ok)
    def _head_gather():
        r8 = (r_h // 8) * 8
        ro = r_h - r8
        rows8 = P[pl.ds(r8, 8), :WR]
        PR[L : L + 1, :] = jnp.sum(
            jnp.where(qi8 == ro, rows8, zero), axis=0, keepdims=True
        )

    # ---- hop lanes: r affine in l (spacing 3b - 1) ----------------------
    # Lane -> sweep mapping: in the FULL schedule every sweep is live, so
    # lane l tracks the moving frontier (i_base - l) and the active lanes
    # are always 0..L-1.  In GROUP mode (i_hi given) the sweeps are a fixed
    # window [i_lo, i_hi] while T keeps growing, so the frontier mapping
    # would slide the group's sweeps past lane L-1 mid-pass; pin lane l to
    # sweep i_hi - l instead (same schedule — hop k of sweep i still runs
    # at tick 3i + k — only the lane labels differ), and check k_l >= 1
    # explicitly (automatic in frontier mode, not in pinned mode).
    i_base = (T + 2) // 3 - 1  # floor((T-1)/3), T >= 0
    lane_anchor = i_base if i_hi is None else i_hi
    iv = lane_anchor - li  # (Lp, 1) sweep index per lane
    kv = T - 3 * iv
    rv = iv + 1 + (kv - 1) * b

    def lane(l):
        i_l = lane_anchor - l
        k_l = T - 3 * i_l
        r_l = i_l + 1 + (k_l - 1) * b - off
        act = jnp.logical_and(
            jnp.logical_and(i_l >= 0, i_l <= n - 2),
            k_l <= _nc_of(i_l, n, b),
        )
        if i_hi is not None:
            act = jnp.logical_and(act, k_l >= 1)
        if i_lo is not None:
            act = jnp.logical_and(act, i_l >= i_lo)
        return r_l, act

    # right pivot-row gathers (masked 8-row reduce, per active lane)
    for l in range(L):
        r_l, act = lane(l)

        @pl.when(act)
        def _gather(r_l=r_l, l=l):
            r8 = (r_l // 8) * 8
            ro = r_l - r8
            rows8 = P[pl.ds(r8, 8), :WR]
            PR[l : l + 1, :] = jnp.sum(
                jnp.where(qi8 == ro, rows8, zero), axis=0, keepdims=True
            )

    # ONE batched larfg for all right reflectors of this tick (+ the head:
    # its support starts at column offset 1 instead of b — row L's pivot
    # lane overrides the hop formula)
    xv = b + lax.rem(rv, jnp.int32(128)) + 128  # (Lp, 1)
    xv = jnp.where(li == L, 1 + lax.rem(r_h, jnp.int32(128)) + 128, xv)
    Vr, taur = _make_v(PR[...], xv, b, lane_r)

    @pl.when(head_ok)
    def _head_right():
        # apply region rows [r_h, r_h + w): the vmem head geometry
        _right_apply(
            P, b, r_h, Vr[L : L + 1, :], taur[L : L + 1, :], b + 8, w
        )

    # right applies fused with the next left elimination's pivot-column
    # extraction (one slab access instead of two; lanes' slabs are disjoint
    # so the per-lane interleave is order-equivalent to apply-all-then-
    # extract-all)
    for l in range(L):
        r_l, act = lane(l)

        @pl.when(act)
        def _apply_extract(r_l=r_l, l=l):
            XC[:, l : l + 1] = _right_apply_xcol(
                P, b, r_l, Vr[l : l + 1, :], taur[l : l + 1, :]
            )

    @pl.when(head_ok)
    def _head_extract():
        XC[:, L : L + 1] = _left_xcol(P, b, r_h + 1)

    # ONE batched column larfg for all left reflectors (+ the head's at
    # lane slot L: its pivot column sits at r_h + 1).  Pivot sublane per
    # LANE-dim index c (same affine map as the sublane-dim rv).
    lc = lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    ivc = lane_anchor - lc
    r1c = ivc + 1 + (T - 3 * ivc - 1) * b + b
    r1c = jnp.where(lc == L, r_h + 1, r1c)
    ro1c = r1c - (r1c // 8) * 8
    Vl, taul = _left_make_v_batched(XC[...], ro1c, b)

    @pl.when(head_ok)
    def _head_left():
        _left_apply(P, b, r_h + 1, Vl[:, L : L + 1], taul[:, L : L + 1])

    # left applies, per lane in place
    for l in range(L):
        r_l, act = lane(l)
        pl.when(act)(
            lambda r_l=r_l, l=l: _left_apply(
                P, b, r_l + b, Vl[:, l : l + 1], taul[:, l : l + 1]
            )
        )


def _pend_correct(P, b, r, vp, taup):
    """Phase G of the deferred-left tick: read the pending-left region
    ``[r8, r8+b+8)`` (the pending reflector's pivot row r1 equals the
    current hop's pivot row ``r``, so their 8-aligned bases coincide for
    b % 8 == 0), compute the left apply's ``w0`` row with the exact
    arithmetic of :func:`_left_apply`, and return ``(w0, prow)`` where
    ``prow`` is the pivot row AS IF the pending left had been applied
    (bitwise: row ``ro`` of ``rows - (tau*v)*Wm`` with v[ro] == 1 and
    Wm[ro] == w0, i.e. ``rows[ro] - taup * w0``)."""
    dtype = P.dtype
    zero = jnp.zeros((), dtype)
    lane_r = lax.broadcasted_iota(jnp.int32, (1, WR), 1)
    r8 = (r // 8) * 8
    ro = r - r8
    xl = lax.rem(r, jnp.int32(128)) + 128
    rows = P[pl.ds(r8, b + 8), :WR]
    qi = lax.broadcasted_iota(jnp.int32, (b + 8, 1), 0)
    zone = (r8 + qi) // 128 - r // 128
    p0 = jnp.sum(jnp.where(zone == 0, vp, zero) * rows, axis=0,
                 keepdims=True)
    p1 = jnp.sum(jnp.where(zone == 1, vp, zero) * rows, axis=0,
                 keepdims=True)
    w0 = p0 + pltpu.roll(p1, 128, 1)
    csel = jnp.logical_and(lane_r >= xl, lane_r < xl + 2 * b)
    w0 = jnp.where(csel, w0, zero)
    qi8 = lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    prow = jnp.sum(
        jnp.where(qi8 == ro, rows[:8], zero), axis=0, keepdims=True
    )
    prow = prow - taup * w0
    return w0, prow


def _pend_right_apply_xcol(P, b, r, vp, taup, w0, v0, tau, XC, l):
    """Phase A of the deferred-left tick: one (2b+8)-row slab load that
    (1) applies the PENDING left reflector ``(vp, taup, w0)`` of hop k-1
    to the slab's first b+8 rows (its region ``[r, r+b+8)`` is exactly the
    head of hop k's right slab — same 8-aligned base), (2) applies the
    right reflector ``(v0, tau)`` to the full slab, and (3) writes hop
    k's left pivot-column extraction into ``XC[:, l]``.

    The slab is processed as two statically-sliced pieces (head b+8 rows /
    tail b rows) with separate stores: Mosaic materializes a sublane
    concat as a full extra slab copy (measured +3 ms/chase), and the
    full-height masked pending form costs ~2 extra 128-row passes
    (measured +2.5 ms) — piecewise stores beat both.  Bitwise-identical
    to _left_apply-store / _right_apply_xcol-reload: the per-row ops are
    the same (lane reduces are per-row, so piece grouping cannot change
    them), and ``w0`` was precomputed in phase G from the pre-tick rows
    exactly as _left_apply computes it."""
    dtype = P.dtype
    zero = jnp.zeros((), dtype)
    SL = 2 * b
    r8 = (r // 8) * 8
    ro = r - r8
    rows = P[pl.ds(r8, SL + 8), :WR]
    head = lax.slice_in_dim(rows, 0, b + 8, axis=0)
    tail = lax.slice_in_dim(rows, b + 8, SL + 8, axis=0)
    lane_r = lax.broadcasted_iota(jnp.int32, (1, WR), 1)
    qi_h = lax.broadcasted_iota(jnp.int32, (b + 8, 1), 0)
    qi_t = lax.broadcasted_iota(jnp.int32, (b, 1), 0) + (b + 8)
    # ---- pending left on the head piece ------------------------------
    zone_h = (r8 + qi_h) // 128 - r // 128
    w1 = pltpu.roll(w0, WR - 128, 1)
    Wm_p = jnp.where(zone_h == 0, w0, w1)
    head = head - (taup * vp) * Wm_p
    # ---- right apply, piecewise (per-row ops: grouping-invariant) ----
    v1 = pltpu.roll(v0, WR - 128, 1)
    v2 = pltpu.roll(v0, WR - 256, 1)
    Vm_h = jnp.where(zone_h == 0, v0, jnp.where(zone_h == 1, v1, v2))
    Vm_h = jnp.where(qi_h >= ro, Vm_h, zero)
    u_h = jnp.sum(head * Vm_h, axis=1, keepdims=True)
    head = head - (tau * u_h) * Vm_h
    zone_t = (r8 + qi_t) // 128 - r // 128
    Vm_t = jnp.where(zone_t == 0, v0, jnp.where(zone_t == 1, v1, v2))
    Vm_t = jnp.where(qi_t < ro + SL, Vm_t, zero)
    u_t = jnp.sum(tail * Vm_t, axis=1, keepdims=True)
    tail = tail - (tau * u_t) * Vm_t
    P[pl.ds(r8, b + 8), :WR] = head
    P[pl.ds(r8 + b + 8, b), :WR] = tail
    # ---- fused extraction: xcol rows [0,8) from the head's last 8 rows,
    # rows [8, b+8) from the tail (left slab starts at r1_8 = r8 + b) ---
    r1 = r + b
    xl = lax.rem(r1, jnp.int32(128)) + 128
    he = lax.slice_in_dim(head, b, b + 8, axis=0)
    qe_h = lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    zone_eh = (r8 + b + qe_h) // 128 - r1 // 128
    XC[pl.ds(0, 8), l : l + 1] = jnp.sum(
        jnp.where(lane_r == xl - 128 * zone_eh, he, zero),
        axis=1,
        keepdims=True,
    )
    qe_t = lax.broadcasted_iota(jnp.int32, (b, 1), 0) + 8
    zone_et = (r8 + b + qe_t) // 128 - r1 // 128
    XC[pl.ds(8, b), l : l + 1] = jnp.sum(
        jnp.where(lane_r == xl - 128 * zone_et, tail, zero),
        axis=1,
        keepdims=True,
    )


def _wave_tick_dl(P, n, b, L, PR, XC, W0, VLP, TAUP, T):
    """Deferred-left wavefront tick (full frontier schedule).

    Identical reflector sequence and bitwise-identical d/e to
    :func:`_wave_tick`; the difference is purely mechanical: each pair's
    LEFT apply is deferred one tick and fused into the head of the same
    sweep's next right slab, cutting slab accesses per pair from 3
    (gather 8 + right 264 load/store + left 136 load/store) to 2
    (pending-region 136 load, combined 264 load/store) — the gather rides
    the pending-region read because hop k's pivot row is row 0 of hop
    k-1's left region.

    State carried tick-to-tick in scratch: ``VLP`` ((b+8, 128)) the
    batched left larfg's reflector columns, ``TAUP`` ((8, 128), row 0)
    their taus, ``W0`` ((Lp, WR)) per-lane w0 rows (intra-tick, phase G
    -> phase A).  Lane labels advance at ticks T % 3 == 1 (the frontier
    anchor increments); the WRITE side canonicalizes for that (roll-at-
    write at tick end: labels shift one lane, the head's reflector lands
    at lane 0 — whose hop is always k == 1 at such ticks), so reads here
    are single static columns.  ``L`` must be ``_n_lanes(n, b) + 1``:
    hop k runs through nc+1 (the flush of the last pair's left), one
    lane beyond the right-active frontier.

    STATUS: measured NEGATIVE result — ~57.9 vs the production tick's
    ~55.2 ms at n=3840/b=128 across three mechanical variants (see
    PERF_NOTES round-5 Stage II); kept as the bitwise-verified record of
    the deferral algebra, not routed.
    """
    w = b + 1
    dtype = P.dtype
    zero = jnp.zeros((), dtype)
    Lp = PR.shape[0]
    assert Lp >= L + 1 and L + 1 <= 128, (Lp, L)
    lane_r = lax.broadcasted_iota(jnp.int32, (1, WR), 1)
    qi8 = lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    li = lax.broadcasted_iota(jnp.int32, (Lp, 1), 0)
    anchor = (T + 2) // 3 - 1

    head_ok = jnp.logical_and(T % 3 == 0, T // 3 <= n - 2)
    r_h = T // 3

    @pl.when(head_ok)
    def _head_gather():
        r8 = (r_h // 8) * 8
        ro = r_h - r8
        rows8 = P[pl.ds(r8, 8), :WR]
        PR[L : L + 1, :] = jnp.sum(
            jnp.where(qi8 == ro, rows8, zero), axis=0, keepdims=True
        )

    def lane(l):
        i_l = anchor - l
        k_l = T - 3 * i_l
        r_l = i_l + 1 + (k_l - 1) * b
        nc_l = _nc_of(i_l, n, b)
        in_rng = jnp.logical_and(i_l >= 0, i_l <= n - 2)
        act_r = jnp.logical_and(in_rng, k_l <= nc_l)
        act_p = jnp.logical_and(in_rng, k_l <= nc_l + 1)
        return i_l, k_l, r_l, act_r, act_p

    def pend_of(l):
        """Pending reflector for lane l — the writing tick already
        canonicalized lane labels (roll-at-write below), so this is one
        static column read per phase."""
        return VLP[:, l : l + 1], TAUP[0:1, l : l + 1]

    # ---- phase G: pending-region read -> w0 + corrected pivot row ------
    for l in range(L):
        i_l, k_l, r_l, act_r, act_p = lane(l)

        @pl.when(act_p)
        def _g(l=l, r_l=r_l):
            vp, tp = pend_of(l)
            w0, prow = _pend_correct(P, b, r_l, vp, tp)
            W0[l : l + 1, :] = w0
            PR[l : l + 1, :] = prow

    # ---- batched right larfg (+ head slot L) ---------------------------
    iv = anchor - li
    kv = T - 3 * iv
    rv = iv + 1 + (kv - 1) * b
    xv = b + lax.rem(rv, jnp.int32(128)) + 128
    xv = jnp.where(li == L, 1 + lax.rem(r_h, jnp.int32(128)) + 128, xv)
    Vr, taur = _make_v(PR[...], xv, b, lane_r)

    @pl.when(head_ok)
    def _head_right():
        _right_apply(
            P, b, r_h, Vr[L : L + 1, :], taur[L : L + 1, :], b + 8, w
        )
        XC[:, L : L + 1] = _left_xcol(P, b, r_h + 1)

    # ---- phase A: pending left + right apply + extraction, one slab ----
    for l in range(L):
        i_l, k_l, r_l, act_r, act_p = lane(l)

        @pl.when(act_p)
        def _a(l=l, r_l=r_l, act_r=act_r):
            vp, tp = pend_of(l)
            te = jnp.where(act_r, taur[l : l + 1, :], zero)
            _pend_right_apply_xcol(
                P, b, r_l, vp, tp, W0[l : l + 1, :], Vr[l : l + 1, :],
                te, XC, l,
            )

    # ---- batched left larfg; store as next tick's pending --------------
    lc = lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    ivc = anchor - lc
    r1c = ivc + 1 + (T - 3 * ivc - 1) * b + b
    r1c = jnp.where(lc == L, r_h + 1, r1c)
    ro1c = r1c - (r1c // 8) * 8
    Vl, taul = _left_make_v_batched(XC[...], ro1c, b)
    # Canonicalize under the NEXT tick's lane labels (roll-at-write): at
    # ticks T+1 with (T+1) % 3 == 1 the frontier anchor increments, so
    # sweep labels advance by one lane and the HEAD's reflector (slot L)
    # becomes lane 0's pending (lane 0 is always at hop k == 1 there).
    # One lane-roll pair + select per tick replaces three narrow column
    # selects per lane per phase (measured: the select variant cost
    # +26 ms at n=3840).
    shift_n = (T + 1) % 3 == 1
    lcs = lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    Vl_s = jnp.where(
        lcs == 0,
        pltpu.roll(Vl, 128 - L, axis=1),
        pltpu.roll(Vl, 1, axis=1),
    )
    taul_s = jnp.where(
        lcs == 0,
        pltpu.roll(taul, 128 - L, axis=1),
        pltpu.roll(taul, 1, axis=1),
    )
    VLP[pl.ds(0, b + 8), :] = jnp.where(shift_n, Vl_s, Vl)
    TAUP[0:1, :] = jnp.where(shift_n, taul_s, taul)


def _wave_chase_dl_kernel(
    n, b, Npad, L, A_in, d_out, e_out, P, PR, XC, W0, VLP, TAUP, sem
):
    """Deferred-left wavefront chase kernel: same pack and d/e extraction
    as :func:`_wave_chase_kernel`, tick body :func:`_wave_tick_dl`
    (one extra tick flushes the last pair's pending left)."""
    dtype = P.dtype
    zero = jnp.zeros((), dtype)
    n128 = -(-n // 128) * 128

    P[...] = jnp.zeros(P.shape, dtype)
    VLP[...] = jnp.zeros(VLP.shape, dtype)
    TAUP[...] = jnp.zeros(TAUP.shape, dtype)
    for br in range(Npad // 128):
        r0 = 128 * br
        if r0 >= n128:
            continue
        c0 = 128 * br - 128
        l0 = max(0, -c0)
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

    def tick(T, carry):
        _wave_tick_dl(P, n, b, L, PR, XC, W0, VLP, TAUP, T)
        return carry

    lax.fori_loop(jnp.int32(0), jnp.int32(3 * (n - 2) + 3), tick, 0)

    eli = lax.broadcasted_iota(jnp.int32, (128, 256), 1)
    eri = lax.broadcasted_iota(jnp.int32, (128, 256), 0)
    for br in range(Npad // 128):
        if 128 * br >= n:
            d_out[br : br + 1, :] = jnp.zeros((1, 128), dtype)
            e_out[br : br + 1, :] = jnp.zeros((1, 128), dtype)
            continue
        blk = P[128 * br : 128 * br + 128, 128:384]
        dsum = jnp.sum(
            jnp.where(eli == eri, blk, zero), axis=0, keepdims=True
        )
        esum = jnp.sum(
            jnp.where(eli == eri + 1, blk, zero), axis=0, keepdims=True
        )
        d_out[br : br + 1, :] = dsum[:, 0:128]
        e_out[br : br + 1, :] = esum[:, 1:129]


def band_to_bidiagonal_pallas_wave_dl(A, band=128):
    """Deferred-left wavefront chase; returns (d, e) bitwise-identical to
    :func:`band_to_bidiagonal_pallas_wave` at 2 slab accesses per pair
    instead of 3.  Callers gate via :func:`wave_chase_supported`."""
    with jax.enable_x64(False):
        return _band_to_bidiagonal_pallas_wave_dl(A, band=band)


@functools.partial(jax.jit, static_argnames=("band",))
def _band_to_bidiagonal_pallas_wave_dl(A, band=128):
    n = A.shape[0]
    b = int(band)
    dtype = A.dtype
    if n < 2:
        return jnp.abs(jnp.diag(A)), jnp.zeros((0,), dtype)
    if not wave_chase_supported(n, b):
        raise ValueError(f"wave chase unsupported for n={n}, band={b}")
    Npad = -(-(n + 3 * b + 8) // 128) * 128
    nb = Npad // 128
    n128 = -(-n // 128) * 128
    Ld = _n_lanes(n, b) + 1  # hop k reaches nc+1 (pending flush)
    Lp = -(-(Ld + 1) // LANE_PAD) * LANE_PAD  # +1: head larfg slot
    if n128 != n:
        A = jnp.pad(A, ((0, n128 - n), (0, n128 - n)))
    d2, e2 = pl.pallas_call(
        functools.partial(_wave_chase_dl_kernel, n, b, Npad, Ld),
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
            pltpu.VMEM((Lp, WR), dtype),
            pltpu.VMEM((b + 8, 128), dtype),
            pltpu.VMEM((Lp, WR), dtype),
            pltpu.VMEM((b + 8, 128), dtype),
            pltpu.VMEM((8, 128), dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(A)
    d = d2.reshape(-1)[:n]
    e = e2.reshape(-1)[: n - 1]
    return d, e


def _wave_chase_kernel(n, b, Npad, L, A_in, d_out, e_out, P, PR, XC, sem):
    """Wavefront-batched chase over VMEM-resident ``P`` (Npad, D).

    ``PR`` ((LANE_PAD*ceil(L/8)?, WR) -> (Lp, WR)) batches right pivot rows;
    ``XC`` ((b+8, 128)) batches left pivot columns (lane l in lane dim l).
    """
    dtype = P.dtype
    zero = jnp.zeros((), dtype)
    n128 = -(-n // 128) * 128

    # ---- pack (identical to band_chase_vmem) ----------------------------
    P[...] = jnp.zeros(P.shape, dtype)
    for br in range(Npad // 128):
        r0 = 128 * br
        if r0 >= n128:
            continue
        c0 = 128 * br - 128
        l0 = max(0, -c0)
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

    def tick(T, carry):
        _wave_tick(P, n, b, L, PR, XC, T)
        return carry

    lax.fori_loop(jnp.int32(0), jnp.int32(3 * (n - 2) + 2), tick, 0)

    # ---- extract d/e (identical to band_chase_vmem) ---------------------
    eli = lax.broadcasted_iota(jnp.int32, (128, 256), 1)
    eri = lax.broadcasted_iota(jnp.int32, (128, 256), 0)
    for br in range(Npad // 128):
        if 128 * br >= n:
            d_out[br : br + 1, :] = jnp.zeros((1, 128), dtype)
            e_out[br : br + 1, :] = jnp.zeros((1, 128), dtype)
            continue
        blk = P[128 * br : 128 * br + 128, 128:384]
        dsum = jnp.sum(
            jnp.where(eli == eri, blk, zero), axis=0, keepdims=True
        )
        esum = jnp.sum(
            jnp.where(eli == eri + 1, blk, zero), axis=0, keepdims=True
        )
        d_out[br : br + 1, :] = dsum[:, 0:128]
        e_out[br : br + 1, :] = esum[:, 1:129]


def _left_make_v(xcol, ro1, b):
    """Single-column larfg on a (Q, 1) packed pivot column (pivot at
    sublane ``ro1``) — the scalar chain of band_chase_vmem._left_elim,
    used by the recording kernel's head path."""
    dtype = xcol.dtype
    zero = jnp.zeros((), dtype)
    one = jnp.ones((), dtype)
    qi = lax.broadcasted_iota(jnp.int32, xcol.shape, 0)
    tail = jnp.logical_and(qi > ro1, qi < ro1 + b)
    xt = jnp.where(tail, xcol, zero)
    pivot = jnp.sum(jnp.where(qi == ro1, xcol, zero), axis=0, keepdims=True)
    sigma2 = jnp.sum(xt * xt, axis=0, keepdims=True)
    norm = jnp.sqrt(pivot * pivot + sigma2)
    sign = jnp.where(pivot >= 0, one, -one)
    beta = -sign * norm
    trivial = sigma2 == zero
    denom = jnp.where(trivial, one, pivot - beta)
    v = jnp.where(tail, xt / denom, zero) + jnp.where(qi == ro1, one, zero)
    safe_beta = jnp.where(beta == 0, one, beta)
    tau = jnp.where(trivial, zero, (beta - pivot) / safe_beta)
    return v, tau


def _rec_flush(REC, VRr, VLr, sem_rec, s_blk, s_out, i_off, i_s, buf):
    """Canonicalize + flush sweep ``i_s``'s records (called at its last hop).

    ``REC`` is the MERGED record buffer: lanes [0, WR) hold the right
    records, lanes [WR, WR+256) the left ones (one row store per pair —
    see :func:`_wave_tick_rec`).
    Right records live in packed zone-0 lane coords: hop slot support starts
    at lane 256 + co (x = b + r%128 + 128, b == 128), the head slot 128
    lower (x = 1 + i%128 + 128) — one whole-block roll plus a static row-0
    patch.  Left records are in slab-local row coords (sweep-invariant pivot
    sublane ro for head AND hops).

    ``s_blk`` rows of block ``buf`` flush to the HBM outputs at row
    ``(i_s + i_off) * s_out`` — ``i_off`` (python int, 128-aligned) maps a
    window-local sweep index to its global output slot (the roll offsets are
    unchanged: they depend on the sweep index mod 128 / mod 8 only)."""
    co = lax.rem(i_s + i_off + 1, jnp.int32(128))
    coh = lax.rem(i_s + i_off, jnp.int32(128))  # head support: lane 129+coh
    ro = lax.rem(i_s + i_off + 1, jnp.int32(8))
    blkR = REC[pl.ds(buf * s_blk, s_blk), pl.ds(0, WR)]
    rolled = pltpu.roll(blkR, -(co + 256), axis=1)
    REC[pl.ds(buf * s_blk, s_blk), pl.ds(0, WR)] = rolled
    top = pltpu.roll(blkR[0:1, :], -(coh + 129), axis=1)
    REC[pl.ds(buf * s_blk, 1), pl.ds(0, WR)] = top
    blkL = REC[pl.ds(buf * s_blk, s_blk), pl.ds(WR, 256)]
    REC[pl.ds(buf * s_blk, s_blk), pl.ds(WR, 256)] = pltpu.roll(
        blkL, -ro, axis=1
    )
    cps = [
        pltpu.make_async_copy(
            REC.at[pl.ds(buf * s_blk, s_blk), pl.ds(0, 128)],
            VRr.at[pl.ds((i_s + i_off) * s_out, s_blk)],
            sem_rec.at[0],
        ),
        pltpu.make_async_copy(
            REC.at[pl.ds(buf * s_blk, s_blk), pl.ds(WR, 128)],
            VLr.at[pl.ds((i_s + i_off) * s_out, s_blk)],
            sem_rec.at[1],
        ),
    ]
    for cp in cps:
        cp.start()
    for cp in cps:
        cp.wait()


def _wave_tick_rec(
    P, n, b, L, PR, XC, T, REC, NB, s_blk, flush,
    i_lo=None, i_hi=None, row_off=None,
):
    """Recording variant of :func:`_wave_tick` (``b == 128`` only — the
    record-roll canonicalization in :func:`_rec_flush` needs sweep-invariant
    lane offsets): the same wavefront tick, additionally capturing every
    reflector into rotating per-sweep VMEM record blocks (``REC``, merged:
    right record in lanes [0, WR), left in [WR, WR+256) — ONE dynamic row
    store per pair instead of two, which halves the recording tick's
    dominant overhead; ``NB`` blocks x ``s_blk`` rows; a sweep's block is
    zeroed at its head
    and handed to ``flush(i_s, buf)`` at its last hop — NB must exceed the
    max sweeps in flight so a block is never reused before its flush).

    Taus are not stored; the host recovers tau = 2 / (v^T v).

    Same window-local coordinate contract as :func:`_wave_tick`
    (``i_lo``/``i_hi`` pin the active sweep range, ``row_off`` — traced,
    128-aligned — maps sweep rows to window-local ``P`` rows); sweep indices
    seen by the record blocks and ``flush`` are in the tick's local frame.
    """
    w = b + 1
    dtype = P.dtype
    zero = jnp.zeros((), dtype)
    Lp = PR.shape[0]
    Q = b + 8
    lane_r = lax.broadcasted_iota(jnp.int32, (1, WR), 1)
    qi8 = lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    li = lax.broadcasted_iota(jnp.int32, (Lp, 1), 0)
    cj_t = lax.broadcasted_iota(jnp.int32, (Q, 1), 0)
    lj_t = lax.broadcasted_iota(jnp.int32, (1, 256), 1)
    off = 0 if row_off is None else row_off

    # ---- head (sweep T//3's k=0 pair), recording -------------------------
    head_ok = jnp.logical_and(T % 3 == 0, T // 3 <= n - 2)
    if i_hi is not None:
        head_ok = jnp.logical_and(head_ok, T // 3 <= i_hi)

    @pl.when(head_ok)
    def _head():
        i = T // 3
        bufh = lax.rem(i, jnp.int32(NB))
        REC[pl.ds(bufh * s_blk, s_blk), :] = jnp.zeros(
            (s_blk, WR + 256), dtype
        )
        r8 = ((i - off) // 8) * 8
        ro = (i - off) - r8
        rows8 = P[pl.ds(r8, 8), :WR]
        prow = jnp.sum(
            jnp.where(qi8 == ro, rows8, zero), axis=0, keepdims=True
        )
        xh = 1 + lax.rem(i, jnp.int32(128)) + 128
        vh, tauh = _make_v(prow, xh, b, lane_r)
        _right_apply(P, b, i - off, vh, tauh, b + 8, w)
        xcol = _left_xcol(P, b, i + 1 - off)
        ro1 = (i + 1 - off) - ((i + 1 - off) // 8) * 8
        vl, taul_h = _left_make_v(xcol, ro1, b)
        _left_apply(P, b, i + 1 - off, vl, taul_h)
        vl_row = jnp.sum(
            jnp.where(cj_t == lj_t, vl, zero), axis=0, keepdims=True
        )  # (1, 256): entry j = vl[j]
        vl_row = jnp.where(taul_h == 0, zero, vl_row)
        REC[pl.ds(bufh * s_blk, 1), :] = jnp.concatenate(
            [jnp.where(tauh == 0, zero, vh), vl_row], axis=1
        )

    # ---- hop lanes (lane mapping as in _wave_tick) -----------------------
    i_base = (T + 2) // 3 - 1
    lane_anchor = i_base if i_hi is None else i_hi
    iv = lane_anchor - li
    kv = T - 3 * iv
    rv = iv + 1 + (kv - 1) * b

    def lane(l):
        i_l = lane_anchor - l
        k_l = T - 3 * i_l
        r_l = i_l + 1 + (k_l - 1) * b - off
        act = jnp.logical_and(
            jnp.logical_and(i_l >= 0, i_l <= n - 2),
            k_l <= _nc_of(i_l, n, b),
        )
        if i_hi is not None:
            act = jnp.logical_and(act, k_l >= 1)
        if i_lo is not None:
            act = jnp.logical_and(act, i_l >= i_lo)
        return i_l, k_l, r_l, act

    for l in range(L):
        _, _, r_l, act = lane(l)

        @pl.when(act)
        def _gather(r_l=r_l, l=l):
            r8 = (r_l // 8) * 8
            ro = r_l - r8
            rows8 = P[pl.ds(r8, 8), :WR]
            PR[l : l + 1, :] = jnp.sum(
                jnp.where(qi8 == ro, rows8, zero), axis=0, keepdims=True
            )

    xv = b + lax.rem(rv, jnp.int32(128)) + 128
    Vr, taur = _make_v(PR[...], xv, b, lane_r)
    Vrm = jnp.where(taur == 0, zero, Vr)

    # right applies fused with the left pivot-column extraction (one slab
    # access instead of two — see _right_apply_xcol; lanes disjoint per
    # tick so the interleave is order-equivalent)
    for l in range(L):
        i_l, k_l, r_l, act = lane(l)

        @pl.when(act)
        def _right(r_l=r_l, l=l):
            XC[:, l : l + 1] = _right_apply_xcol(
                P, b, r_l, Vr[l : l + 1, :], taur[l : l + 1, :]
            )

    lc = lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    ivc = lane_anchor - lc
    r1c = ivc + 1 + (T - 3 * ivc - 1) * b + b
    ro1c = r1c - (r1c // 8) * 8
    Vl, taul = _left_make_v_batched(XC[...], ro1c, b)
    # ALL lanes' left columns -> record rows in one exact transpose
    # (Mosaic lowers lax.transpose natively; measured far cheaper than
    # the MXU identity-contraction alternative)
    Vlm = jnp.where(taul == 0, zero, Vl)
    VlT = lax.transpose(Vlm, (1, 0))  # (128, Q): row l = lane l's col
    VlT = jnp.concatenate(
        [VlT, jnp.zeros((128, 256 - Q), dtype)], axis=1
    )

    for l in range(L):
        i_l, k_l, r_l, act = lane(l)

        @pl.when(act)
        def _left(i_l=i_l, k_l=k_l, r_l=r_l, l=l):
            _left_apply(
                P, b, r_l + b, Vl[:, l : l + 1], taul[:, l : l + 1]
            )
            row = lax.rem(i_l, jnp.int32(NB)) * s_blk + k_l
            REC[pl.ds(row, 1), :] = jnp.concatenate(
                [Vrm[l : l + 1, :], VlT[l : l + 1, :]], axis=1
            )

        @pl.when(jnp.logical_and(act, k_l == _nc_of(i_l, n, b)))
        def _flush(i_l=i_l, l=l):
            flush(i_l, lax.rem(i_l, jnp.int32(NB)))


def _wave_chase_rec_kernel(
    n, b, Npad, L, NB, s_pad,
    A_in,
    d_out, e_out, VRr, VLr,
    P, PR, XC, REC, sem, sem_rec,
):
    """Recording variant of :func:`_wave_chase_kernel` (``b == 128``):
    the same wavefront-batched chase, additionally capturing every
    reflector for singular-vector back-transformation.

    Records accumulate in per-sweep VMEM blocks (``REC``, ``NB`` rotating
    (s_pad, 768) MERGED blocks — right record lanes [0, 512), left
    [512, 768); NB > max sweeps in flight), ONE dynamic row store per
    PAIR (the old two stores per pair were the recording tick's dominant
    overhead), and flush to HBM once per sweep at
    its last hop: one ``pltpu.roll`` canonicalizes the whole sweep's
    records (b == 128 makes the lane offset sweep-invariant — the same
    trick as band_chase._chase_kernel_rec), then one DMA per side.  Left
    reflectors are columns; a single native transpose per tick turns ALL
    lanes' columns into record rows at once, replacing the per-pair
    mask-reduce transpose that dominates the HBM recording kernel's
    overhead.  Tick body and flush shared with the recording streamed
    chase: :func:`_wave_tick_rec` / :func:`_rec_flush`.

    Taus are not stored; the host recovers tau = 2 / (v^T v).
    """
    dtype = P.dtype
    zero = jnp.zeros((), dtype)
    n128 = -(-n // 128) * 128

    # ---- pack (identical to band_chase_vmem) ----------------------------
    P[...] = jnp.zeros(P.shape, dtype)
    for br in range(Npad // 128):
        r0 = 128 * br
        if r0 >= n128:
            continue
        c0 = 128 * br - 128
        l0 = max(0, -c0)
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

    def flush(i_s, buf):
        _rec_flush(REC, VRr, VLr, sem_rec, s_pad, s_pad, 0, i_s, buf)

    def tick(T, carry):
        _wave_tick_rec(P, n, b, L, PR, XC, T, REC, NB, s_pad, flush)
        return carry

    lax.fori_loop(jnp.int32(0), jnp.int32(3 * (n - 2) + 2), tick, 0)

    # ---- extract d/e (identical to band_chase_vmem) ---------------------
    eli = lax.broadcasted_iota(jnp.int32, (128, 256), 1)
    eri = lax.broadcasted_iota(jnp.int32, (128, 256), 0)
    for br in range(Npad // 128):
        if 128 * br >= n:
            d_out[br : br + 1, :] = jnp.zeros((1, 128), dtype)
            e_out[br : br + 1, :] = jnp.zeros((1, 128), dtype)
            continue
        blk = P[128 * br : 128 * br + 128, 128:384]
        dsum = jnp.sum(
            jnp.where(eli == eri, blk, zero), axis=0, keepdims=True
        )
        esum = jnp.sum(
            jnp.where(eli == eri + 1, blk, zero), axis=0, keepdims=True
        )
        d_out[br : br + 1, :] = dsum[:, 0:128]
        e_out[br : br + 1, :] = esum[:, 1:129]


def _n_lanes(n, b):
    """Max concurrent hop lanes = ceil(max_sweep_hops / 3)."""
    nc0 = _s_max_of(n, b) - 1  # == nc_of(0, n, b)
    return (nc0 + 2) // 3


def wave_chase_supported(n, band):
    """Gate: vmem residency + head/lane slab disjointness (b >= 32)."""
    b = int(band)
    if b < 32 or b > 128 or b % 8 != 0:
        return False
    Npad = -(-(n + 3 * b + 8) // 128) * 128
    if Npad * D * 4 > 14 * 1024 * 1024:
        return False
    # + 1: the head rides lane slot L of the batched larfg buffers
    return n >= 2 and _n_lanes(n, b) + 1 <= 128


def _rec_spad(n, b):
    """Record slots per sweep (top + chase), sublane-padded to 8."""
    s_max = _s_max_of(n, b)
    return -(-s_max // 8) * 8


def wave_chase_accum_supported(n, band):
    """Gate for the recording wave chase: b == 128 (per-sweep-invariant
    record lane offsets) and packed band + record blocks resident in VMEM
    (14 MB: validated at n=4992 / 13.1 MB resident after the D=512 packed
    width shrink)."""
    b = int(band)
    if b != 128 or n < 2:
        return False
    Npad = -(-(n + 3 * b + 8) // 128) * 128
    NB = _n_lanes(n, b) + 2
    rec_bytes = NB * _rec_spad(n, b) * (WR + 256) * 4
    return Npad * D * 4 + rec_bytes <= 14 * 1024 * 1024


def wave_chase_accum_preferred(n, band):
    """Route the recording wave chase only past the HBM window kernel's
    row-stride cliff: measured at band=128, the HBM recording kernel wins
    below it (87 vs 101 ms at n=2048) and collapses past it (222 vs 126 ms
    at n=3840)."""
    b = int(band)
    if not wave_chase_accum_supported(n, b):
        return False
    from svdsolver_tpu.ops.pallas.band_chase_vmem import _HBM_FAST_LANES

    mc = -(-2 * b // 128) * 128 + 128
    dense_lanes = -(-(n + b + mc + 16) // 128) * 128
    return dense_lanes > _HBM_FAST_LANES


def band_to_bidiagonal_pallas_wave_accum(A, band=128):
    """Recording wavefront chase; returns ``(d, e, VL, TL, VR, TR)`` with
    the same record convention as band_chase.band_to_bidiagonal_pallas_accum
    (reflector (i, s) supported on rows/cols ``[i+1+s*band, i+1+(s+1)*band)``).
    Callers gate via :func:`wave_chase_accum_supported`."""
    with jax.enable_x64(False):
        return _band_to_bidiagonal_pallas_wave_accum(A, band=band)


@functools.partial(jax.jit, static_argnames=("band",))
def _band_to_bidiagonal_pallas_wave_accum(A, band=128):
    n = A.shape[0]
    b = int(band)
    dtype = A.dtype
    if not wave_chase_accum_supported(n, b):
        raise ValueError(f"wave accum chase unsupported for n={n}, band={b}")
    Npad = -(-(n + 3 * b + 8) // 128) * 128
    nb = Npad // 128
    n128 = -(-n // 128) * 128
    L = _n_lanes(n, b)
    Lp = -(-(L + 1) // LANE_PAD) * LANE_PAD  # +1: head larfg slot
    NB = L + 2
    s_pad = _rec_spad(n, b)
    if n128 != n:
        A = jnp.pad(A, ((0, n128 - n), (0, n128 - n)))
    d2, e2, VRr, VLr = pl.pallas_call(
        functools.partial(
            _wave_chase_rec_kernel, n, b, Npad, L, NB, s_pad
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nb, 128), dtype),
            jax.ShapeDtypeStruct((nb, 128), dtype),
            jax.ShapeDtypeStruct(((n - 1) * s_pad, 128), dtype),
            jax.ShapeDtypeStruct(((n - 1) * s_pad, 128), dtype),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ),
        scratch_shapes=[
            pltpu.VMEM((Npad, D), dtype),
            pltpu.VMEM((Lp, WR), dtype),
            pltpu.VMEM((b + 8, 128), dtype),
            pltpu.VMEM((NB * s_pad, WR + 256), dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(A)
    d = d2.reshape(-1)[:n]
    e = e2.reshape(-1)[: n - 1]
    s_max = _s_max_of(n, b)
    VR = VRr.reshape(n - 1, s_pad, 128)[:, :s_max, :b]
    VL = VLr.reshape(n - 1, s_pad, 128)[:, :s_max, :b]

    def tau_from_v(V):
        nrm2 = jnp.sum(V * V, axis=-1)
        return jnp.where(nrm2 == 0, jnp.zeros((), dtype), 2.0 / nrm2)

    return d, e, VL, tau_from_v(VL), VR, tau_from_v(VR)


def wave_chase_preferred(n, band):
    """True when this kernel should take the routing slot: past the HBM
    window kernel's row-stride cliff (below it the dense window kernel
    still wins: 10 vs 13 ms at n=1024) and within the VMEM-residency gate.
    Measured same-session at band=128 (5-rep loops): n=3840 wave 62 ms vs
    stream 67 / window 162; n=4992 wave 100 vs stream 132 / window 267 —
    and unlike the sequential vmem kernel it has measured session-stable
    (62-66 ms at n=3840 across sessions vs 68-153 for vmem)."""
    b = int(band)
    if not wave_chase_supported(n, b):
        return False
    from svdsolver_tpu.ops.pallas.band_chase_vmem import _HBM_FAST_LANES

    mc = -(-2 * b // 128) * 128 + 128
    dense_lanes = -(-(n + b + mc + 16) // 128) * 128
    return dense_lanes > _HBM_FAST_LANES


def band_to_bidiagonal_pallas_wave(A, band=128):
    """Wavefront-batched packed chase; returns (d, e).  Callers gate via
    :func:`wave_chase_supported`."""
    with jax.enable_x64(False):
        return _band_to_bidiagonal_pallas_wave(A, band=band)


@functools.partial(jax.jit, static_argnames=("band",))
def _band_to_bidiagonal_pallas_wave(A, band=128):
    n = A.shape[0]
    b = int(band)
    dtype = A.dtype
    if n < 2:
        return jnp.abs(jnp.diag(A)), jnp.zeros((0,), dtype)
    if not wave_chase_supported(n, b):
        raise ValueError(f"wave chase unsupported for n={n}, band={b}")
    Npad = -(-(n + 3 * b + 8) // 128) * 128
    nb = Npad // 128
    n128 = -(-n // 128) * 128
    L = _n_lanes(n, b)
    Lp = -(-(L + 1) // LANE_PAD) * LANE_PAD  # +1: head larfg slot
    if n128 != n:
        A = jnp.pad(A, ((0, n128 - n), (0, n128 - n)))
    d2, e2 = pl.pallas_call(
        functools.partial(_wave_chase_kernel, n, b, Npad, L),
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
            pltpu.VMEM((Lp, WR), dtype),
            pltpu.VMEM((b + 8, 128), dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(A)
    d = d2.reshape(-1)[:n]
    e = e2.reshape(-1)[: n - 1]
    return d, e
