"""Two-phase packed-band bulge chase: streamed windows + VMEM-resident tail.

The dense HBM window kernel runs in a slow ~3-5 us/pair regime once the
padded matrix's row stride crosses the DMA cliff (PERF_NOTES "stride
cliff").  This kernel is the escape for every past-the-cliff size:

* The band is packed once (in-kernel DMAs) into a (Npad, 512) HBM array with
  the same block-aligned diagonal layout as the VMEM kernel —
  ``P[row, l] = A[row, 128*(row//128) - 128 + l]`` — but clipped to the 512
  lanes the eliminations can ever touch (modified lanes are provably < 511;
  see band_chase_vmem._left_elim).  Packed rows are 2 KB and contiguous:
  every window DMA runs far below the stride cliff.
* **Phase A** (sweeps [0, R0), b >= 32): sweeps stream in GROUPS of LG = 4.
  One windowed pass walks all four bulges down the band together on the
  wavefront schedule (hop k of sweep i at tick 3i + k, lanes 3 hops /
  3b - 1 rows apart): each resident window runs ``hg`` ticks of
  band_chase_wave._wave_tick with the group's sweeps pinned to the lanes,
  so the larfg latency chains batch LG-wide AND one streaming pass serves
  LG sweeps (DMA bytes / LG).  Window j covers packed rows
  [base + j*hg*b, + W) and ticks [3*LG + j*hg, + hg) (window 0 also runs
  the ramp): the deepest in-window touch is io + (3*LG + hg)*b + 9 <= W by
  the _group_hops_per_window gate, and at a window switch the shallowest
  future touch (the last lane's pivot) is 2b rows past the retired region.
  While window j computes, window j+1's fresh tail streams in and window
  j-1's finalized rows stream out; the next group's first window is
  prefetched during the current group's last window (valid when the group
  has >= 1 + ceil((W+128)/(hg*b)) windows: the prefetched rows were
  retired by out-DMAs already waited on).  For b < 32 (wave tick's
  head/lane disjointness gate) phase A falls back to per-sweep streaming
  with the same window mechanics.
* **Phase B** (sweeps [R0, n-1)): the 128-aligned tail slice P[R0:R0+2W) IS
  the packed form of the trailing submatrix, and the trailing subproblem of
  <= 2W - 2b - 8 rows fits the (2W, 512) window buffer whole — so all short
  trailing sweeps run VMEM-resident with zero DMA (one load, one store),
  and (for b >= 32) they run the WAVEFRONT tick schedule
  (band_chase_wave._wave_tick) on the resident slice: the per-pair larfg
  latency chains are batched across the pipelined-sweep lanes, exactly the
  wave kernel's batching, in window-local coordinates.  For n <= ~6400 the
  whole chase is phase B (but the wave kernel owns that routing range —
  this kernel's job is n past the wave kernel's VMEM residency).
* Window bases are 128-ALIGNED (i128 + j*h*b with h*b % 128 == 0), so the
  zone/lane arithmetic of the shared elimination kernels is valid in
  window-local coordinates (it depends on row indices only mod 128).

Same schedule and elimination arithmetic as band_chase_vmem /
band_chase_wave (shared code), hence bitwise-identical d/e to the VMEM
kernel (tested, incl. across the phase split); same output class as the
reference brd_p2 (svd_parallel.h:639).

Measured (3-rep loops, b=128, same-session A/B): the round-2 kernel
(per-sweep phase A at W=2176, sequential tail) ran n=7680 in 372 ms; the
session-5 rework took it to 288 ms (W 3328 + wavefront tail) and 246 ms
(grouped phase A); n=15360 ran 1341 ms with the wavefront tail alone and
966 ms grouped.  Beware the compile service's binary variance
(PERF_NOTES); all comparisons above are in-session.
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from svdsolver_tpu.ops.chase_schedule import nc_of, nc_of_static, s_max_of

from svdsolver_tpu.ops.pallas.band_chase_vmem import (
    _left_elim,
    _right_elim,
    _HBM_FAST_LANES,
)
from svdsolver_tpu.ops.pallas.band_chase_wave import (
    _n_lanes,
    _rec_flush,
    _rec_spad,
    _wave_tick,
    _wave_tick_rec,
)

DS = 512  # packed/streamed width: all live+bulge lanes are provably < 511
W = 3328  # window rows (26 * 128): must be >= (h + 1) * b + 136
# Recording variant's window rows: smaller, so BUF leaves VMEM room for the
# rotating record blocks (2*W_REC*DS*4 = 10.5 MB + ~2.5 MB records)
W_REC = 2560


def _hops_per_window(b, w_rows=W):
    """Largest h with (h+1)*b + 136 <= w_rows (window covers h hops plus the
    io <= 127 base-alignment offset and the 2b+8 elimination span) and
    h*b % 128 == 0 (keeps window bases 128-aligned)."""
    for h in range((w_rows - 136) // b - 1, 0, -1):
        if (h * b) % 128 == 0:
            return h
    return None


def _tail_rows_cap(b, w_rows=W):
    """Largest n_local whose FULL chase fits the (2*w_rows, DS) buffer: the
    deepest slab any phase-B sweep touches ends at n_local + 2b + 6."""
    return 2 * w_rows - 2 * b - 8


LG = 4  # phase-A group width: wavefront lanes per streamed pass (b >= 32)


def _group_hops_per_window(b, lg, w_rows=W):
    """Largest h with (3*lg + h)*b + 136 <= w_rows (the window must cover
    the io <= 127 base offset, the lg-lane wavefront span at 3-hop spacing,
    h ticks of advance, and the 2b+8 elimination span) and h*b % 128 == 0
    (keeps window bases 128-aligned)."""
    for h in range((w_rows - 136) // b - 3 * lg, 0, -1):
        if (h * b) % 128 == 0:
            return h
    return None


def _stream_chase_kernel(
    W,
    n,
    b,
    h,
    Npad,
    R0,
    Ltail,
    Lg,
    hg,
    rec,
    s_pad,
    s_blk_B,
    NB_A,
    NB_B,
    *refs,
):
    """Streamed chase over HBM-packed ``P`` (Npad, DS) via window buffer
    ``BUF`` ((2W, DS) VMEM — two W-row slots, selected by window parity).

    Sweeps [0, R0) stream (phase A); sweeps [R0, n-1) run entirely inside
    ``BUF`` on the resident tail P[R0:R0+2W) (phase B) — the 128-aligned
    cut R0 is chosen so the tail subproblem (n - R0 rows) fits.

    ``W`` is the window row count (static): the plain kernel uses the
    module default, the recording variant a smaller one.  With ``rec``
    (static bool, requires b == 128 and grouped/wavefront phases) the
    wavefront ticks additionally record every reflector into rotating
    VMEM blocks (phase A: ``NB_A`` blocks x ``s_pad`` rows; phase B:
    ``NB_B`` x ``s_blk_B``) and flush each sweep to the ``VRr``/``VLr``
    HBM outputs at its last hop (:func:`band_chase_wave._rec_flush`;
    phase-B flushes write ``s_blk_B`` rows at the global ``s_pad`` output
    stride — the wrapper masks the never-written remainder)."""
    if rec:
        (
            A_in, d_out, e_out, VRr, VLr,
            P, BUF, stage, PR, XC, REC,
            sem_pack, sem_in, sem_out, sem_rec,
        ) = refs
    else:
        (
            A_in, d_out, e_out,
            P, BUF, stage, PR, XC,
            sem_pack, sem_in, sem_out,
        ) = refs
    w = b + 1
    dtype = P.dtype
    zero = jnp.zeros((), dtype)
    hb = h * b
    n128 = -(-n // 128) * 128

    if rec:

        def flush_a(i_s, buf):
            _rec_flush(REC, VRr, VLr, sem_rec, s_pad, s_pad, 0, i_s, buf)

        def flush_b(i_s, buf):
            # phase-B sweep indices are tail-local; records land at the
            # global output slot (R0 + i_s) * s_pad, s_blk_B rows each
            _rec_flush(
                REC, VRr, VLr, sem_rec, s_blk_B, s_pad, R0, i_s, buf
            )

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

    # ---- phase A: streamed sweeps [0, R0) -------------------------------
    def n_chase_of(i):
        return nc_of(i, n, b)

    def prologue(i_, p_):
        # full window-0 load of sweep ``i_`` into slot parity ``p_``
        return pltpu.make_async_copy(
            P.at[pl.ds((i_ // 128) * 128, W)],
            BUF.at[pl.ds((p_ % 2) * W, W)],
            sem_in,
        )

    def sweep(i, carry):
        p, pref = carry  # window-0 slot parity; 1 if prologue prefetched
        i128 = (i // 128) * 128
        io = i - i128
        n_chase = n_chase_of(i)
        S = (n_chase + (h - 1)) // h  # >= 1 since n_chase >= 1

        def in_tail(j):
            # fresh rows of window j+1: P[base_j + W, +hb) -> slot(j+1)[W-hb:]
            off_n = ((p + j + 1) % 2) * W
            return pltpu.make_async_copy(
                P.at[pl.ds(i128 + j * hb + W, hb)],
                BUF.at[pl.ds(off_n + (W - hb), hb)],
                sem_in,
            )

        def out_part(j):
            off_c = ((p + j) % 2) * W
            return pltpu.make_async_copy(
                BUF.at[pl.ds(off_c, hb)],
                P.at[pl.ds(i128 + j * hb, hb)],
                sem_out,
            )

        def out_full(j):
            off_c = ((p + j) % 2) * W
            return pltpu.make_async_copy(
                BUF.at[pl.ds(off_c, W)],
                P.at[pl.ds(i128 + j * hb, W)],
                sem_out,
            )

        # window-0 load: prefetched by the previous sweep's last window
        # (wait only), or synchronous when not (first sweep / short sweep)
        @pl.when(pref == 0)
        def _sync_load():
            cp = prologue(i, p)
            cp.start()
            cp.wait()

        pl.when(pref == 1)(lambda: prologue(i, p).wait())

        # Next sweep's window 0 may be prefetched during this sweep's last
        # window iff S >= 3: its P rows [i128', i128'+W) (i128' <= i128+128)
        # are then final — retired by out_part(0..S-2), all completed by the
        # out_part(S-2) wait at window S-1 entry (128 + W <= 2*hb for every
        # supported band), and disjoint from out_full(S-1)'s write range
        # [i128+(S-1)*hb, ...).
        can_pref = jnp.logical_and(S >= 3, i + 1 < R0)

        def win(j, carry):
            # both offsets as parity * W products: Mosaic's alignment prover
            # accepts (traced) * (constant multiple of 8) but not W - off_c
            off_c = ((p + j) % 2) * W
            off_n = ((p + j + 1) % 2) * W
            # strict one-outstanding-copy-per-semaphore discipline: a DMA
            # semaphore counts bytes, so two equal-size copies in flight on
            # one sem would let a wait be satisfied by the WRONG completion
            pl.when(j >= 1)(lambda: out_part(j - 1).wait())
            pl.when(j >= 1)(lambda: in_tail(j - 1).wait())
            pl.when(j + 1 < S)(lambda: in_tail(j).start())
            pl.when(jnp.logical_and(j + 1 == S, can_pref))(
                lambda: prologue(i + 1, p + S).start()
            )

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
        return ((p + S) % 2, can_pref.astype(jnp.int32))

    # ---- phase A (grouped): Lg-sweep wavefront groups over [0, R0) ------
    # Group g streams sweeps [g*Lg, min((g+1)*Lg, R0)) down the band in ONE
    # windowed pass, running the wavefront tick schedule (lanes 3 hops
    # apart) inside each resident window: the larfg latency chains batch
    # Lg-wide AND the per-group DMA replaces Lg per-sweep passes.  Window j
    # covers packed rows [base + j*hg*b, + W) and handles ticks
    # [tstart + j*hg, tstart + (j+1)*hg) (window 0 also runs the ramp
    # [0, tstart)); with tstart = 3*Lg the group's shallowest future touch
    # at a window switch is lane Lg-1's pivot, 2b rows PAST the retired
    # region, and the deepest in-window touch is io + (3*Lg + hg)*b + 9
    # <= W (the _group_hops_per_window gate) — same disjointness, hence
    # the same bitwise-equality-to-sequential argument, as the wave
    # kernel's schedule, group-by-group.
    def group(g, carry):
        p, pref = carry
        tstart = 3 * Lg
        hgb = hg * b
        i0 = g * Lg
        i_hi = jnp.minimum(i0 + Lg, jnp.int32(R0)) - 1
        base = (i0 // 128) * 128
        t_max = 3 * (i_hi - i0) + n_chase_of(i_hi)
        S = 1 + jnp.maximum(
            jnp.int32(0), -(-(t_max + 1 - tstart - hg) // hg)
        )
        # prefetch data-finality: next group's window-0 rows [base', +W)
        # (base' <= base + 128) must be covered by COMPLETED out_parts
        # [base, base + (S-1)*hgb) at the window S-1 entry wait
        s_min = 1 + -(-(W + 128) // hgb)

        def in_tail(j):
            off_n = ((p + j + 1) % 2) * W
            return pltpu.make_async_copy(
                P.at[pl.ds(base + j * hgb + W, hgb)],
                BUF.at[pl.ds(off_n + (W - hgb), hgb)],
                sem_in,
            )

        def out_part(j):
            off_c = ((p + j) % 2) * W
            return pltpu.make_async_copy(
                BUF.at[pl.ds(off_c, hgb)],
                P.at[pl.ds(base + j * hgb, hgb)],
                sem_out,
            )

        def out_full(j):
            off_c = ((p + j) % 2) * W
            return pltpu.make_async_copy(
                BUF.at[pl.ds(off_c, W)],
                P.at[pl.ds(base + j * hgb, W)],
                sem_out,
            )

        @pl.when(pref == 0)
        def _sync_load():
            cp = prologue(i0, p)
            cp.start()
            cp.wait()

        pl.when(pref == 1)(lambda: prologue(i0, p).wait())

        can_pref = jnp.logical_and(S >= s_min, i0 + Lg < R0)

        def win(j, carry2):
            off_c = ((p + j) % 2) * W
            off_n = ((p + j + 1) % 2) * W
            pl.when(j >= 1)(lambda: out_part(j - 1).wait())
            pl.when(j >= 1)(lambda: in_tail(j - 1).wait())
            pl.when(j + 1 < S)(lambda: in_tail(j).start())
            pl.when(jnp.logical_and(j + 1 == S, can_pref))(
                lambda: prologue(i0 + Lg, p + S).start()
            )

            # window-local coords: subtract (base + j*hgb - off_c), a
            # 128-multiple, so the elimination zone arithmetic holds
            row_off = base + j * hgb - off_c
            t_lo = jnp.where(j == 0, jnp.int32(0), tstart + j * hg)
            t_hi = jnp.minimum(tstart + (j + 1) * hg, t_max + 1)

            def tick(t, c3):
                if rec:
                    _wave_tick_rec(
                        BUF, n, b, Lg, PR, XC, 3 * i0 + t,
                        REC, NB_A, s_pad, flush_a,
                        i_lo=i0, i_hi=i_hi, row_off=row_off,
                    )
                else:
                    _wave_tick(
                        BUF, n, b, Lg, PR, XC, 3 * i0 + t,
                        i_lo=i0, i_hi=i_hi, row_off=row_off,
                    )
                return c3

            lax.fori_loop(t_lo, t_hi, tick, 0)

            @pl.when(j + 1 < S)
            def _mid():
                BUF[pl.ds(off_n, W - hgb), :] = BUF[
                    pl.ds(off_c + hgb, W - hgb), :
                ]
                out_part(j).start()

            pl.when(j + 1 >= S)(lambda: out_full(j).start())
            return carry2

        lax.fori_loop(jnp.int32(0), S, win, 0)
        out_full(S - 1).wait()
        return ((p + S) % 2, can_pref.astype(jnp.int32))

    if R0 > 0 and Lg > 0:
        lax.fori_loop(
            jnp.int32(0),
            jnp.int32(-(-R0 // Lg)),
            group,
            (jnp.int32(0), jnp.int32(0)),
        )
    elif R0 > 0:
        lax.fori_loop(
            jnp.int32(0), jnp.int32(R0), sweep, (jnp.int32(0), jnp.int32(0))
        )

    # ---- phase B: VMEM-resident tail sweeps [R0, n-1) -------------------
    # P[R0 + r, l] = A[R0 + r, R0 + 128*(r//128) - 128 + l] for 128-aligned
    # R0: the tail slice of P IS the packed form of the trailing submatrix,
    # so the elimination kernels run on BUF in local coordinates unchanged.
    Trows = min(Npad - R0, 2 * W)
    n_local = n - R0
    cp = pltpu.make_async_copy(
        P.at[pl.ds(R0, Trows)], BUF.at[pl.ds(0, Trows)], sem_in
    )
    cp.start()
    cp.wait()

    if Ltail > 0 and n_local >= 2:
        # wavefront-batched tail: the resident slice IS a 128-aligned
        # packed window, so the wave tick runs on BUF in local coords
        # unchanged (bitwise-equal to the sequential sweeps — the wave
        # schedule's disjoint-slab linearization argument).
        def tick_tail(T, carry):
            if rec:
                _wave_tick_rec(
                    BUF, n_local, b, Ltail, PR, XC, T,
                    REC, NB_B, s_blk_B, flush_b,
                )
            else:
                _wave_tick(BUF, n_local, b, Ltail, PR, XC, T)
            return carry

        lax.fori_loop(
            jnp.int32(0), jnp.int32(3 * (n_local - 2) + 2), tick_tail, 0
        )
    else:
        # b < 32: head/lane slab disjointness fails — sequential sweeps

        def sweep_tail(i, carry):
            _right_elim(BUF, b, i, 1, b + 8, w)
            _left_elim(BUF, b, i + 1)
            n_chase = nc_of(i, n_local, b)

            def chase(k, c2):
                r = i + 1 + k * b
                _right_elim(BUF, b, r, b, 2 * b, 2 * b)
                _left_elim(BUF, b, r + b)
                return c2

            return lax.fori_loop(jnp.int32(0), n_chase, chase, carry)

        lax.fori_loop(jnp.int32(0), jnp.int32(n_local - 1), sweep_tail, 0)
    cp = pltpu.make_async_copy(
        BUF.at[pl.ds(0, Trows)], P.at[pl.ds(R0, Trows)], sem_out
    )
    cp.start()
    cp.wait()

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
    kernel: past the HBM kernel's row-stride cliff.  Below ~4100 rows the
    whole problem runs as the VMEM-resident tail phase (R0 = 0), so this
    kernel subsumes the band_chase_vmem routing slot — measured 3-4x more
    robust than the (Npad, 640)-buffer variant across that range (87 ms at
    n=3840/b=128) and it keeps winning where VMEM residency runs out."""
    b = int(band)
    if not stream_chase_supported(n, b):
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
    assert 128 + W <= 2 * h * b  # prefetch data-finality (see kernel)
    n128 = -(-n // 128) * 128
    Npad = -(-(n + b + W + 128) // 128) * 128
    nb = n128 // 128
    # 128-aligned phase cut: the trailing (n - R0)-row subproblem runs
    # VMEM-resident in BUF; everything before streams through windows
    tcap = _tail_rows_cap(b)
    R0 = -(-(n - tcap) // 128) * 128 if n > tcap else 0
    n_local = n - R0
    # wavefront tail lanes (0 selects the sequential fallback, b < 32 —
    # the wave tick's head/lane slab disjointness needs b >= 32)
    Ltail = _n_lanes(n_local, b) if (b >= 32 and n_local >= 2) else 0
    Lp = max(8, -(-(Ltail + 1) // 8) * 8)  # +1: head larfg slot
    # grouped phase A (0 selects the per-sweep fallback)
    Lg = LG if b >= 32 else 0
    hg = _group_hops_per_window(b, Lg) if Lg else 0
    if not hg:
        Lg = hg = 0
    if n128 != n:  # align for the pack DMAs
        A = jnp.pad(A, ((0, n128 - n), (0, n128 - n)))
    d2, e2, _ = pl.pallas_call(
        functools.partial(
            _stream_chase_kernel, W, n, b, h, Npad, R0, Ltail, Lg, hg,
            False, 0, 0, 0, 0,
        ),
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
            pltpu.VMEM((Lp, DS), dtype),
            pltpu.VMEM((b + 8, 128), dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(A)
    d = d2.reshape(-1)[:n]
    e = e2.reshape(-1)[: n - 1]
    return d, e


def _stream_accum_params(n, b):
    """Static geometry of the recording streamed chase (W_REC windows)."""
    h = _hops_per_window(b, W_REC)
    tcap = _tail_rows_cap(b, W_REC)
    R0 = -(-(n - tcap) // 128) * 128 if n > tcap else 0
    n_local = n - R0
    Ltail = _n_lanes(n_local, b)
    Lp = max(8, -(-(Ltail + 1) // 8) * 8)  # +1: head larfg slot
    hg = _group_hops_per_window(b, LG, W_REC)
    s_pad = _rec_spad(n, b)
    s_blk_B = _rec_spad(n_local, b)
    # phase-A blocks rotate within one LG-sweep group (previous groups are
    # fully flushed before the next starts); phase-B in-flight sweeps are
    # bounded by the lane count (block i is zeroed at tick 3i, sweep
    # i - NB_B's last hop is at 3(i - NB_B) + nc <= 3i - 6 + nc - 3*Ltail
    # < 3i since nc <= 3*Ltail)
    NB_A = LG
    NB_B = Ltail + 2
    rec_rows = max(NB_A * s_pad, NB_B * s_blk_B)
    return h, R0, n_local, Ltail, Lp, hg, s_pad, s_blk_B, NB_A, NB_B, rec_rows


def stream_chase_accum_supported(n, band):
    """Gate for the recording streamed chase: b == 128 (the record-roll
    canonicalization in band_chase_wave._rec_flush needs sweep-invariant
    lane offsets) and VMEM budget — BUF (2*W_REC, DS) + stage + pivot
    buffers + the rotating record blocks (phases are sequential, so the
    block scratch is sized max(phase A, phase B))."""
    b = int(band)
    if b != 128 or n < 2:
        return False
    (h, R0, n_local, Ltail, Lp, hg, s_pad, s_blk_B, NB_A, NB_B,
     rec_rows) = _stream_accum_params(n, b)
    if h is None or hg is None or Ltail < 1:
        return False
    vmem = (
        2 * W_REC * DS + 128 * DS + Lp * DS + (b + 8) * 128
        + rec_rows * (DS + 256)
    ) * 4
    return vmem <= 15 * 1024 * 1024


def stream_chase_accum_preferred(n, band):
    """Recording-chase routing slot past the wave kernel's VMEM residency
    (vectors.svd_two_stage checks wave_chase_accum_preferred first): the
    dense HBM recording kernel collapses past the row-stride cliff; this
    one keeps wavefront batching at streamed-window cost at any n."""
    b = int(band)
    if not stream_chase_accum_supported(n, b):
        return False
    mc = -(-2 * b // 128) * 128 + 128
    dense_lanes = -(-(n + b + mc + 16) // 128) * 128
    return dense_lanes > _HBM_FAST_LANES


def band_to_bidiagonal_pallas_stream_accum(A, band=128):
    """Recording streamed chase; returns ``(d, e, VL, TL, VR, TR)`` with
    the same record convention as band_chase.band_to_bidiagonal_pallas_accum
    (reflector (i, s) supported on rows/cols ``[i+1+s*band, i+1+(s+1)*band)``).
    Callers gate via :func:`stream_chase_accum_supported`.

    Extends full-SVD reflector recording past the wave kernel's VMEM
    residency (~n=5100 at band=128): phase A streams sweeps in recording
    wavefront groups, phase B records the resident tail.  Same schedule
    and elimination arithmetic as the plain streamed chase, so d/e are
    bitwise-identical to it (and to the VMEM/wave kernels)."""
    with jax.enable_x64(False):
        return _band_to_bidiagonal_pallas_stream_accum(A, band=band)


@functools.partial(jax.jit, static_argnames=("band",))
def _band_to_bidiagonal_pallas_stream_accum(A, band=128):
    n = A.shape[0]
    b = int(band)
    dtype = A.dtype
    if not stream_chase_accum_supported(n, b):
        raise ValueError(
            f"stream accum chase unsupported for n={n}, band={b}"
        )
    (h, R0, n_local, Ltail, Lp, hg, s_pad, s_blk_B, NB_A, NB_B,
     rec_rows) = _stream_accum_params(n, b)
    assert (h + 1) * b + 136 <= W_REC and (h * b) % 128 == 0
    assert 128 + W_REC <= 2 * h * b  # prefetch data-finality (see kernel)
    n128 = -(-n // 128) * 128
    Npad = -(-(n + b + W_REC + 128) // 128) * 128
    nb = n128 // 128
    if n128 != n:  # align for the pack DMAs
        A = jnp.pad(A, ((0, n128 - n), (0, n128 - n)))
    d2, e2, VRr, VLr, _ = pl.pallas_call(
        functools.partial(
            _stream_chase_kernel, W_REC, n, b, h, Npad, R0, Ltail, LG, hg,
            True, s_pad, s_blk_B, NB_A, NB_B,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nb, 128), dtype),
            jax.ShapeDtypeStruct((nb, 128), dtype),
            jax.ShapeDtypeStruct(((n - 1) * s_pad, 128), dtype),
            jax.ShapeDtypeStruct(((n - 1) * s_pad, 128), dtype),
            jax.ShapeDtypeStruct((Npad, DS), dtype),  # HBM pack buffer
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2 * W_REC, DS), dtype),
            pltpu.VMEM((128, DS), dtype),
            pltpu.VMEM((Lp, DS), dtype),
            pltpu.VMEM((b + 8, 128), dtype),
            pltpu.VMEM((rec_rows, DS + 256), dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(A)
    d = d2.reshape(-1)[:n]
    e = e2.reshape(-1)[: n - 1]

    s_max = s_max_of(n, b)
    VR = VRr.reshape(n - 1, s_pad, 128)[:, :s_max, :b]
    VL = VLr.reshape(n - 1, s_pad, 128)[:, :s_max, :b]
    # phase-B flushes write only s_blk_B of each sweep's s_pad output rows;
    # zero every slot past the sweep's schedule (head + nc hops) so the
    # never-written remainder (uninitialized HBM) cannot leak in
    iv = jnp.arange(n - 1, dtype=jnp.int32)
    nc = nc_of(iv, n, b)
    slot = jnp.arange(s_max, dtype=jnp.int32)
    valid = slot[None, :] <= nc[:, None]
    VR = jnp.where(valid[:, :, None], VR, jnp.zeros((), dtype))
    VL = jnp.where(valid[:, :, None], VL, jnp.zeros((), dtype))

    def tau_from_v(V):
        nrm2 = jnp.sum(V * V, axis=-1)
        return jnp.where(nrm2 == 0, jnp.zeros((), dtype), 2.0 / nrm2)

    return d, e, VL, tau_from_v(VL), VR, tau_from_v(VR)
