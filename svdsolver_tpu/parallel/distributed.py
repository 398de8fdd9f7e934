"""Sharded multi-chip SVD execution.

Design (scaling-book style): pick a mesh, annotate shardings, let XLA insert
the collectives.  Two axes:

* ``dp`` (data parallel): independent problem instances — a batch of matrices
  sharded on the leading axis; zero communication.
* ``tp`` (tensor parallel): rows of each matrix sharded across chips, so the
  Stage-I trailing-update GEMMs (``V^T A`` then ``A - V T^T W``) partition
  over the ICI with an all-reduce per panel — the same math as the
  single-chip path, compiled once under ``jit`` with sharding constraints.

The reference has no distributed layer (single process + one GPU); this is
the capability the TPU build adds on top of parity.
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

from svdsolver_tpu.ops.householder import householder_vector
from svdsolver_tpu.ops.precision import pdot

from svdsolver_tpu.models.two_stage import (
    dense_to_band,
    band_to_bidiagonal,
    make_window_pairs,
)
from svdsolver_tpu.models.diagonalize import bisect_svdvals


def dense_to_band_sharded(A, mesh, band=32):
    """Stage I with rows sharded over the mesh's ``tp`` axis."""
    A = jax.lax.with_sharding_constraint(
        A, NamedSharding(mesh, P("tp", None))
    )
    return dense_to_band(A, band=band)


@functools.partial(jax.jit, static_argnames=("band", "mesh"))
def _svdvals_batch(As, mesh, band):
    n = As.shape[-1]

    def one(A):
        A = jax.lax.with_sharding_constraint(
            A, NamedSharding(mesh, P(None, "tp"))
        )
        Ab = dense_to_band(A, band=band)
        d, e = band_to_bidiagonal(Ab, band=band)
        # bisection: fixed iteration count -> no cross-batch while_loop
        # convergence coupling under vmap, and fully vectorized on-device
        return bisect_svdvals(d, e)[:n]

    return jax.vmap(one)(As)


def svdvals_batch_sharded_gspmd(As, mesh, band=32):
    """GSPMD variant of the batch path: shardings annotated, XLA places the
    collectives.  VERIFIED FINDING (compiled-HLO inspection, n=32/tp=4): XLA
    partitions most contractions (all-reduces present) but also ALL-GATHERS
    the full per-dp-shard matrices at some program points — i.e. it partially
    replicates A when its cost model prefers to.  The default
    :func:`svdvals_batch_sharded` therefore uses explicit shard_map
    collectives, where replication is impossible by construction.
    """
    As = jax.device_put(As, NamedSharding(mesh, P("dp", None, "tp")))
    return _svdvals_batch(As, mesh, band)


def svdvals_batch_sharded(As, mesh, band=32):
    """Singular values of a batch of square matrices, multi-chip.

    ``As``: (batch, n, n); the batch axis shards over ``dp`` (zero
    communication) and each matrix's columns over ``tp``.  Stage I runs with
    hand-placed collectives (psum/all_gather riding the ICI — see
    :func:`dense_to_band_shardmap`); the small band matrices are then
    all-gathered once and Stage II + bisection run replicated per dp-group.
    """
    from jax import shard_map

    batch, n, _ = As.shape
    b = int(band)
    n_dev = mesh.shape["tp"]
    if n % b != 0 or n % n_dev != 0:
        raise ValueError(f"n={n} must divide by band={b} and tp={n_dev}")
    if batch % mesh.shape["dp"] != 0:
        raise ValueError(
            f"batch={batch} must divide by dp={mesh.shape['dp']}"
        )
    As = jax.device_put(As, NamedSharding(mesh, P("dp", None, "tp")))

    def body(A_loc):  # (batch_loc, n, n_loc)
        Ab_loc = jax.vmap(
            functools.partial(_stage1_local, n=n, b=b, n_loc=n // n_dev)
        )(A_loc)
        Ab = jax.lax.all_gather(Ab_loc, "tp", axis=2, tiled=True)
        d, e = jax.vmap(lambda M: band_to_bidiagonal(M, band=b))(Ab)
        return jax.vmap(bisect_svdvals)(d, e)[:, :n]

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=P("dp", None, "tp"),
        out_specs=P("dp", None),
        check_vma=False,
    )
    return fn(As)


def dense_to_band_shardmap(A, mesh, band=32):
    """Stage I with explicit collectives: ``shard_map`` over the ``tp`` axis.

    Layout: ``A`` column-sharded — each device holds an (n, n/P) block.  Per
    panel step:

    * QR panel: the owner's columns are broadcast by a ``psum`` of masked
      local contributions; every device factors the (replicated) panel
      redundantly (O(n b^2) — cheap vs the trailing update), then applies
      the block reflector to its local columns with **zero** communication
      (``W_loc = V^T A_loc`` is column-local).
    * LQ panel: the (b, n) row slab is assembled the same way (psum of
      masked slices along the column axis); the right update needs one
      ``psum`` for ``A V`` (a row-sharded x column-sharded contraction),
      then applies locally.

    Three (n x b)-sized collectives per panel step, all riding ICI — the
    hand-placed version of what GSPMD inserts for the jit path.  Exactly
    the panel-sweep schedule of models/two_stage.dense_to_band.
    """
    from jax import shard_map

    n = A.shape[0]
    b = int(band)
    n_dev = mesh.shape["tp"]
    if n % b != 0 or n % n_dev != 0:
        raise ValueError(f"n={n} must divide by band={b} and tp={n_dev}")

    fn = shard_map(
        functools.partial(_stage1_local, n=n, b=b, n_loc=n // n_dev),
        mesh=mesh,
        in_specs=P(None, "tp"),
        out_specs=P(None, "tp"),
        check_vma=False,
    )
    return fn(A)


def _stage1_local(A_loc, *, n, b, n_loc, uv=False):
    """Per-device Stage I body (column-sharded over axis name ``tp``): the
    panel-sweep schedule of models/two_stage.dense_to_band with hand-placed
    psum/all_gather collectives.  See :func:`dense_to_band_shardmap`.

    With ``uv=True`` the orthogonal factors accumulate alongside
    (column-sharded like ``A``): per panel ``U1 <- U1 (I - V T V^T)`` costs
    one extra psum for the (n, b) product ``U1 V`` (contraction over the
    sharded axis) and a local GEMM — returns ``(A_loc, U1_loc, V1_loc)``."""
    dtype = A_loc.dtype
    t = jax.lax.axis_index("tp")
    col0 = t * n_loc  # global index of this device's first column

    def panel_qr_local(P_panel, r_off):
        """Replicated compact-WY panel factorization (b columns)."""
        V = jnp.zeros((n, b), dtype)
        T = jnp.zeros((b, b), dtype)
        ridx = jnp.arange(n)

        def col(j, carry):
            Pp, V, T = carry
            p = r_off + j
            v, tau, beta = householder_vector(Pp[:, j], p)
            Pp = Pp - tau * jnp.outer(v, pdot(v, Pp))
            colj = jnp.where(ridx > p, jnp.zeros((), dtype), Pp[:, j])
            pc = jnp.minimum(p, n - 1)
            colj = colj.at[pc].set(jnp.where(p < n, beta, colj[pc]))
            Pp = Pp.at[:, j].set(colj)
            w = pdot(V.T, v)
            T = T.at[:, j].set(-tau * pdot(T, w)).at[j, j].set(tau)
            V = V.at[:, j].set(v)
            return Pp, V, T

        return lax.fori_loop(0, b, col, (P_panel, V, T))

    def step(k, carry):
        A_loc, U1_loc, V1_loc = carry
        c = k * b
        # --- QR: broadcast the owner's panel columns ---
        lidx = jnp.arange(n_loc) + col0  # global indices of local cols
        own = jnp.logical_and(lidx >= c, lidx < c + b)
        contrib = jnp.where(own[None, :], A_loc, jnp.zeros((), dtype))
        # scatter local columns into panel slots, then sum across devices
        slot = jnp.clip(lidx - c, 0, b - 1)
        panel_part = jnp.zeros((n, b), dtype).at[:, slot].add(
            jnp.where(own[None, :], contrib, 0.0)
        )
        panel = jax.lax.psum(panel_part, "tp")  # replicated (n, b)
        R, V, T = panel_qr_local(panel, c)
        # local trailing update (no comm: columns are local)
        W = pdot(V.T, A_loc)
        A_loc = A_loc - pdot(V, pdot(T.T, W))
        # owner writes R back into its columns
        Rcols = R[:, slot]
        A_loc = jnp.where(own[None, :], Rcols, A_loc)
        zero = jnp.zeros((), col0.dtype)
        if uv:
            # U1 (I - V T V^T): contraction of U1's sharded columns with
            # V's matching rows -> one psum; the update is then local
            V_loc = lax.dynamic_slice(V, (col0, zero), (n_loc, b))
            UV = jax.lax.psum(pdot(U1_loc, V_loc), "tp")  # (n, b)
            U1_loc = U1_loc - pdot(pdot(UV, T), V_loc.T)

        # --- LQ: assemble the (b, n) row slab, factor on transpose ---
        ci = jnp.asarray(c, col0.dtype)
        slab_loc = lax.dynamic_slice(A_loc, (ci, zero), (b, n_loc))
        slab = jax.lax.all_gather(slab_loc, "tp", axis=1, tiled=True)
        Rl, Vl, Tl = panel_qr_local(slab.T, c + b)  # V (n, b) row space
        # right update: A V needs a psum over column shards
        Vl_loc = lax.dynamic_slice(Vl, (col0, zero), (n_loc, b))
        AV_part = pdot(A_loc, Vl_loc)
        AV = jax.lax.psum(AV_part, "tp")  # (n, b) replicated
        A_loc = A_loc - pdot(pdot(AV, Tl), Vl_loc.T)
        # write the factored rows back (local slice of R^T)
        Rrows = lax.dynamic_slice(Rl.T, (zero, col0), (b, n_loc))
        A_loc = lax.dynamic_update_slice(A_loc, Rrows, (c, 0))
        if uv:
            V1V = jax.lax.psum(pdot(V1_loc, Vl_loc), "tp")
            V1_loc = V1_loc - pdot(pdot(V1V, Tl), Vl_loc.T)
        return A_loc, U1_loc, V1_loc

    if uv:
        ridx = jnp.arange(n)[:, None]
        eye_loc = jnp.where(
            ridx == (jnp.arange(n_loc)[None, :] + col0),
            jnp.ones((), dtype),
            jnp.zeros((), dtype),
        )
        init = (A_loc, eye_loc, eye_loc)
    else:
        dummy = jnp.zeros((1, 1), dtype)
        init = (A_loc, dummy, dummy)
    A_loc, U1_loc, V1_loc = lax.fori_loop(0, n // b, step, init)
    return (A_loc, U1_loc, V1_loc) if uv else A_loc


def band_to_bidiagonal_pipelined(A, mesh, band=32, sweeps_per_group=None):
    """Stage II band->bidiagonal, multi-chip: a pipelined bulge chase over
    row-sharded devices.  Returns ``(d, e)`` — a valid bidiagonal reduction
    of the band matrix whose SPECTRUM matches the local
    :func:`~svdsolver_tpu.models.two_stage.band_to_bidiagonal` (up to
    reordering roundoff; gated at ~1e-13 in f64 by
    tests/test_distributed.py).  The entries themselves are NOT bitwise
    equal to the sequential chase: the staggered group frontiers interleave
    sweeps in a different (dependency-complete, hence valid) elimination
    order, and a band matrix's bidiagonal reduction is only unique up to
    the reflector order/signs.

    The reference's chase (brd_p2, svd_parallel.h:639) is strictly
    sequential; the single-chip TPU kernels pipeline sweeps 3 chase-slots
    apart (the wavefront disjointness proof, models/two_stage.py:366).  This
    is the *multi-chip* form of that schedule — the ELPA-style distributed
    chase, built from three invariants:

    * **Row ownership**: device ``d`` owns padded rows ``[d*m, (d+1)*m)``
      (full column width) plus an upper halo of ``U = 3*step*(LG-1)`` rows
      and a lower halo of ``ww`` rows (``ww`` = window edge ``2*band``).
    * **Staggered frontiers**: sweeps advance in groups of ``LG``; within a
      pass over device ``d``, the ``l``-th sweep of the group stops its
      frontier at row ``(d+1)*m - 3*step*l``, so at every hand-off the
      group's sweeps keep the 3-slot spacing that makes all pending windows
      disjoint.  Every window therefore sees dependency-complete inputs
      (a valid reduction), though interleaved across sweeps in a different
      order than the sequential chase (see the return-contract note above).
    * **2-superstep pipelining**: group ``g`` runs on device ``d`` at
      superstep ``2g + d``, so adjacent devices are never active together
      and every boundary block ``[d*m - U, d*m + ww)`` has a unique writer
      per superstep.  After each superstep the two boundary blocks move by
      nearest-neighbor ``ppermute`` (one up + one down, riding ICI), which
      restores the invariant that all replicas of a row agree.

    Pipeline efficiency approaches ``P/2`` (P devices, ``2*ceil((n-1)/LG)
    + P - 1`` supersteps); per-superstep traffic is two ``(U + ww, Np)``
    blocks between neighbors — independent of n's leading dimension.
    """
    from jax import shard_map

    n = A.shape[0]
    dtype = A.dtype
    b = int(band)
    w = b + 1
    step = w - 1
    ww = 2 * w - 2
    n_dev = int(mesh.shape["tp"])
    if n < 2:
        return jnp.abs(jnp.diag(A)), jnp.zeros((0,), dtype)

    # Geometry: m rows per device; LG sweeps per group, bounded so the
    # staggered frontiers plus one window fit inside one device's rows.
    m_base = -(-(n + 2 * w + 2) // n_dev)
    if sweeps_per_group is None:
        LG = max(1, min((m_base - ww) // (3 * step) + 1, 64))
    else:
        LG = max(1, int(sweeps_per_group))
    U = 3 * step * (LG - 1)
    # An explicit sweeps_per_group whose staggered frontier span exceeds the
    # balanced row budget inflates every device's rows (and the padded Np x Np
    # working set) so the span still fits — useful for exercising the stagger
    # at small n, wasteful at scale; the auto heuristic above never inflates.
    m = max(m_base, U + ww)
    Np = n_dev * m
    NG = -(-(n - 1) // LG)  # sweep groups
    T = 2 * NG + n_dev - 1  # supersteps
    # chase slots one device can hold per sweep (last device adds the U
    # stagger span and the zero-pad tail)
    S_chase = (m + U + 2 * w + 2) // step + 2

    Ap = jnp.pad(A, ((0, Np - n), (0, Np - n)))

    top_pair, chase_pair = make_window_pairs(w)

    def body(A_loc):  # (m, Np) local row block
        d = jax.lax.axis_index("tp")
        R0 = d * m  # first owned (padded-global) row
        last = d == n_dev - 1
        # Local buffer: [upper halo U | own m | lower halo ww | dummy ww].
        # Halos start zero for d==0 / d==P-1 (they map to no rows, never
        # read) and are synchronized by the boundary exchange otherwise;
        # the initial input is globally consistent, so pulling each halo
        # from the neighbours' (identical) initial shard via one ppermute
        # seeds the invariant.
        L = jnp.zeros((U + m + 2 * ww, Np), dtype)
        L = lax.dynamic_update_slice(L, A_loc, (U, 0))
        if n_dev > 1:
            up0 = jax.lax.ppermute(
                A_loc[:ww], "tp", [(i + 1, i) for i in range(n_dev - 1)]
            )
            L = lax.dynamic_update_slice(L, up0, (U + m, 0))
            if U > 0:
                dn0 = jax.lax.ppermute(
                    A_loc[m - U :], "tp",
                    [(i, i + 1) for i in range(n_dev - 1)],
                )
                L = lax.dynamic_update_slice(L, dn0, (0, 0))
        dz_r = jnp.int32(U + m + ww)  # dummy zone: zero rows, no-op windows
        zero = jnp.int32(0)

        def active(t, dev):
            q = t - dev
            return (q >= 0) & (q % 2 == 0) & (q // 2 < NG)

        def run_sweep(l, carry):
            L, g = carry
            i = g * LG + l  # global sweep index (unpadded coords)
            lo = R0 - l * 3 * step
            hi = jnp.where(last, jnp.int32(Np), R0 + m - l * 3 * step)
            ok_sweep = i <= n - 2
            n_chase = (
                lax.max(
                    jnp.int32(0),
                    -(-(jnp.int32(n) - (i + 2 * w - 1)) // step),
                )
                + 1
            )
            # top slot (row i)
            okt = ok_sweep & (i >= lo) & (i < hi)
            tr = jnp.where(okt, i - R0 + U, dz_r)
            tc = jnp.where(okt, i + 1, zero)
            Wt = lax.dynamic_slice(L, (tr, tc), (w, ww))
            L = lax.dynamic_update_slice(L, top_pair(Wt), (tr, tc))
            # chase slots with start row in [lo, hi)
            k0 = lax.max(jnp.int32(0), (lo - i - 1 + step - 1) // step)

            def slot(s, L):
                k = k0 + s
                r = i + 1 + k * step
                ok = ok_sweep & (k < n_chase) & (r >= lo) & (r < hi)
                lr = jnp.where(ok, r - R0 + U, dz_r)
                lc = jnp.where(ok, r + step, zero)
                W = lax.dynamic_slice(L, (lr, lc), (ww, ww))
                return lax.dynamic_update_slice(L, chase_pair(W), (lr, lc))

            L = lax.fori_loop(0, S_chase, slot, L)
            return L, g

        def superstep(t, L):
            g = (t - d) // 2
            act = active(t, d)
            # masked pass: inactive devices redirect every window to the
            # dummy zone by faking an out-of-range group
            g_eff = jnp.where(act, g, jnp.int32(n))  # i > n-2 -> all no-ops
            L, _ = lax.fori_loop(0, LG, run_sweep, (L, g_eff))
            if n_dev == 1:
                return L
            # boundary exchange: block X_b = rows [b*m - U, b*m + ww)
            blk = U + ww
            down = jax.lax.ppermute(
                lax.dynamic_slice(L, (jnp.int32(m), zero), (blk, Np)),
                "tp",
                [(i, i + 1) for i in range(n_dev - 1)],
            )
            up = jax.lax.ppermute(
                lax.dynamic_slice(L, (zero, zero), (blk, Np)),
                "tp",
                [(i + 1, i) for i in range(n_dev - 1)],
            )
            took_down = (d >= 1) & active(t, d - 1)
            took_up = (d <= n_dev - 2) & active(t, d + 1)
            cur_head = lax.dynamic_slice(L, (zero, zero), (blk, Np))
            cur_tail = lax.dynamic_slice(L, (jnp.int32(m), zero), (blk, Np))
            L = lax.dynamic_update_slice(
                L, jnp.where(took_down, down, cur_head), (zero, zero)
            )
            L = lax.dynamic_update_slice(
                L, jnp.where(took_up, up, cur_tail), (jnp.int32(m), zero)
            )
            return L

        L = lax.fori_loop(0, T, superstep, L)
        own = lax.dynamic_slice(L, (jnp.int32(U), zero), (m, Np))
        cols = jnp.minimum(R0 + jnp.arange(m), Np - 1)
        d_loc = jnp.take_along_axis(own, cols[:, None], axis=1)[:, 0]
        e_loc = jnp.take_along_axis(
            own, jnp.minimum(cols + 1, Np - 1)[:, None], axis=1
        )[:, 0]
        return d_loc, e_loc

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=P("tp", None),
        out_specs=(P("tp"), P("tp")),
        check_vma=False,
    )
    Ap = jax.device_put(Ap, NamedSharding(mesh, P("tp", None)))
    d_full, e_full = fn(Ap)
    return d_full[:n], e_full[: n - 1]


def svdvals_sharded(A, mesh, band=32, stage2="local"):
    """Singular values of ONE large square matrix, multi-chip.

    Composition: Stage I runs sharded over the mesh's ``tp`` axis with
    explicit collectives (:func:`dense_to_band_shardmap` — the FLOP-heavy
    part), then the small band matrix is replicated (one all-gather of
    n*(band+1) values) and Stage II + bisection run locally — the band and
    bidiagonal stages are memory-latency-bound and tiny, so sharding them
    would only add ICI latency at the sizes one chip's HBM can hold.

    ``stage2="pipelined"`` instead runs the chase row-sharded across the
    mesh (:func:`band_to_bidiagonal_pipelined`) — the fully-distributed
    pipeline for matrices too large to replicate on one chip.
    """
    if stage2 not in ("local", "pipelined"):
        raise ValueError(f"stage2 must be 'local' or 'pipelined', got {stage2!r}")
    n = A.shape[0]
    Ab = dense_to_band_shardmap(A, mesh, band=band)
    if stage2 == "pipelined":
        d, e = band_to_bidiagonal_pipelined(Ab, mesh, band=band)
    else:
        Ab = jax.device_put(Ab, NamedSharding(mesh, P()))  # replicate band
        d, e = band_to_bidiagonal(Ab, band=band)
    return bisect_svdvals(d, e)[:n]


def svd_sharded(A, mesh, band=32):
    """Full SVD of ONE large square matrix, multi-chip: returns
    ``(U, s, Vh)`` with ``A ~= U @ diag(s) @ Vh``.

    Composition (FLOPs sharded, latency-bound small stages replicated):

    * Stage I with U1/V1 accumulation runs column-sharded over ``tp`` with
      explicit collectives (one extra psum per panel per factor — see
      :func:`_stage1_local` ``uv=True``);
    * the small band matrix replicates once; the recording chase, bisection
      and TGK inverse iteration run locally (O(n^2) work vs Stage I's
      O(n^3));
    * chase back-transforms apply to COLUMN BLOCKS of U_b/V_b per device
      (row-space operators — zero communication), and the final
      ``U = U1 @ (L U_b)`` contractions run over the sharded axis with a
      ``psum_scatter`` each, leaving U and V column-sharded.

    The reference has no distributed layer and no singular vectors from its
    two-stage path (svd_parallel.h:400-407 promises U1/V1 it never
    delivers); this is the capability the TPU build adds on top of parity.
    """
    from jax import shard_map
    from svdsolver_tpu.models.two_stage import band_to_bidiagonal_accum
    from svdsolver_tpu.models.vectors import (
        _apply_chase_reflectors_wy,
        tgk_vectors,
    )

    n = A.shape[0]
    b = int(band)
    n_dev = mesh.shape["tp"]
    n_loc = n // n_dev
    if n % b != 0 or n % n_dev != 0:
        raise ValueError(f"n={n} must divide by band={b} and tp={n_dev}")

    stage1 = shard_map(
        functools.partial(_stage1_local, n=n, b=b, n_loc=n_loc, uv=True),
        mesh=mesh,
        in_specs=P(None, "tp"),
        out_specs=(P(None, "tp"), P(None, "tp"), P(None, "tp")),
        check_vma=False,
    )
    A = jax.device_put(A, NamedSharding(mesh, P(None, "tp")))
    Ab, U1, V1 = stage1(A)

    Ab_rep = jax.device_put(Ab, NamedSharding(mesh, P()))
    d, e, VL, TL, VR, TR = band_to_bidiagonal_accum(Ab_rep, band=b)
    s_used = max(0, -(-(n - (2 * (b + 1) - 1)) // b)) + 2
    if s_used < VL.shape[1]:
        VL, TL = VL[:, :s_used], TL[:, :s_used]
        VR, TR = VR[:, :s_used], TR[:, :s_used]
    # route the bisection by the MESH platform (use_pallas checks the
    # default backend, which stays TPU even for a virtual CPU mesh)
    if next(iter(mesh.devices.flat)).platform == "tpu":
        from svdsolver_tpu.ops.pallas.bisect import bisect_svdvals_pallas

        s = bisect_svdvals_pallas(d, e)
    else:
        s = bisect_svdvals(d, e)
    U_b, V_b = tgk_vectors(d, e, s)

    def back(U1_loc, V1_loc, Ub_loc, Vb_loc, VL, TL, VR, TR):
        # chase operators act on rows; column blocks transform independently
        LU = _apply_chase_reflectors_wy(VL, TL, Ub_loc, b)
        RV = _apply_chase_reflectors_wy(VR, TR, Vb_loc, b)
        t = jax.lax.axis_index("tp")
        zero = jnp.zeros((), jnp.int32)
        # U = U1 @ LU: the contraction runs over U1's sharded columns ==
        # LU's rows, but each device holds LU's COLUMN block — all_gather
        # the columns, slice this device's row block, contract, and
        # psum_scatter the partials back to column blocks.
        U_part = pdot(U1_loc, lax.dynamic_slice(
            jax.lax.all_gather(LU, "tp", axis=1, tiled=True),
            (t * n_loc, zero), (n_loc, n),
        ))
        V_part = pdot(V1_loc, lax.dynamic_slice(
            jax.lax.all_gather(RV, "tp", axis=1, tiled=True),
            (t * n_loc, zero), (n_loc, n),
        ))
        U_loc = jax.lax.psum_scatter(
            U_part, "tp", scatter_dimension=1, tiled=True
        )
        V_loc = jax.lax.psum_scatter(
            V_part, "tp", scatter_dimension=1, tiled=True
        )
        return U_loc, V_loc

    backf = shard_map(
        back,
        mesh=mesh,
        in_specs=(
            P(None, "tp"), P(None, "tp"), P(None, "tp"), P(None, "tp"),
            P(), P(), P(), P(),
        ),
        out_specs=(P(None, "tp"), P(None, "tp")),
        check_vma=False,
    )
    Ub_sh = jax.device_put(U_b, NamedSharding(mesh, P(None, "tp")))
    Vb_sh = jax.device_put(V_b, NamedSharding(mesh, P(None, "tp")))
    U, V = backf(U1, V1, Ub_sh, Vb_sh, VL, TL, VR, TR)
    return U, s[:n], V.T


def dryrun(n_devices: int, platform=None) -> None:
    """Compile + execute one fully-sharded step on tiny shapes.

    Builds an ``n_devices`` mesh (dp x tp), runs a data-parallel batch of
    tensor-parallel two-stage SVDs, and checks the result is finite and
    matches the single-device path.  ``platform`` pins the mesh's backend
    (e.g. ``"cpu"`` for the virtual host mesh); every input is explicitly
    placed on that mesh so the default backend is never touched.
    """
    import numpy as np
    from svdsolver_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(n_devices, platform=platform)
    batch = 2 * mesh.shape["dp"]
    n, band = 32, 8
    rng = np.random.default_rng(0)
    # explicit-collective Stage I (shard_map psum/all_gather over tp)
    A0 = jax.device_put(
        rng.normal(size=(n, n)).astype(np.float32),
        NamedSharding(mesh, P(None, "tp")),
    )
    Ab = jax.block_until_ready(dense_to_band_shardmap(A0, mesh, band=band))
    s_band = np.linalg.svd(np.asarray(Ab, np.float64), compute_uv=False)
    s_ref = np.linalg.svd(np.asarray(A0, np.float64), compute_uv=False)
    assert np.max(np.abs(s_band - s_ref)) / s_ref[0] < 1e-4, "shard_map stage I"
    # sharded single-matrix svdvals (stage I over tp, gathered band local)
    sig1 = np.asarray(jax.block_until_ready(svdvals_sharded(A0, mesh, band=band)))
    err1 = float(np.max(np.abs(sig1 - s_ref)) / s_ref[0])
    assert err1 < 1e-4, f"svdvals_sharded mismatch vs LAPACK: {err1}"
    # fully-distributed pipeline: Stage II as the pipelined multi-chip chase
    sig2 = np.asarray(
        jax.block_until_ready(
            svdvals_sharded(A0, mesh, band=band, stage2="pipelined")
        )
    )
    err2 = float(np.max(np.abs(sig2 - s_ref)) / s_ref[0])
    assert err2 < 1e-4, f"pipelined stage-II mismatch vs LAPACK: {err2}"
    # sharded single-matrix FULL SVD (factor accumulation + back-transform)
    U, sv, Vh = (
        np.asarray(jax.block_until_ready(x))
        for x in svd_sharded(A0, mesh, band=band)
    )
    An = np.asarray(A0)
    errv = float(
        np.abs(U @ np.diag(sv) @ Vh - An).max() / np.abs(An).max()
    )
    assert errv < 1e-4, f"svd_sharded reconstruction: {errv}"
    # multi-chip block Jacobi (systolic ppermute tournament over tp);
    # needs two column blocks per device, so skip on a tp=1 mesh
    if mesh.shape["tp"] >= 2:
        from svdsolver_tpu.parallel.jacobi import svd_jacobi_sharded

        Uj, sj, Vhj = (
            np.asarray(jax.block_until_ready(x))
            for x in svd_jacobi_sharded(A0, mesh)
        )
        errj = float(
            np.abs(Uj @ np.diag(sj) @ Vhj - An).max() / np.abs(An).max()
        )
        assert errj < 1e-3, f"svd_jacobi_sharded reconstruction: {errj}"
    # GSPMD batch path (dp x tp shardings under jit); svdvals_batch_sharded
    # device_puts the raw numpy batch straight onto the mesh.
    As = rng.uniform(0.0, 5.0, (batch, n, n)).astype(np.float32)
    sig = jax.block_until_ready(svdvals_batch_sharded(As, mesh, band=band))
    assert sig.shape == (batch, n), sig.shape
    assert bool(jnp.all(jnp.isfinite(sig))), "non-finite singular values"
    ref = np.linalg.svd(np.asarray(As, np.float64), compute_uv=False)
    err = float(np.max(np.abs(np.asarray(sig) - ref) / ref[:, :1]))
    assert err < 1e-4, f"sharded svd mismatch vs LAPACK: {err}"
    print(
        f"dryrun_multichip OK: mesh={dict(mesh.shape)} batch={batch} "
        f"n={n} band={band} max_rel_err={err:.2e}"
    )
