"""Pallas kernel: bidiagonal singular values by parallel multisection.

Same algorithm as models/diagonalize.py:bisect_svdvals (Sturm pivot counts
on the Golub-Kahan tridiagonal, all n values bracketed simultaneously), with
three TPU-specific accelerations:

* shift lanes live in an (8, W) buffer so every VPU sublane is busy (a
  (1, n) layout uses 1/8 of the vector unit);
* the pivot count uses a *twisted factorization* (Fernando/Parlett-style):
  forward pivots ``p_i = -lam - z_i^2/p_{i-1}`` from the top and backward
  pivots ``q_i = -lam - z_i^2/q_{i+1}`` from the bottom run in the same
  loop iteration (independent chains, so the two divide latencies overlap)
  and meet at the twist index m = n+1, where Sylvester inertia gives
  ``negcount = #neg(p) + #neg(q) + (gamma < 0)`` with
  ``gamma = p_m + q_m + lam``.  Sequential depth halves: n steps, not 2n;
* **multisection** (``probes=k``): each bracket probes k equispaced interior
  points per sweep (probe-major (8, k*W) state; the z-stream loads/rolls are
  shared across probes), gaining log2(k+1) bits per sweep instead of 1.
  Measured on v5e: a LOSS at every size — per-sweep cost grows ~linearly
  with k (n=3200: k=1 8.6 ms, k=3 9.9, k=7 13.0 at equal total bits), i.e.
  the chain is VPU *issue*-bound (~8 ops x 4-8 vregs/step ~ 65 cycles),
  not divide-latency-bound, so extra probe lanes cannot ride a latency
  shadow (a (k, 8, W) leading-dim layout is 2-3x worse still).  Default
  stays ``probes=1``; the parameter remains for re-testing on future
  hardware where divides stall the issue pipe.

The recurrences need one z^2 scalar per step; dynamic scalar indexing is
not tile-aligned on TPU, so each 128-wide block is sliced once and 8
scalars are read at static lanes between cheap (1, 128) rotations
(``pltpu.roll``).
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _bisect_kernel(n, iters, k, z2f_ref, z2r_ref, bound_ref, out_ref):
    dtype = out_ref.dtype
    rows, W = out_ref.shape  # shift lanes as (8, W): all 8 VPU sublanes busy
    zero = jnp.zeros((), dtype)
    bound = bound_ref[0, 0]
    ks = (
        lax.broadcasted_iota(jnp.int32, (rows, W), 0) * W
        + lax.broadcasted_iota(jnp.int32, (rows, W), 1)
    )
    lane_ok = ks < n
    # Probe-major 2D state (8, k*W): probe j of value (r, c) lives at lane
    # j*W + c — the chain stays pure (8, k*W) vreg arithmetic (a (k, 8, W)
    # leading-dim layout measured 2-3x slower: Mosaic does not pipeline the
    # per-probe minor ops under the divide latency the way wide lanes do).
    kW = k * W
    jp1 = (
        lax.broadcasted_iota(jnp.int32, (rows, kW), 1) // W
    ).astype(dtype) + 1.0
    ksk = (
        lax.broadcasted_iota(jnp.int32, (rows, kW), 0) * W
        + lax.broadcasted_iota(jnp.int32, (rows, kW), 1) % W
    )

    lo0 = jnp.zeros((rows, W), dtype)
    hi0 = jnp.full((rows, W), bound, dtype)

    # Chain length: n steps each.  Forward step j produces p_{2+j}; backward
    # starts with a sacrificial zero so step 0 re-derives (and counts) q_{2n}
    # without a separate init count; step n-1 yields the twist operands
    # p_{n+1} / q_{n+1}.  The hot loop counts EVERY step unmasked (full
    # 128-blocks only); the two over-counted twist operands are subtracted
    # at the end, and a possible partial tail block runs a masked variant.
    n_full = n // 128
    n_tail = n - n_full * 128

    def biter(_, lohi):
        lo, hi = lohi
        h = (hi - lo) / (k + 1)
        lo_t = jnp.concatenate([lo] * k, axis=1) if k > 1 else lo
        h_t = jnp.concatenate([h] * k, axis=1) if k > 1 else h
        lam = lo_t + jp1 * h_t  # (8, k*W), lam ascends with probe index j
        p0 = -lam  # p_1
        cnt0 = (p0 < 0).astype(jnp.int32)

        def block(jb, carry):
            p, q, cnt = carry
            off = pl.multiple_of(jb * 128, 128)
            zbf = z2f_ref[0:1, pl.ds(off, 128)]
            zbr = z2r_ref[0:1, pl.ds(off, 128)]

            def sub(m8, carry2):
                p, q, cnt, zbf, zbr = carry2
                for m in range(8):  # static unroll: lane m reads are static
                    p = -lam - zbf[0, m] / p
                    q = -lam - zbr[0, m] / q
                    cnt = cnt + (p < 0)
                    cnt = cnt + (q < 0)
                zbf = pltpu.roll(zbf, 120, 1)  # rotate left by 8 lanes
                zbr = pltpu.roll(zbr, 120, 1)
                return p, q, cnt, zbf, zbr

            p, q, cnt, _, _ = lax.fori_loop(
                0, 16, sub, (p, q, cnt, zbf, zbr), unroll=16
            )
            return p, q, cnt

        p, q, cnt = lax.fori_loop(
            jnp.int32(0), jnp.int32(n_full), block, (p0, -lam, cnt0)
        )
        if n_tail:  # masked tail: freeze p/q and stop counting past step n-1
            off = pl.multiple_of(n_full * 128, 128)
            zbf = z2f_ref[0:1, pl.ds(off, 128)]
            zbr = z2r_ref[0:1, pl.ds(off, 128)]

            def sub_tail(m8, carry2):
                p, q, cnt, zbf, zbr = carry2
                base = n_full * 128 + m8 * 8
                for m in range(8):
                    live = base + m <= n - 1
                    pn = -lam - zbf[0, m] / p
                    qn = -lam - zbr[0, m] / q
                    p = jnp.where(live, pn, p)
                    q = jnp.where(live, qn, q)
                    cnt = cnt + jnp.logical_and(pn < 0, live)
                    cnt = cnt + jnp.logical_and(qn < 0, live)
                zbf = pltpu.roll(zbf, 120, 1)
                zbr = pltpu.roll(zbr, 120, 1)
                return p, q, cnt, zbf, zbr

            p, q, cnt, _, _ = lax.fori_loop(
                jnp.int32(0), jnp.int32((n_tail + 7) // 8), sub_tail,
                (p, q, cnt, zbf, zbr),
            )
        gamma = p + q + lam  # twist pivot at m = n+1 (zero TGK diagonal)
        # p_{n+1}, q_{n+1} were counted in the loop but belong to the twist:
        cnt = cnt - (p < 0) - (q < 0) + (gamma < 0)
        # above_j: sigma_i < lam_j.  lam ascends in j, so the number of
        # probes BELOW sigma picks the surviving subinterval
        # (lam_{na-1}, lam_na] with lam_{-1}=lo, lam_k=hi.
        below = ((cnt - n) <= ksk).astype(dtype)  # (8, k*W)
        na = below[:, :W]
        for j in range(1, k):  # static W-strided segment-sum over probes
            na = na + below[:, j * W : (j + 1) * W]
        lo = lo + na * h  # na in [0, k]
        # keep the untouched endpoint EXACT: lo + (k+1)*h != hi in fp, and a
        # low hi' could push sigma outside the bracket by an ulp per sweep
        hi = jnp.where(na >= k, hi, lo + h)
        return lo, hi

    # int32 bounds: Pallas cannot lower the int64 indices x64 mode produces
    lo, hi = lax.fori_loop(jnp.int32(0), jnp.int32(iters), biter, (lo0, hi0))
    out_ref[:] = jnp.where(lane_ok, 0.5 * (lo + hi), zero)


def bisect_svdvals_pallas(d, e, iters=None, probes=1):
    # x64 mode sends the trace into an int-promotion recursion inside Mosaic
    # lowering; the kernel is 32-bit only, so trace it with x64 off.
    with jax.enable_x64(False):
        return _bisect_svdvals_pallas(d, e, iters=iters, probes=probes)


@functools.partial(jax.jit, static_argnames=("iters", "probes"))
def _bisect_svdvals_pallas(d, e, iters=None, probes=1):
    """Singular values of the bidiagonal {d, e}, descending; fp32 Pallas path.

    ``probes`` is the multisection fan-out (probes per bracket per sweep);
    ``iters`` the sweep count (default: enough for eps-plus-12-bit absolute
    resolution of the Gershgorin bound, i.e. ceil(36 / log2(probes+1)) in
    fp32).  Differential-tested against models/diagonalize.py:bisect_svdvals.
    """
    n = d.shape[0]
    dtype = d.dtype
    if n == 1:
        return jnp.abs(d)
    probes = int(probes)
    if probes < 1:
        raise ValueError(f"probes must be >= 1, got {probes}")
    if iters is None:
        bits = int(np.ceil(-np.log2(np.finfo(dtype).eps))) + 12
        iters = int(np.ceil(bits / np.log2(probes + 1)))
    n2 = 2 * n
    # TGK off-diagonals (d1, e1, d2, e2, ..., d_n), squared, tiny-guarded.
    z = jnp.zeros((n2 - 1,), dtype).at[0::2].set(d).at[1::2].set(e)
    tiny = jnp.asarray(jnp.finfo(dtype).tiny, dtype)
    z2 = jnp.maximum(z * z, tiny)
    az = jnp.abs(z)
    azp = jnp.pad(az, (1, 1))
    bound = jnp.max(azp[:-1] + azp[1:]) * (1 + 4 * jnp.finfo(dtype).eps)

    # forward stream: z2f[j] = z2_{j+1};  backward stream: leading zero then
    # z2r[j] = z2_{2n-j} (descending), so both chains read left-to-right.
    zpad = -(-n // 128) * 128
    z2f = jnp.zeros((1, zpad), dtype).at[0, :n].set(z2[:n])
    z2r = (
        jnp.zeros((1, zpad), dtype)
        .at[0, 1:n]
        .set(z2[n : n2 - 1][::-1])
    )
    W = -(-n // (8 * 128)) * 128  # lane width: (8, W) fills every sublane

    out = pl.pallas_call(
        functools.partial(_bisect_kernel, n, int(iters), probes),
        out_shape=jax.ShapeDtypeStruct((8, W), dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(z2f, z2r, jnp.reshape(bound, (1, 1)))
    return out.reshape(-1)[:n][::-1]
