"""Pallas kernel: bidiagonal singular values by parallel bisection.

Same algorithm as models/diagonalize.py:bisect_svdvals (Sturm pivot counts
on the Golub-Kahan tridiagonal, all n values bisected simultaneously), but
with the whole bisection in one kernel so the 2n-step pivot recurrence runs
at VPU rates instead of paying XLA loop-dispatch per step.

The recurrence needs one z^2 scalar per step; dynamic scalar indexing is
not tile-aligned on TPU, so the z^2 vector is kept as a loop-carried value
and rotated one lane per step (``pltpu.roll``) — the current scalar is
always at static position [0, 0].
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _bisect_kernel(n, n2, iters, z2_ref, bound_ref, out_ref):
    dtype = out_ref.dtype
    npad = out_ref.shape[1]
    zero = jnp.zeros((), dtype)
    bound = bound_ref[0, 0]
    ks = lax.broadcasted_iota(jnp.int32, (1, npad), 1)
    lane_ok = ks < n

    lo0 = jnp.zeros((1, npad), dtype)
    hi0 = jnp.full((1, npad), bound, dtype)

    # The pivot recurrence consumes z^2[0 .. n2-2] one scalar per step.  To
    # keep every read static/aligned: 128-wide aligned blocks are sliced from
    # the ref, and within a block 8 scalars are read at static lanes [0..8)
    # between cheap (1, 128) rotates.  Steps beyond n2-2 are masked out of
    # the count (their p updates are harmless).
    n_blocks = (n2 - 1 + 127) // 128

    def biter(_, lohi):
        lo, hi = lohi
        lam = 0.5 * (lo + hi)
        p0 = -lam
        cnt0 = (p0 < 0).astype(jnp.int32)

        def block(jb, carry):
            p, cnt = carry
            zb = z2_ref[0:1, pl.ds(pl.multiple_of(jb * 128, 128), 128)]

            def sub(m8, carry2):
                p, cnt, zb = carry2
                base = jb * 128 + m8 * 8
                for m in range(8):  # static unroll: zb lane m is static
                    p = -lam - zb[0, m] / p
                    live = jnp.logical_and(p < 0, base + m <= n2 - 2)
                    cnt = cnt + live
                zb = pltpu.roll(zb, 120, 1)  # rotate left by 8 lanes
                return p, cnt, zb

            p, cnt, _ = lax.fori_loop(
                jnp.int32(0), jnp.int32(16), sub, (p, cnt, zb)
            )
            return p, cnt

        _, cnt = lax.fori_loop(
            jnp.int32(0), jnp.int32(n_blocks), block, (p0, cnt0)
        )
        above = (cnt - n) > ks
        lo = jnp.where(above, lo, lam)
        hi = jnp.where(above, lam, hi)
        return lo, hi

    # int32 bounds: Pallas cannot lower the int64 indices x64 mode produces
    lo, hi = lax.fori_loop(jnp.int32(0), jnp.int32(iters), biter, (lo0, hi0))
    out_ref[:] = jnp.where(lane_ok, 0.5 * (lo + hi), zero)


def bisect_svdvals_pallas(d, e, iters=None):
    # x64 mode sends the trace into an int-promotion recursion inside Mosaic
    # lowering; the kernel is 32-bit only, so trace it with x64 off.
    with jax.enable_x64(False):
        return _bisect_svdvals_pallas(d, e, iters=iters)


@functools.partial(jax.jit, static_argnames=("iters",))
def _bisect_svdvals_pallas(d, e, iters=None):
    """Singular values of the bidiagonal {d, e}, descending; fp32 Pallas path.

    Differential-tested against models/diagonalize.py:bisect_svdvals.
    """
    n = d.shape[0]
    dtype = d.dtype
    if n == 1:
        return jnp.abs(d)
    if iters is None:
        iters = int(np.ceil(-np.log2(np.finfo(dtype).eps))) + 12
    n2 = 2 * n
    # TGK off-diagonals (d1, e1, d2, e2, ..., d_n), squared, tiny-guarded.
    z = jnp.zeros((n2 - 1,), dtype).at[0::2].set(d).at[1::2].set(e)
    tiny = jnp.asarray(jnp.finfo(dtype).tiny, dtype)
    z2 = jnp.maximum(z * z, tiny)
    az = jnp.abs(z)
    azp = jnp.pad(az, (1, 1))
    bound = jnp.max(azp[:-1] + azp[1:]) * (1 + 4 * jnp.finfo(dtype).eps)

    zpad = -(-n2 // 128) * 128
    npad = -(-n // 128) * 128
    z2v = jnp.zeros((1, zpad), dtype).at[0, : n2 - 1].set(z2)

    out = pl.pallas_call(
        functools.partial(_bisect_kernel, n, n2, int(iters)),
        out_shape=jax.ShapeDtypeStruct((1, npad), dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(z2v, jnp.reshape(bound, (1, 1)))
    return out[0, :n][::-1]
