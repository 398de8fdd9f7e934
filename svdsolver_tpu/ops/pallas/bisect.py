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

    def biter(_, lohi):
        lo, hi = lohi
        lam = 0.5 * (lo + hi)
        p = -lam
        cnt = (p < 0).astype(jnp.int32)
        z = z2_ref[:]

        def step(i, carry):
            p, cnt, z = carry
            p = -lam - z[0, 0] / p
            cnt = cnt + (p < 0)
            # rotate left by one lane (shift must be non-negative)
            z = pltpu.roll(z, z.shape[1] - 1, 1)
            return p, cnt, z

        _, cnt, _ = lax.fori_loop(jnp.int32(1), jnp.int32(n2), step, (p, cnt, z))
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
