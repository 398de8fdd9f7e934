"""Micro-benchmark: cost atoms of the planned Pallas SBR block-sweep kernel.

Before building the full kernel (affine maps, staircase blending, activity
predicates), measure its per-tick cost structure with the real shapes and
fake offsets:

  A. batched panel-factor loop: nb sequential larfg steps on an
     (L, nb+8, 512) panel buffer (pivot extract, batched larfg, rank-1 panel
     apply, larft row, V write) — the serial chain that dominates projections.
  B. zone-GEMM block apply: (L, SLAB, 512) x (L, 512, nb) batched matmuls,
     3 zone copies, both directions.
  C. per-lane gather/scatter between a VMEM-resident packed array and the
     batched slab buffer.

Timed per configuration as one kernel of T synthetic ticks; prints us/tick
and the projected IIa cost at n=3840 (391 ticks).
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from svdsolver_tpu.utils.timing import sync

L = 11
NB = 32
SLAB = 136  # W_ + 8 = split-apply slab rows
NPAD = 4160
D = 512
TICKS = 391


def _make_v_batched(xrow, x, b, lane):
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


def _kernel(mode, A_in, out, P, PR, RA, V, T, sem):
    dtype = P.dtype
    zero = jnp.zeros((), dtype)
    lane = lax.broadcasted_iota(jnp.int32, (L, 1, D), 2)
    lane2 = lax.broadcasted_iota(jnp.int32, (1, D), 1)
    rows8 = lax.broadcasted_iota(jnp.int32, (L, 8, 1), 1)

    cp = pltpu.make_async_copy(A_in.at[pl.ds(0, NPAD), :], P.at[...], sem)
    cp.start()
    cp.wait()
    PR[...] = P[0 : NB + 8, :][None, :, :] + jnp.zeros(
        (L, NB + 8, D), dtype
    )
    RA[...] = jnp.zeros((L, SLAB, D), dtype)
    V[...] = jnp.zeros((L, NB, D), dtype)
    T[...] = jnp.zeros((L, NB, 128), dtype)

    def tick(t, carry):
        # ---- atom C: per-lane gather + scatter ---------------------------
        if mode in ("C", "ALL"):
            for l in range(L):
                r = ((t * 96 + l * 352) % (NPAD - SLAB - 8)) // 8 * 8
                RA[l, :, :] = P[pl.ds(r, SLAB), :]
            for l in range(L):
                r = ((t * 96 + l * 352) % (NPAD - SLAB - 8)) // 8 * 8
                P[pl.ds(r, SLAB), :] = RA[l, :, :]

        # ---- atom A: batched panel factor loop (NB chain steps) ----------
        if mode in ("A", "ALL"):

            def col(j, carry):
                j8 = pl.multiple_of((j // 8) * 8, 8)
                blk = PR[:, pl.ds(j8, 8), :]
                xrow = jnp.sum(
                    jnp.where(rows8 == j - j8, blk, zero), axis=1
                )  # (L, D)
                x = jnp.full((L, 1), 256, jnp.int32) + j
                v, tau = _make_v_batched(xrow, x, 129, lane2)
                u = jnp.sum(PR[...] * v[:, None, :], axis=2, keepdims=True)
                PR[...] = PR[...] - (tau[:, None, :] * u) * v[:, None, :]
                w = jnp.sum(V[...] * v[:, None, :], axis=2, keepdims=True)
                trow = -tau[:, None, :] * jnp.sum(
                    w * T[...], axis=1, keepdims=True
                )
                rowsNB = lax.broadcasted_iota(jnp.int32, (L, NB, 1), 1)
                T[...] = jnp.where(rowsNB == j, trow, T[...])
                vblk = V[:, pl.ds(j8, 8), :]
                V[:, pl.ds(j8, 8), :] = jnp.where(
                    rows8 == j - j8, v[:, None, :], vblk
                )
                return carry

            lax.fori_loop(0, NB, col, 0)

        # ---- atom B: zone-GEMM block apply (both directions, 3 zones) ----
        if mode in ("B", "ALL"):
            Vb = V[...]
            v1 = pltpu.roll(Vb, D - 128, 2)
            v2 = pltpu.roll(Vb, D - 256, 2)
            slab = RA[...]
            zone = (
                lax.broadcasted_iota(jnp.int32, (L, SLAB, 1), 1) // 128
            )

            def mm(a, b):
                return jax.lax.dot_general(
                    a,
                    b,
                    (((2,), (2,)), ((0,), (0,))),
                    precision=lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32,
                )

            zm0 = (zone == 0).astype(jnp.float32)
            zm1 = (zone == 1).astype(jnp.float32)
            zm2 = (zone == 2).astype(jnp.float32)
            # masked accumulation: never materializes 3 full-width copies
            U = mm(slab, Vb) * zm0 + mm(slab, v1) * zm1 + mm(slab, v2) * zm2
            S = jax.lax.dot_general(
                U,
                T[:, :, :NB],
                (((2,), (1,)), ((0,), (0,))),
                precision=lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )  # (L, SLAB, NB)

            def mm2(s, b):
                return jax.lax.dot_general(
                    s,
                    b,
                    (((2,), (1,)), ((0,), (0,))),
                    precision=lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32,
                )

            RA[...] = (
                slab
                - mm2(S * zm0, Vb)
                - mm2(S * zm1, v1)
                - mm2(S * zm2, v2)
            )
        return carry

    lax.fori_loop(jnp.int32(0), jnp.int32(TICKS), tick, 0)
    out[0:1, :] = (
        P[0:1, :D]
        + PR[:, 0, :].sum(axis=0, keepdims=True)
        + RA[:, 0, :].sum(axis=0, keepdims=True)
        + V[:, 0, :].sum(axis=0, keepdims=True)
    )


@functools.partial(jax.jit, static_argnames=("mode",))
def run(A, mode):
    return pl.pallas_call(
        functools.partial(_kernel, mode),
        out_shape=jax.ShapeDtypeStruct((1, D), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((NPAD, D), jnp.float32),
            pltpu.VMEM((L, NB + 8, D), jnp.float32),
            pltpu.VMEM((L, SLAB, D), jnp.float32),
            pltpu.VMEM((L, NB, D), jnp.float32),
            pltpu.VMEM((L, NB, 128), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(A)


def main():
    print("devices:", jax.devices(), flush=True)
    A = jnp.asarray(
        np.random.default_rng(0).normal(size=(NPAD, D)).astype(np.float32)
    ) * 1e-3
    import sys
    modes = sys.argv[1:] or ["C", "A", "B"]
    for mode in modes:
        sync(run(A, mode))
        t0 = time.perf_counter()
        out = None
        for _ in range(5):
            out = run(A, mode)
        sync(out)
        dt = (time.perf_counter() - t0) / 5
        print(
            f"mode={mode:3s}: {dt*1e3:7.2f} ms total, "
            f"{dt/TICKS*1e6:7.2f} us/tick "
            f"(x2 panels/applies per real tick where applicable)",
            flush=True,
        )


if __name__ == "__main__":
    main()
