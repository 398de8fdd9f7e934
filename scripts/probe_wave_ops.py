"""Wave-tick op-cost breakdown: time the REAL apply primitives (from
band_chase_wave) with synthetic geometry, one stage added at a time, over
the true tick count of an n=3840 / b=128 chase.

Stages (cumulative):
  traffic   load+fma+store only (the probe_vmem_bw floor)
  rapply    + real _right_apply (Vm zone construction + lane reduce + fma)
  rxcol     _right_apply_xcol instead (adds the fused pivot-column extract)
  +gather   + the 8-row pivot-row gathers into PR
  +larfg    + the two batched larfgs (right rows + left columns)
  +lapply   + real _left_apply per lane  == the full tick's op content

The difference between consecutive rows prices each stage; the last row
should land near the measured 55 ms wave-chase wall (minus head/ramp
effects).  Decides where a Stage-II redesign should spend: bytes (loads/
stores), vector-op work (masks/rolls/reduces), or serial larfg chains.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from svdsolver_tpu.ops.pallas.band_chase_vmem import WR, _make_v
from svdsolver_tpu.ops.pallas.band_chase_wave import (
    LANE_PAD,
    _left_apply,
    _left_make_v_batched,
    _right_apply,
    _right_apply_xcol,
)
from svdsolver_tpu.utils.timing import sync

N, B = 3840, 128
NPAD = -(-(N + 3 * B + 8) // 128) * 128
TICKS = 3 * (N - 2) + 2
L = 11
SP8 = (3 * B - 1) // 8 * 8  # 8-aligned lane spacing (geometry approximation)


def _kern(mode, ticks, out, P, PR, XC):
    ri = lax.broadcasted_iota(jnp.int32, P.shape, 0)
    ci = lax.broadcasted_iota(jnp.int32, P.shape, 1)
    P[...] = (
        ri.astype(jnp.float32) * 1e-6 + ci.astype(jnp.float32) * 1e-5 + 1.0
    )
    lane_r = lax.broadcasted_iota(jnp.int32, (1, WR), 1)
    qi8 = lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    li = lax.broadcasted_iota(jnp.int32, (PR.shape[0], 1), 0)
    zero = jnp.zeros((), jnp.float32)

    def tick(T, carry):
        base = lax.rem(T * 7, jnp.int32(40)) * 8
        rv = base + li * SP8  # per-lane pivot rows (8-aligned geometry)
        if mode in ("gather", "larfg", "lapply"):
            for l in range(L):
                r8 = base + l * SP8
                rows8 = P[pl.ds(r8, 8), :WR]
                PR[l : l + 1, :] = jnp.sum(
                    jnp.where(qi8 == 0, rows8, zero), axis=0, keepdims=True
                )
        if mode in ("larfg", "lapply"):
            xv = B + lax.rem(rv, jnp.int32(128)) + 128
            Vr, taur = _make_v(PR[...], xv, B, lane_r)
        else:
            Vr = jnp.where(
                jnp.logical_and(lane_r >= 256, lane_r < 256 + B + 1),
                jnp.full((PR.shape[0], WR), 0.001, jnp.float32),
                zero,
            )
            taur = jnp.full((PR.shape[0], 1), 0.0001, jnp.float32)

        for l in range(L):
            r8 = base + l * SP8
            if mode == "traffic":
                rows = P[pl.ds(r8, 272), :]
                P[pl.ds(r8, 272), :] = rows * 1.000001
            elif mode == "rapply":
                _right_apply(
                    P, B, r8, Vr[l : l + 1, :], taur[l : l + 1, :],
                    2 * B + 8, 2 * B,
                )
            else:
                XC[:, l : l + 1] = _right_apply_xcol(
                    P, B, r8, Vr[l : l + 1, :], taur[l : l + 1, :]
                )

        if mode in ("larfg", "lapply"):
            lc = lax.broadcasted_iota(jnp.int32, (1, 128), 1)
            r1c = base + lc * SP8 + B
            ro1c = r1c - (r1c // 8) * 8
            Vl, taul = _left_make_v_batched(XC[...], ro1c, B)
        else:
            Vl = jnp.full((B + 8, 128), 0.001, jnp.float32)
            taul = jnp.full((1, 128), 0.0001, jnp.float32)

        if mode == "lapply":
            for l in range(L):
                r8 = base + l * SP8
                _left_apply(
                    P, B, r8 + B, Vl[:, l : l + 1], taul[:, l : l + 1]
                )
        return carry

    lax.fori_loop(jnp.int32(0), ticks, tick, 0)
    out[...] = P[pl.ds(0, 8), :]


def build(mode, ticks):
    Lp = -(-(L + 1) // LANE_PAD) * LANE_PAD
    return pl.pallas_call(
        functools.partial(_kern, mode, ticks),
        out_shape=jax.ShapeDtypeStruct((8, 512), jnp.float32),
        in_specs=[],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((NPAD, 512), jnp.float32),
            pltpu.VMEM((Lp, WR), jnp.float32),
            pltpu.VMEM((B + 8, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )


def main():
    prev = 0.0
    for mode in ("traffic", "rapply", "rxcol", "gather", "larfg", "lapply"):
        fn = jax.jit(build(mode, TICKS))
        out = fn()
        sync(out)
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        sync(out)
        dt = (time.perf_counter() - t0) / reps
        print(
            f"{mode:8s} {dt * 1e3:7.2f} ms  {dt / TICKS * 1e6:5.2f} us/tick"
            f"  (+{(dt - prev) / TICKS * 1e6:5.2f})"
        )
        prev = dt


if __name__ == "__main__":
    main()
