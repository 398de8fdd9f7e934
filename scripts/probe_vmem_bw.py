"""VMEM bandwidth probe: what does a wave-chase-shaped slab access pattern
cost in pure traffic?

Three kernels, each timed over the real tick count of an n=3840 / b=128
chase (11518 ticks):

* ``stream``: one 272-row x 512-lane slab load+fma+store per tick — the
  single-lane traffic floor.
* ``tick11``: 11 disjoint 272-row slabs (3b-1 = 383-row spacing, the wave
  lane layout) load+fma+store per tick — the current tick's RIGHT-phase
  traffic floor (no masks, no rolls, no larfg).
* ``tick11lr``: tick11 plus the 144-row left-region load+fma+store per
  lane — the full current-tick traffic floor (right + left phases).

Decision rule (PERF_NOTES round-4): if tick11lr's floor is close to the
measured 55 ms wave-chase wall, the tick is bandwidth-bound and the
restacking sketch (op-count cut) cannot reach 35-40 ms — the byte-cutting
deferred-left fusion is the design that can.
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

N, B = 3840, 128
NPAD = -(-(N + 3 * B + 8) // 128) * 128
TICKS = 3 * (N - 2) + 2
L = 11
SPACING = 3 * B - 1


def _kern(mode, ticks, out, P):
    ri = lax.broadcasted_iota(jnp.int32, P.shape, 0)
    ci = lax.broadcasted_iota(jnp.int32, P.shape, 1)
    P[...] = ri.astype(jnp.float32) * 0.001 + ci.astype(jnp.float32) * 0.01

    def tick(T, carry):
        base = lax.rem(T * 7, jnp.int32(40)) * 8  # wandering 8-aligned rows
        for l in range(L):
            r8 = base + l * (SPACING - SPACING % 8)

            rows = P[pl.ds(r8, 272), :]
            P[pl.ds(r8, 272), :] = rows * 1.000001 + 0.0000001
            if mode == "lr":
                rowsl = P[pl.ds(r8 + 128, 144), :]
                P[pl.ds(r8 + 128, 144), :] = rowsl * 1.000001
        return carry

    lax.fori_loop(jnp.int32(0), ticks, tick, 0)
    out[...] = P[pl.ds(0, 8), :]


def build(mode, ticks):
    return pl.pallas_call(
        functools.partial(_kern, mode, ticks),
        out_shape=jax.ShapeDtypeStruct((8, 512), jnp.float32),
        in_specs=[],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((NPAD, 512), jnp.float32)],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )


def main():
    for mode, label, bytes_per_tick in (
        ("r", "tick11-right-only", L * 272 * 512 * 4 * 2),
        ("lr", "tick11-right+left", L * (272 + 144) * 512 * 4 * 2),
    ):
        fn = jax.jit(build(mode, TICKS))
        out = fn()
        sync(out)
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        sync(out)
        dt = (time.perf_counter() - t0) / reps
        gb = bytes_per_tick * TICKS / 1e9
        print(
            f"{label:22s} {dt * 1e3:7.2f} ms  {gb:6.1f} GB  "
            f"{gb / dt / 1000:5.2f} TB/s  {dt / TICKS * 1e6:5.2f} us/tick"
        )


if __name__ == "__main__":
    main()
