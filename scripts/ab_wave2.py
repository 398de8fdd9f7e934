"""Same-session A/B: wave vs vmem vs stream vs HBM-window chase kernels."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from svdsolver_tpu.models.two_stage import dense_to_band
from svdsolver_tpu.ops.pallas.band_chase import band_to_bidiagonal_pallas
from svdsolver_tpu.ops.pallas.band_chase_stream import (
    band_to_bidiagonal_pallas_stream,
    stream_chase_supported,
)
from svdsolver_tpu.ops.pallas.band_chase_vmem import (
    band_to_bidiagonal_pallas_vmem,
    vmem_chase_supported,
)
from svdsolver_tpu.ops.pallas.band_chase_wave import (
    band_to_bidiagonal_pallas_wave,
    wave_chase_supported,
    _n_lanes,
)


def loop_time(fn, x, reps=5):
    out = fn(x)
    float(np.asarray(out[0][0]))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(x)
    float(np.asarray(out[0][0]))
    return (time.perf_counter() - t0) / reps


def main():
    sizes = [int(s) for s in sys.argv[1:]] or [2048, 3200, 3840, 4992]
    b = 128
    rng = np.random.default_rng(0)
    for n in sizes:
        A = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))
        B = jax.block_until_ready(dense_to_band(A, band=b))
        row = [f"n={n} lanes={_n_lanes(n, b)}"]
        if wave_chase_supported(n, b):
            t0 = time.perf_counter()
            tw = loop_time(
                lambda x: band_to_bidiagonal_pallas_wave(x, band=b), B
            )
            row.append(
                f"wave={tw*1e3:.1f}ms(c{time.perf_counter()-t0-5*tw:.0f}s)"
            )
        if vmem_chase_supported(n, b):
            tv = loop_time(
                lambda x: band_to_bidiagonal_pallas_vmem(x, band=b), B
            )
            row.append(f"vmem={tv*1e3:.1f}ms")
        if stream_chase_supported(n, b):
            ts = loop_time(
                lambda x: band_to_bidiagonal_pallas_stream(x, band=b), B
            )
            row.append(f"stream={ts*1e3:.1f}ms")
        th = loop_time(lambda x: band_to_bidiagonal_pallas(x, band=b), B)
        row.append(f"hbmwin={th*1e3:.1f}ms")
        print("  ".join(row), flush=True)


if __name__ == "__main__":
    main()
