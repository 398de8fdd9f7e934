"""Loop-averaged per-stage breakdown of svd() at N=2048 fp32."""
import time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp

from svdsolver_tpu.models.svd import _auto_block
from svdsolver_tpu.models.vectors import (
    tgk_vectors,
    _apply_chase_reflectors_wy,
    svd as svd_api,
)
from svdsolver_tpu.ops.pallas.panel_qr import dense_to_band_uv_pallas
from svdsolver_tpu.ops.pallas.band_chase import band_to_bidiagonal_pallas_accum
from svdsolver_tpu.ops.pallas.bisect import bisect_svdvals_pallas
from svdsolver_tpu.ops.precision import pdot
from svdsolver_tpu.utils.timing import sync

N = 2048
B = _auto_block(N)
rng = np.random.default_rng(0)
A = jnp.asarray(rng.normal(size=(N, N)).astype(np.float32))
leaf0 = lambda o: jax.tree_util.tree_leaves(o)[0]


def tavg(name, f, *args, reps=10):
    out = f(*args)
    sync(leaf0(out))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    sync(leaf0(out))
    print(f"{name}: {(time.perf_counter()-t0)/reps*1e3:.2f} ms")
    return out


out = tavg("svd() total", lambda x: svd_api(x), A, reps=10)
Ab, U1, V1 = tavg("stage1 UV accum", lambda x: dense_to_band_uv_pallas(x, band=B), A)
rec = tavg("chase recording", lambda x: band_to_bidiagonal_pallas_accum(x, band=B), Ab)
d, e, VL, TL, VR, TR = rec
s_used = max(0, -(-(N - (2 * (B + 1) - 1)) // B)) + 2
if s_used < VL.shape[1]:
    VL, TL = VL[:, :s_used], TL[:, :s_used]
    VR, TR = VR[:, :s_used], TR[:, :s_used]
sig = tavg("bisect", bisect_svdvals_pallas, d, e)
Ub, Vb = tavg("tgk_vectors", lambda *a: tgk_vectors(*a), d, e, sig)
LU = tavg("backtransform L (WY)", lambda: _apply_chase_reflectors_wy(VL, TL, Ub, B))
RV = tavg("backtransform R (WY)", lambda: _apply_chase_reflectors_wy(VR, TR, Vb, B))
tavg("final GEMMs", lambda: (pdot(U1, LU), pdot(V1, RV)))
