import time
import numpy as np, jax, jax.numpy as jnp
from svdsolver_tpu.models.vectors import svd
from svdsolver_tpu.utils.timing import sync

print(jax.devices())
rng = np.random.default_rng(0)

for n in (2048, 3840):
    A = jnp.asarray(rng.uniform(0, 5, size=(n, n)).astype(np.float32))
    f = jax.jit(lambda A: svd(A))
    t0 = time.perf_counter()
    out = f(A)
    sync(out)
    print(f"n={n} compile+first: {time.perf_counter()-t0:.2f}s")
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(A)
    sync(out)
    t = (time.perf_counter() - t0) / reps
    U, s, Vh = out
    recon = jnp.max(jnp.abs(U @ (s[:, None] * Vh) - A)) / jnp.max(jnp.abs(A))
    orth = jnp.max(jnp.abs(U.T @ U - jnp.eye(n, dtype=jnp.float32)))
    print(f"n={n} svd loop-timed: {t:.4f}s recon {float(recon):.2e} orth {float(orth):.2e}")
