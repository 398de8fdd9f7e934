"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from svdsolver_tpu.parallel.mesh import make_mesh
from svdsolver_tpu.parallel.distributed import svdvals_batch_sharded


@pytest.fixture(scope="module")
def cpu_mesh():
    cpu = jax.devices("cpu")
    if len(cpu) < 8:
        pytest.skip("needs 8 virtual CPU devices (xla_force_host_platform)")
    return make_mesh(8, dp=2, platform="cpu")


def test_mesh_shape(cpu_mesh):
    assert dict(cpu_mesh.shape) == {"dp": 2, "tp": 4}


def test_batch_sharded_svdvals(cpu_mesh, rng):
    batch, n, band = 4, 32, 8
    As = jnp.asarray(rng.uniform(0, 5, (batch, n, n)).astype(np.float32))
    sig = np.asarray(svdvals_batch_sharded(As, cpu_mesh, band=band))
    ref = np.linalg.svd(np.asarray(As, np.float64), compute_uv=False)
    err = np.max(np.abs(sig - ref) / ref[:, :1])
    assert err < 1e-4, err


def test_shardmap_stage1_matches_single_device(rng):
    from svdsolver_tpu.parallel.distributed import dense_to_band_shardmap
    from svdsolver_tpu.models.two_stage import dense_to_band

    mesh = make_mesh(4, dp=1, platform="cpu")
    n, b = 64, 16
    A = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))
    Ab_ref = np.asarray(dense_to_band(A, band=b))
    Ab = np.asarray(dense_to_band_shardmap(A, mesh, band=b))
    np.testing.assert_allclose(Ab, Ab_ref, atol=5e-4)
    want = np.linalg.svd(np.asarray(A, np.float64), compute_uv=False)
    got = np.linalg.svd(Ab.astype(np.float64), compute_uv=False)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-5 * want[0])


def test_dryrun_entrypoint():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
