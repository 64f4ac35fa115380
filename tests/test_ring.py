"""Ring all-reduce (ppermute + Pallas remote-DMA) == psum, fake 8-dev mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from tsp_gnn_tpu.parallel.mesh import make_mesh
from tsp_gnn_tpu.parallel.ring import ring_all_reduce, ring_all_reduce_pallas


@pytest.mark.parametrize("gsize,rows", [(2, 16), (4, 16), (8, 24), (4, 10)])
def test_ring_all_reduce_equals_psum(gsize, rows):
    mesh = make_mesh(8 // gsize, gsize)
    x = jax.random.normal(jax.random.PRNGKey(0), (8 * rows, 32))

    def ring_fn(x):
        return ring_all_reduce(x, "graph")

    def psum_fn(x):
        return jax.lax.psum(x, "graph")

    spec = P(("data", "graph"), None)  # split rows over all devices
    got = jax.jit(jax.shard_map(ring_fn, mesh=mesh, in_specs=spec,
                                out_specs=spec))(x)
    want = jax.jit(jax.shard_map(psum_fn, mesh=mesh, in_specs=spec,
                                 out_specs=spec))(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("dsize,gsize", [(4, 2), (2, 4), (1, 8)])
@pytest.mark.parametrize("rep", range(3))
def test_ring_all_reduce_pallas_equals_psum(dsize, gsize, rep):
    """Remote-DMA ring schedule == psum in TPU-interpret mode [VERDICT r2 #6].

    Repeated runs: the interpret-mode devices execute concurrently, so a
    missing capacity handshake manifests as a FLAKY mismatch (the original
    double-buffer race reproduced ~1-in-5 before the ready_sem fix).
    """
    mesh = make_mesh(dsize, gsize)
    rows = 2 * gsize  # per-device rows, multiple of the ring size
    x = jax.random.normal(jax.random.PRNGKey(rep), (8 * rows, 32))
    spec = P(("data", "graph"), None)

    def ring_fn(v):
        return ring_all_reduce_pallas(v, "graph", gsize, interpret=True)

    got = jax.jit(jax.shard_map(ring_fn, mesh=mesh, in_specs=spec,
                                out_specs=spec, check_vma=False))(x)
    want = jax.jit(jax.shard_map(lambda v: jax.lax.psum(v, "graph"),
                                 mesh=mesh, in_specs=spec, out_specs=spec,
                                 check_vma=False))(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
