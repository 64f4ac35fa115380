"""Ring all-reduce (ppermute schedule) == psum, on the fake 8-device mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from tsp_gnn_tpu.parallel.mesh import make_mesh
from tsp_gnn_tpu.parallel.ring import ring_all_reduce


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
