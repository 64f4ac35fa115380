"""Full sharded train step == unsharded sparse train step on the fake mesh."""
import dataclasses

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from tsp_gnn_tpu.config import ModelConfig
from tsp_gnn_tpu.data import generator
from tsp_gnn_tpu.models import tsp, tsp_sparse
from tsp_gnn_tpu.ops import layout
from tsp_gnn_tpu.parallel import halo
from tsp_gnn_tpu.parallel.mesh import make_mesh


@pytest.mark.parametrize("mesh_shape", [(2, 4), (4, 2)])
def test_sharded_train_step_matches_unsharded(mesh_shape):
    dp, gp = mesh_shape
    cfg = ModelConfig(d=16, tmax=4, remat=False)
    params = tsp.tsp_init(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(5)
    insts = [generator.generate_instance(rng, 13) for _ in range(4)]
    g = layout.build_uniform_block_graph(insts, 0.02, 13)
    g = layout.pad_uniform_edges(
        g, ((g.m_pad + gp * 128 - 1) // (gp * 128)) * gp * 128)

    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    mesh = make_mesh(dp, gp)
    step = halo.make_sharded_train_step(cfg, mesh, opt, v_pad=g.v_pad,
                                        m_pad=g.m_pad)
    specs = halo.batch_specs()
    batch = halo.shard_batch_arrays(g)
    jb = {k: jax.device_put(jnp.asarray(v), NamedSharding(mesh, specs[k]))
          for k, v in batch.items()}
    repl = NamedSharding(mesh, P())
    p_sharded = jax.device_put(params, repl)
    o_sharded = jax.device_put(opt_state, repl)
    p1, o1, aux1 = step(p_sharded, o_sharded, jb)

    # unsharded reference step on the flat sparse path
    flat = {k: jnp.asarray(v)
            for k, v in tsp_sparse.block_batch_arrays(g).items()}

    def loss(p):
        return tsp_sparse.loss_fn_sparse(p, flat, cfg, v_pad=g.v_pad,
                                         m_pad=g.m_pad, use_pallas=False)[0]

    grads = jax.grad(loss)(params)
    updates, o2 = opt.update(grads, opt_state, params)
    p2 = optax.apply_updates(params, updates)

    f1, _ = jax.flatten_util.ravel_pytree(p1)
    f2, _ = jax.flatten_util.ravel_pytree(p2)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2),
                               rtol=2e-4, atol=2e-6)
    assert np.isfinite(float(aux1["loss"]))
