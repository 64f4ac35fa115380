"""Multi-device tests on the 8-device fake CPU mesh (SURVEY §4.3):
edge-partitioned (halo) forward/grads allclose vs the unpartitioned path."""
import dataclasses

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from tsp_gnn_tpu.config import ModelConfig
from tsp_gnn_tpu.data import generator
from tsp_gnn_tpu.models import tsp, tsp_sparse
from tsp_gnn_tpu.ops import layout
from tsp_gnn_tpu.parallel import halo
from tsp_gnn_tpu.parallel.mesh import make_mesh


def _setup(n_inst=4, n=17, pad_n=17, tmax=6, d=16):
    cfg = ModelConfig(d=d, tmax=tmax, remat=False)
    params = tsp.tsp_init(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(7)
    insts = [generator.generate_instance(rng, n) for _ in range(n_inst)]
    g = layout.build_uniform_block_graph(insts, 0.02, pad_n)
    return cfg, params, insts, g


@pytest.mark.parametrize("mesh_shape", [(4, 2), (2, 4), (8, 1), (1, 8)])
def test_sharded_loss_matches_unsharded(mesh_shape):
    dp, gp = mesh_shape
    # m_pad for n=17 is 136 -> padded to 256 so graph-partition tiles divide
    cfg, params, insts, g = _setup()
    m_new = ((g.m_pad + gp * 128 - 1) // (gp * 128)) * gp * 128
    gpad = layout.pad_uniform_edges(g, m_new)
    batch = halo.shard_batch_arrays(gpad)

    mesh = make_mesh(dp, gp)
    loss_fn = halo.make_sharded_loss(cfg, mesh, v_pad=g.v_pad,
                                     m_pad=gpad.m_pad)
    specs = halo.batch_specs()
    jb = {k: jax.device_put(jnp.asarray(v), NamedSharding(mesh, specs[k]))
          for k, v in batch.items()}
    rparams = jax.device_put(params, NamedSharding(mesh, P()))
    loss_sharded, aux = jax.jit(loss_fn)(rparams, jb)

    # unsharded reference on the plain sparse path
    flat = {k: jnp.asarray(v) for k, v in
            tsp_sparse.block_batch_arrays(g).items()}
    loss_ref, aux_ref = tsp_sparse.loss_fn_sparse(
        params, flat, cfg, v_pad=g.v_pad, m_pad=g.m_pad, use_pallas=False)
    np.testing.assert_allclose(float(loss_sharded), float(loss_ref),
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(float(aux["accuracy"]),
                               float(aux_ref["accuracy"]))

    # gradients agree too (halo exchange transposes correctly)
    gs = jax.jit(jax.grad(lambda p, b: loss_fn(p, b)[0]))(rparams, jb)
    gr = jax.grad(lambda p: tsp_sparse.loss_fn_sparse(
        p, flat, cfg, v_pad=g.v_pad, m_pad=g.m_pad, use_pallas=False)[0])(params)
    fs, _ = jax.flatten_util.ravel_pytree(gs)
    fr, _ = jax.flatten_util.ravel_pytree(gr)
    np.testing.assert_allclose(np.asarray(fs), np.asarray(fr),
                               rtol=5e-3, atol=1e-6)


def test_dryrun_multichip_entry():
    """The driver's dryrun path executes on the fake mesh."""
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


def test_sharded_loss_with_pallas_kernels_interpret():
    """Pallas SpMM kernels inside shard_map (interpret mode, 2x2 mesh)."""
    cfg, params, insts, g = _setup(n_inst=2, tmax=3, d=16)
    gp = 2
    m_new = ((g.m_pad + gp * 128 - 1) // (gp * 128)) * gp * 128
    gpad = layout.pad_uniform_edges(g, m_new)
    batch = halo.shard_batch_arrays(gpad)
    mesh = make_mesh(2, gp)
    loss_fn = halo.make_sharded_loss(cfg, mesh, v_pad=g.v_pad,
                                     m_pad=gpad.m_pad, use_pallas=True,
                                     interpret=True, tile_e=128)
    specs = halo.batch_specs()
    jb = {k: jax.device_put(jnp.asarray(v), NamedSharding(mesh, specs[k]))
          for k, v in batch.items()}
    rparams = jax.device_put(params, NamedSharding(mesh, P()))
    loss_pallas, _ = jax.jit(loss_fn)(rparams, jb)

    ref_fn = halo.make_sharded_loss(cfg, mesh, v_pad=g.v_pad,
                                    m_pad=gpad.m_pad, use_pallas=False)
    loss_ref, _ = jax.jit(ref_fn)(rparams, jb)
    np.testing.assert_allclose(float(loss_pallas), float(loss_ref),
                               rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("ring", ["ppermute", "overlap"])
def test_sharded_loss_ring_matches_psum(ring):
    """The explicit ring halo exchange (halo ring= flag, VERDICT r1 #9)
    matches the default psum path — loss AND gradients — on the fake mesh."""
    dp, gp = 2, 4
    cfg, params, insts, g = _setup()
    m_new = ((g.m_pad + gp * 128 - 1) // (gp * 128)) * gp * 128
    gpad = layout.pad_uniform_edges(g, m_new)
    batch = halo.shard_batch_arrays(gpad)
    mesh = make_mesh(dp, gp)
    specs = halo.batch_specs()
    jb = {k: jax.device_put(jnp.asarray(v), NamedSharding(mesh, specs[k]))
          for k, v in batch.items()}
    rparams = jax.device_put(params, NamedSharding(mesh, P()))

    loss_psum = halo.make_sharded_loss(cfg, mesh, v_pad=g.v_pad,
                                       m_pad=gpad.m_pad)
    loss_ring = halo.make_sharded_loss(cfg, mesh, v_pad=g.v_pad,
                                       m_pad=gpad.m_pad, ring=ring)
    lp, _ = jax.jit(loss_psum)(rparams, jb)
    lr, _ = jax.jit(loss_ring)(rparams, jb)
    np.testing.assert_allclose(float(lr), float(lp), rtol=1e-5, atol=1e-6)

    gp_ = jax.jit(jax.grad(lambda p, b: loss_psum(p, b)[0]))(rparams, jb)
    gr_ = jax.jit(jax.grad(lambda p, b: loss_ring(p, b)[0]))(rparams, jb)
    fp, _ = jax.flatten_util.ravel_pytree(gp_)
    fr, _ = jax.flatten_util.ravel_pytree(gr_)
    np.testing.assert_allclose(np.asarray(fr), np.asarray(fp),
                               rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("mesh_shape", [(4, 2), (2, 4)])
def test_sharded_loss_ring_pallas_matches_psum(mesh_shape):
    """The remote-DMA Pallas ring as the halo exchange of the FULL sharded
    forward == psum (TPU-interpret mode on the fake mesh) [VERDICT r2 #6].
    Forward-only: pallas_call has no VJP; training keeps psum/ppermute."""
    dp, gp = mesh_shape
    # v_pad=16 so the per-device vertex rows divide the ring size
    cfg, params, insts, g = _setup(n_inst=4, n=16, pad_n=16, tmax=3)
    m_new = ((g.m_pad + gp * 128 - 1) // (gp * 128)) * gp * 128
    gpad = layout.pad_uniform_edges(g, m_new)
    batch = halo.shard_batch_arrays(gpad)
    mesh = make_mesh(dp, gp)
    specs = halo.batch_specs()
    jb = {k: jax.device_put(jnp.asarray(v), NamedSharding(mesh, specs[k]))
          for k, v in batch.items()}
    rparams = jax.device_put(params, NamedSharding(mesh, P()))

    loss_psum = halo.make_sharded_loss(cfg, mesh, v_pad=g.v_pad,
                                       m_pad=gpad.m_pad, interpret=True)
    loss_ring = halo.make_sharded_loss(cfg, mesh, v_pad=g.v_pad,
                                       m_pad=gpad.m_pad, interpret=True,
                                       ring="pallas")
    lp, _ = jax.jit(loss_psum)(rparams, jb)
    lr, _ = jax.jit(loss_ring)(rparams, jb)
    np.testing.assert_allclose(float(lr), float(lp), rtol=1e-5, atol=1e-6)


def test_sharded_loss_edge_gating_matches_unsharded():
    """edge_gating through the halo path: every shard gates its local edges
    from the replicated vertex states [VERDICT r2 #10]."""
    dp, gp = 2, 2
    cfg, params, insts, g = _setup(n_inst=2, tmax=4, d=16)
    cfg = dataclasses.replace(cfg, edge_gating=True)
    params = tsp.tsp_init(jax.random.PRNGKey(2), cfg)
    m_new = ((g.m_pad + gp * 128 - 1) // (gp * 128)) * gp * 128
    gpad = layout.pad_uniform_edges(g, m_new)
    batch = halo.shard_batch_arrays(gpad)
    mesh = make_mesh(dp, gp)
    loss_fn = halo.make_sharded_loss(cfg, mesh, v_pad=g.v_pad,
                                     m_pad=gpad.m_pad)
    specs = halo.batch_specs()
    jb = {k: jax.device_put(jnp.asarray(v), NamedSharding(mesh, specs[k]))
          for k, v in batch.items()}
    rparams = jax.device_put(params, NamedSharding(mesh, P()))
    loss_sharded, _ = jax.jit(loss_fn)(rparams, jb)

    flat = {k: jnp.asarray(v) for k, v in
            tsp_sparse.block_batch_arrays(g).items()}
    loss_ref, _ = tsp_sparse.loss_fn_sparse(
        params, flat, cfg, v_pad=g.v_pad, m_pad=g.m_pad, use_pallas=False)
    np.testing.assert_allclose(float(loss_sharded), float(loss_ref),
                               rtol=2e-4, atol=1e-5)

    gs = jax.jit(jax.grad(lambda p, b: loss_fn(p, b)[0]))(rparams, jb)
    gr = jax.grad(lambda p: tsp_sparse.loss_fn_sparse(
        p, flat, cfg, v_pad=g.v_pad, m_pad=g.m_pad,
        use_pallas=False)[0])(params)
    fs, _ = jax.flatten_util.ravel_pytree(gs)
    fr, _ = jax.flatten_util.ravel_pytree(gr)
    np.testing.assert_allclose(np.asarray(fs), np.asarray(fr),
                               rtol=5e-3, atol=1e-6)


@pytest.mark.parametrize("ring", ["psum", "overlap"])
def test_sharded_loss_grouped_kernels(ring):
    """Grouped-problem SpMM kernels (agg_group=2) inside shard_map match
    the jnp-reference sharded loss on the fake mesh, for both the blocking
    psum halo and the overlap ring."""
    cfg, params, insts, g = _setup(n_inst=2, tmax=3, d=16)
    gp = 2
    m_new = ((g.m_pad + gp * 128 - 1) // (gp * 128)) * gp * 128
    gpad = layout.pad_uniform_edges(g, m_new)
    batch = halo.shard_batch_arrays(gpad)
    mesh = make_mesh(2, gp)
    loss_fn = halo.make_sharded_loss(cfg, mesh, v_pad=g.v_pad,
                                     m_pad=gpad.m_pad, use_pallas=True,
                                     interpret=True, tile_e=128,
                                     ring=ring, agg_group=2)
    specs = halo.batch_specs()
    jb = {k: jax.device_put(jnp.asarray(v), NamedSharding(mesh, specs[k]))
          for k, v in batch.items()}
    rparams = jax.device_put(params, NamedSharding(mesh, P()))
    loss_grouped, _ = jax.jit(loss_fn)(rparams, jb)

    ref_fn = halo.make_sharded_loss(cfg, mesh, v_pad=g.v_pad,
                                    m_pad=gpad.m_pad, use_pallas=False)
    loss_ref, _ = jax.jit(ref_fn)(rparams, jb)
    np.testing.assert_allclose(float(loss_grouped), float(loss_ref),
                               rtol=1e-4, atol=1e-6)
