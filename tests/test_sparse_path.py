"""Sparse (Pallas-layout) path vs dense path: logits and gradients must agree
— the two are the same model on different layouts (SURVEY §7 hard-part #2)."""
import dataclasses

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

from tsp_gnn_tpu.config import ModelConfig
from tsp_gnn_tpu.data import generator
from tsp_gnn_tpu.data.loader import make_dense_batch
from tsp_gnn_tpu.models import tsp, tsp_sparse
from tsp_gnn_tpu.ops import layout


def _setup(ns=(12, 20, 17), pad_n=20, tmax=9, d=32, feed_wc=False):
    cfg = ModelConfig(d=d, tmax=tmax, remat=False, feed_wc_each_step=feed_wc)
    params = tsp.tsp_init(jax.random.PRNGKey(5), cfg)
    rng = np.random.default_rng(3)
    insts = [generator.generate_instance(rng, n) for n in ns]
    dense = {k: jnp.asarray(v)
             for k, v in make_dense_batch(insts, 0.02, pad_n).items()}
    g = layout.build_uniform_block_graph(insts, 0.02, pad_n)
    sparse = {k: jnp.asarray(v)
              for k, v in tsp_sparse.block_batch_arrays(g).items()}
    return cfg, params, dense, sparse, g


@pytest.mark.parametrize("use_pallas", [False, True])
@pytest.mark.parametrize("feed_wc", [False, True])
def test_sparse_matches_dense_logits(use_pallas, feed_wc):
    cfg, params, dense, sparse, g = _setup(feed_wc=feed_wc)
    l_dense = tsp.forward(params, dense, cfg)
    l_sparse = tsp_sparse.forward_sparse(
        params, sparse, cfg, v_pad=g.v_pad, m_pad=g.m_pad,
        use_pallas=use_pallas, interpret=use_pallas)
    np.testing.assert_allclose(np.asarray(l_dense), np.asarray(l_sparse),
                               rtol=5e-4, atol=5e-5)


@pytest.mark.parametrize("use_pallas", [False, True])
def test_sparse_grads_match_dense(use_pallas):
    """Gradients through the custom-VJP kernel pair match the dense path."""
    cfg, params, dense, sparse, g = _setup(tmax=5)

    def dense_loss(p):
        return tsp.loss_fn(p, dense, cfg)[0]

    def sparse_loss(p):
        return tsp_sparse.loss_fn_sparse(
            p, sparse, cfg, v_pad=g.v_pad, m_pad=g.m_pad,
            use_pallas=use_pallas, interpret=use_pallas)[0]

    gd = jax.grad(dense_loss)(params)
    gs = jax.grad(sparse_loss)(params)
    flat_d, _ = jax.flatten_util.ravel_pytree(gd)
    flat_s, _ = jax.flatten_util.ravel_pytree(gs)
    np.testing.assert_allclose(np.asarray(flat_s), np.asarray(flat_d),
                               rtol=2e-3, atol=1e-5)


def test_sparse_trajectory_matches_dense():
    """Per-iteration embeddings agree between layouts on real lanes."""
    cfg, params, dense, sparse, g = _setup(tmax=6)
    _, traj_d = tsp.forward(params, dense, cfg, return_trajectory=True)
    _, traj_s = tsp_sparse.forward_sparse(
        params, sparse, cfg, v_pad=g.v_pad, m_pad=g.m_pad,
        use_pallas=False, return_trajectory=True)
    B = int(dense["labels"].shape[0])
    pad_n = int(dense["vertex_mask"].shape[1])
    e = tsp.edge_list(pad_n)
    for t in range(cfg.tmax):
        for p in range(B):
            n = int(dense["n_vertices"][p])
            hv_d = np.asarray(traj_d["V"][t, p, :n])
            hv_s = np.asarray(traj_s["V"][t][p * g.v_pad: p * g.v_pad + n])
            np.testing.assert_allclose(hv_s, hv_d, rtol=5e-4, atol=1e-5)
            sel = (e[:, 0] < n) & (e[:, 1] < n)
            m = int(sel.sum())
            he_d = np.asarray(traj_d["E"][t, p][sel])
            he_s = np.asarray(traj_s["E"][t][p * g.m_pad: p * g.m_pad + m])
            np.testing.assert_allclose(he_s, he_d, rtol=5e-4, atol=1e-5)


@pytest.mark.parametrize("use_pallas", [False, True])
def test_edge_gating_sparse_matches_dense(use_pallas):
    """The SDDMM edge-gating variant [VERDICT r2 #10]: dense gather gate ==
    sparse sddmm-kernel gate, logits AND gradients (the custom VJP is built
    from the incidence kernels)."""
    cfg, params, dense, sparse, g = _setup(tmax=5)
    cfg = dataclasses.replace(cfg, edge_gating=True)
    params = tsp.tsp_init(jax.random.PRNGKey(5), cfg)  # E cell in_dim +1

    l_dense = tsp.forward(params, dense, cfg)
    l_sparse = tsp_sparse.forward_sparse(
        params, sparse, cfg, v_pad=g.v_pad, m_pad=g.m_pad,
        use_pallas=use_pallas, interpret=use_pallas)
    np.testing.assert_allclose(np.asarray(l_dense), np.asarray(l_sparse),
                               rtol=5e-4, atol=5e-5)

    gd = jax.grad(lambda p: tsp.loss_fn(p, dense, cfg)[0])(params)
    gs = jax.grad(lambda p: tsp_sparse.loss_fn_sparse(
        p, sparse, cfg, v_pad=g.v_pad, m_pad=g.m_pad,
        use_pallas=use_pallas, interpret=use_pallas)[0])(params)
    fd, _ = jax.flatten_util.ravel_pytree(gd)
    fs, _ = jax.flatten_util.ravel_pytree(gs)
    np.testing.assert_allclose(np.asarray(fs), np.asarray(fd),
                               rtol=5e-3, atol=1e-5)


def test_edge_gating_changes_output():
    """The gate actually feeds the E cell (different function from the
    ungated model)."""
    cfg, params, dense, _, _ = _setup(tmax=5)
    gcfg = dataclasses.replace(cfg, edge_gating=True)
    gparams = tsp.tsp_init(jax.random.PRNGKey(5), gcfg)
    base = tsp.forward(params, dense, cfg)
    gated = tsp.forward(gparams, dense, gcfg)
    assert not np.allclose(np.asarray(base), np.asarray(gated))


@pytest.mark.parametrize("agg_group", [2, 3])
def test_grouped_agg_matches_dense(agg_group):
    """Forward + grads through the grouped-problem SpMM kernels
    (spmm.*_grouped via agg_group > 1) match the dense path — covers the
    custom-VJP pair with the grouped backend."""
    cfg, params, dense, sparse, g = _setup(tmax=5)

    def dense_loss(p):
        return tsp.loss_fn(p, dense, cfg)[0]

    def grouped_loss(p):
        return tsp_sparse.loss_fn_sparse(
            p, sparse, cfg, v_pad=g.v_pad, m_pad=g.m_pad,
            use_pallas=True, interpret=True, agg_group=agg_group)[0]

    l_dense = tsp.forward(params, dense, cfg)
    l_grouped = tsp_sparse.forward_sparse(
        params, sparse, cfg, v_pad=g.v_pad, m_pad=g.m_pad,
        use_pallas=True, interpret=True, agg_group=agg_group)
    np.testing.assert_allclose(np.asarray(l_dense), np.asarray(l_grouped),
                               rtol=5e-4, atol=5e-5)
    gd = jax.grad(dense_loss)(params)
    gs = jax.grad(grouped_loss)(params)
    flat_d, _ = jax.flatten_util.ravel_pytree(gd)
    flat_s, _ = jax.flatten_util.ravel_pytree(gs)
    np.testing.assert_allclose(np.asarray(flat_s), np.asarray(flat_d),
                               rtol=2e-3, atol=1e-5)
