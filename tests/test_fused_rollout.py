"""Fused VMEM-resident rollout kernel vs the scan-based sparse path."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tsp_gnn_tpu.config import ModelConfig
from tsp_gnn_tpu.data import generator
from tsp_gnn_tpu.models import tsp, tsp_sparse
from tsp_gnn_tpu.ops import fused_rollout, layout


def _setup(ns=(12, 17), tmax=5, d=16):
    cfg = ModelConfig(d=d, tmax=tmax, remat=False)
    params = tsp.tsp_init(jax.random.PRNGKey(4), cfg)
    rng = np.random.default_rng(11)
    insts = [generator.generate_instance(rng, n) for n in ns]
    g = layout.build_uniform_block_graph(insts, 0.02, max(ns))
    batch = {k: jnp.asarray(v)
             for k, v in tsp_sparse.block_batch_arrays(g).items()}
    return cfg, params, batch, g


@pytest.mark.parametrize("group", [1, 2, 4])
def test_fused_matches_sparse(group):
    cfg, params, batch, g = _setup()
    want = tsp_sparse.forward_sparse(params, batch, cfg, v_pad=g.v_pad,
                                     m_pad=g.m_pad, use_pallas=False)
    got = fused_rollout.forward_fused(params, batch, cfg, v_pad=g.v_pad,
                                      m_pad=g.m_pad, group=group,
                                      interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-4, atol=5e-5)


def test_fused_tanh_cell():
    cfg, params, batch, g = _setup()
    cfg = dataclasses.replace(cfg, cell_activation="tanh")
    want = tsp_sparse.forward_sparse(params, batch, cfg, v_pad=g.v_pad,
                                     m_pad=g.m_pad, use_pallas=False)
    got = fused_rollout.forward_fused(params, batch, cfg, v_pad=g.v_pad,
                                      m_pad=g.m_pad, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-4, atol=5e-5)
