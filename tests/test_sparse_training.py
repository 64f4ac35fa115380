"""Sparse-layout training path (train --layout sparse): kernel and fused
forwards train end-to-end; fused custom-VJP grads match the scan path."""
import dataclasses

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

from tsp_gnn_tpu import train as tr
from tsp_gnn_tpu.config import KernelConfig, ModelConfig, get_config
from tsp_gnn_tpu.data import generator
from tsp_gnn_tpu.models import tsp, tsp_sparse
from tsp_gnn_tpu.ops import layout


def _cfg(fused=False, layout="sparse"):
    cfg = get_config("pr1")
    return cfg.replace(
        model=dataclasses.replace(cfg.model, d=16, tmax=4, remat=False),
        data=dataclasses.replace(cfg.data, n_min=10, n_max=10, pad_n=10,
                                 batch_size=4),
        train=dataclasses.replace(cfg.train, layout=layout, lr=1e-3),
        kernel=KernelConfig(use_pallas=True, fused=fused, batch_tile=4),
    )


def _batch(cfg):
    rng = np.random.default_rng(0)
    insts = [generator.generate_instance(rng, 10) for _ in range(4)]
    return tr.device_batch(tr.build_batch(insts, 0.3, 10, "sparse"))


def test_fused_logits_grads_match_scan():
    cfg = _cfg(fused=True)
    params = tsp.tsp_init(jax.random.PRNGKey(0), cfg.model)
    batch = _batch(cfg)
    B = int(batch["labels"].shape[0])
    m_pad = batch["edge_mask"].shape[0] // B
    v_pad = batch["vert_mask"].shape[0] // B
    logits_fn = tsp_sparse.make_fused_logits(cfg.model, v_pad=v_pad,
                                             m_pad=m_pad, group=2)

    def fused_loss(p):
        return jnp.sum(logits_fn(p, batch) ** 2)

    def scan_loss(p):
        return jnp.sum(tsp_sparse.forward_sparse(
            p, batch, cfg.model, v_pad=v_pad, m_pad=m_pad,
            use_pallas=False) ** 2)

    lf, gf = jax.value_and_grad(fused_loss)(params)
    ls, gs = jax.value_and_grad(scan_loss)(params)
    np.testing.assert_allclose(float(lf), float(ls), rtol=1e-4)
    ff, _ = jax.flatten_util.ravel_pytree(gf)
    fs, _ = jax.flatten_util.ravel_pytree(gs)
    np.testing.assert_allclose(np.asarray(ff), np.asarray(fs),
                               rtol=2e-3, atol=1e-6)


@pytest.mark.parametrize("fused", [False, True])
def test_sparse_train_step_learns(fused):
    cfg = _cfg(fused=fused)
    params = tsp.tsp_init(jax.random.PRNGKey(1), cfg.model)
    opt_state = tr.make_optimizer(cfg).init(params)
    batch = _batch(cfg)
    losses = []
    for _ in range(6):
        params, opt_state, m = tr.train_step(params, opt_state, batch, cfg)
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_sparse_layout_end_to_end_train(tmp_path):
    cfg = _cfg(fused=False)
    cfg = cfg.replace(train=dataclasses.replace(cfg.train,
                                                batches_per_epoch=4))
    out = tr.train(cfg, epochs=1, seed=0, log_dir=str(tmp_path),
                   eval_instances=8)
    assert np.isfinite(out["metrics"]["train_loss"])


def test_fused_bwd_train_step_learns():
    """train_step with kernel.fused_bwd=True (the fused Pallas backward,
    ops/rollout_grad) runs and learns — full wiring through _model_loss."""
    cfg = _cfg()
    cfg = cfg.replace(kernel=KernelConfig(use_pallas=True, fused_bwd=True,
                                          bwd_tile=2))
    params = tsp.tsp_init(jax.random.PRNGKey(1), cfg.model)
    opt_state = tr.make_optimizer(cfg).init(params)
    batch = _batch(cfg)
    losses = []
    for _ in range(6):
        params, opt_state, m = tr.train_step(params, opt_state, batch, cfg)
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_fused_bwd_train_step_bf16():
    """Mixed-precision (bf16 compute) through the fused backward path."""
    cfg = _cfg()
    cfg = cfg.replace(
        train=dataclasses.replace(cfg.train, bf16=True),
        kernel=KernelConfig(use_pallas=True, fused_bwd=True, bwd_tile=2))
    params = tsp.tsp_init(jax.random.PRNGKey(1), cfg.model)
    opt_state = tr.make_optimizer(cfg).init(params)
    batch = _batch(cfg)
    for _ in range(2):
        params, opt_state, m = tr.train_step(params, opt_state, batch, cfg)
        assert np.isfinite(float(m["loss"]))
