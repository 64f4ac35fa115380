"""bf16 mixed-precision path [B:L10]: forward stays close to f32, training
steps run and remain finite, LayerNorm statistics stay in f32."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tsp_gnn_tpu import train as tr
from tsp_gnn_tpu.config import get_config
from tsp_gnn_tpu.data import generator
from tsp_gnn_tpu.data.loader import make_dense_batch
from tsp_gnn_tpu.models import tsp


def _setup():
    cfg = get_config("pr1")
    cfg = cfg.replace(model=dataclasses.replace(cfg.model, d=32, tmax=8))
    params = tsp.tsp_init(jax.random.PRNGKey(0), cfg.model)
    rng = np.random.default_rng(0)
    insts = [generator.generate_instance(rng, 12) for _ in range(4)]
    batch = {k: jnp.asarray(v)
             for k, v in make_dense_batch(insts, 0.1, 12).items()}
    return cfg, params, batch


def test_bf16_forward_close_to_f32():
    cfg, params, batch = _setup()
    l32 = tsp.forward(params, batch, cfg.model)
    l16 = tsp.forward(tr._cast_bf16(params), tr._cast_bf16(batch), cfg.model)
    assert l16.dtype == jnp.bfloat16
    # recurrent bf16 error accumulates; logits must stay in the same regime
    np.testing.assert_allclose(np.asarray(l16, np.float32),
                               np.asarray(l32), rtol=0.2, atol=0.15)


def test_bf16_train_step_finite_and_learns():
    cfg, params, batch = _setup()
    cfg = cfg.replace(train=dataclasses.replace(cfg.train, bf16=True,
                                                lr=1e-3))
    opt_state = tr.make_optimizer(cfg).init(params)
    losses = []
    for _ in range(8):
        params, opt_state, m = tr.train_step(params, opt_state, batch, cfg)
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    # master params stay f32
    assert params["v_init"].dtype == jnp.float32
