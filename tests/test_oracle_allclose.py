"""Allclose contract: the fast JAX path must match the NumPy oracle
(the in-repo reference stand-in, SURVEY §0/§4.1) per layer and per iteration."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tsp_gnn_tpu.config import ModelConfig
from tsp_gnn_tpu.data import generator
from tsp_gnn_tpu.data.loader import make_dense_batch
from tsp_gnn_tpu.models import cells, mlp, oracle, tsp


def _np_params(params):
    return jax.tree.map(lambda x: np.asarray(x), params)


def test_mlp_matches_oracle(rng):
    key = jax.random.PRNGKey(0)
    p = mlp.mlp_init(key, [6, 6, 6, 4])
    x = rng.standard_normal((11, 6)).astype(np.float32)
    got = np.asarray(mlp.mlp_apply(p, jnp.asarray(x)))
    want = oracle.np_mlp(_np_params(p), x)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("act", ["relu", "tanh"])
def test_lstm_step_matches_oracle(rng, act):
    key = jax.random.PRNGKey(1)
    p = cells.lstm_init(key, 10, 8)
    x = rng.standard_normal((5, 10)).astype(np.float32)
    c = rng.standard_normal((5, 8)).astype(np.float32)
    h = rng.standard_normal((5, 8)).astype(np.float32)
    _, (new_c, new_h) = cells.lstm_apply(
        p, jnp.asarray(x), (jnp.asarray(c), jnp.asarray(h)),
        activation=cells.get_activation(act))
    want_c, want_h = oracle.np_lstm_step(_np_params(p), x, c, h, act)
    np.testing.assert_allclose(np.asarray(new_c), want_c, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(new_h), want_h, rtol=1e-5, atol=1e-6)


def _small_setup(tmax=25, d=16, ns=(8, 10, 12), feed_wc=False):
    cfg = ModelConfig(d=d, tmax=tmax, feed_wc_each_step=feed_wc, remat=False)
    params = tsp.tsp_init(jax.random.PRNGKey(7), cfg)
    insts = [generator.generate_instance(np.random.default_rng(i), n)
             for i, n in enumerate(ns)]
    batch = make_dense_batch(insts, deviation=0.02, pad_n=max(ns))
    # oracle instances: one per dual-labeled problem, C already per-edge
    oinsts = []
    for b in range(batch["W"].shape[0]):
        n = int(batch["n_vertices"][b])
        em = batch["edge_mask"][b] > 0
        oinsts.append({"n": n, "W": batch["W"][b][em],
                       "C": batch["C"][b][em]})
    return cfg, params, batch, oinsts


@pytest.mark.parametrize("feed_wc", [False, True])
def test_full_rollout_allclose(feed_wc):
    """Per-iteration embeddings of real lanes match the oracle (tmax=25,
    the PR1 contract config [B:L7])."""
    cfg, params, batch, oinsts = _small_setup(feed_wc=feed_wc)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    logits, traj = tsp.forward(params, jb, cfg, return_trajectory=True)
    want_logits, want_traj = oracle.oracle_forward(
        _np_params(params), oinsts, cfg.tmax,
        cell_activation=cfg.cell_activation,
        feed_wc_each_step=feed_wc, dtype=np.float64)
    e = tsp.edge_list(int(batch["vertex_mask"].shape[1]))
    for t in range(cfg.tmax):
        for b, inst in enumerate(oinsts):
            n = inst["n"]
            sel = (e[:, 0] < n) & (e[:, 1] < n)
            got_v = np.asarray(traj["V"][t, b, :n])
            got_e = np.asarray(traj["E"][t, b][sel])
            np.testing.assert_allclose(
                got_v, want_traj[t]["V"][b], rtol=2e-3, atol=2e-4,
                err_msg=f"V mismatch t={t} b={b}")
            np.testing.assert_allclose(
                got_e, want_traj[t]["E"][b], rtol=2e-3, atol=2e-4,
                err_msg=f"E mismatch t={t} b={b}")
    np.testing.assert_allclose(np.asarray(logits), want_logits,
                               rtol=2e-3, atol=2e-4)


def test_padding_invariance():
    """Padding to a larger n must not change real-instance logits."""
    cfg = ModelConfig(d=16, tmax=10, remat=False)
    params = tsp.tsp_init(jax.random.PRNGKey(3), cfg)
    insts = [generator.generate_instance(np.random.default_rng(5), 9)]
    b_small = make_dense_batch(insts, 0.02, pad_n=9)
    b_big = make_dense_batch(insts, 0.02, pad_n=14)
    l_small = tsp.forward(params, {k: jnp.asarray(v) for k, v in b_small.items()}, cfg)
    l_big = tsp.forward(params, {k: jnp.asarray(v) for k, v in b_big.items()}, cfg)
    np.testing.assert_allclose(np.asarray(l_small), np.asarray(l_big),
                               rtol=1e-4, atol=1e-5)


def test_loss_and_accuracy():
    cfg, params, batch, _ = _small_setup(tmax=5)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    loss, aux = tsp.loss_fn(params, jb, cfg)
    assert np.isfinite(float(loss))
    assert 0.0 <= float(aux["accuracy"]) <= 1.0
    # BCE at init should be near ln(2)
    assert 0.2 < float(loss) < 2.5


def test_edge_gating_rollout_allclose():
    """The SDDMM edge-gating variant matches the independent NumPy oracle
    per iteration (the gate is derived separately in the oracle via an
    explicit per-edge loop) [VERDICT r2 #10]."""
    import dataclasses
    cfg, params, batch, oinsts = _small_setup(tmax=10)
    cfg = dataclasses.replace(cfg, edge_gating=True)
    params = tsp.tsp_init(jax.random.PRNGKey(7), cfg)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    logits, traj = tsp.forward(params, jb, cfg, return_trajectory=True)
    want_logits, want_traj = oracle.oracle_forward(
        _np_params(params), oinsts, cfg.tmax,
        cell_activation=cfg.cell_activation, edge_gating=True,
        dtype=np.float64)
    e = tsp.edge_list(int(batch["vertex_mask"].shape[1]))
    for t in range(cfg.tmax):
        for b, inst in enumerate(oinsts):
            n = inst["n"]
            sel = (e[:, 0] < n) & (e[:, 1] < n)
            np.testing.assert_allclose(
                np.asarray(traj["E"][t, b][sel]), want_traj[t]["E"][b],
                rtol=2e-3, atol=2e-4, err_msg=f"E mismatch t={t} b={b}")
    np.testing.assert_allclose(np.asarray(logits), want_logits,
                               rtol=2e-3, atol=2e-4)
