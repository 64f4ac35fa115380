"""Decision-TSP model on the typed-GNN engine.

Parity target: the reference's `model.py` [SURVEY §2.4]:
  * types V (vertices) and E (edge-nodes), both dim d=64;
  * EV incidence |E|x|V| with EV[e,v]=1 iff v is an endpoint of e;
  * V0 = one learned d-vector tiled over vertices; E0 = MLP_init([w_e, c])
    with c = per-vertex-normalised target route cost (C*/n, +/- deviation);
  * tmax synchronous iterations: E aggregates V messages through EV, V
    aggregates E messages through EV^T, both updated by LayerNorm-LSTM cells;
  * readout: per-edge vote MLP -> per-instance mean logit -> sigmoid BCE.

Dense padded layout (TPU-first): every instance padded to pad_n vertices; the
incidence matrix of the complete graph on pad_n vertices is a single static
[m, n] constant shared batch-wide, so aggregation is one MXU matmul over the
whole batch.  Masks keep real-lane values identical to the unpadded compute.
"""
from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tsp_gnn_tpu.config import ModelConfig
from tsp_gnn_tpu.models import mlp
from tsp_gnn_tpu.models.tgn import TGNSpec, tgn_init, tgn_run


@functools.lru_cache(maxsize=64)
def edge_list(n: int) -> np.ndarray:
    """Lexicographic (u < v) edge enumeration of the complete graph K_n.

    This fixed order is the framework's canonical edge layout; the loader and
    all sparse kernels share it.  Returns [m, 2] int32, m = n(n-1)/2.
    Cached: the loader calls it per instance on the batch-assembly hot path.
    """
    u, v = np.triu_indices(n, k=1)
    return np.stack([u, v], axis=1).astype(np.int32)


@functools.lru_cache(maxsize=32)
def incidence(n: int) -> np.ndarray:
    """Static [m, n] incidence of K_n (EV[e,v]=1 iff v endpoint of e)."""
    e = edge_list(n)
    m = e.shape[0]
    ev = np.zeros((m, n), np.float32)
    ev[np.arange(m), e[:, 0]] = 1.0
    ev[np.arange(m), e[:, 1]] = 1.0
    return ev


def tsp_spec(cfg: ModelConfig) -> TGNSpec:
    d = cfg.d
    e_rules = [{"mat": "EV", "msg": "V_msg_E", "var": "V"}]
    if cfg.feed_wc_each_step:
        e_rules += [{"mat": "W"}, {"mat": "C"}]
    if cfg.edge_gating:
        # dynamic raw input: per-edge <h_src, h_tgt> (SDDMM), recomputed from
        # the previous iteration's V states each step [VERDICT r2 #10]
        e_rules += [{"mat": "G"}]
    return TGNSpec(
        var={"V": d, "E": d},
        mat={"EV": ("E", "V"), "W": ("E", 1), "C": ("E", 1), "G": ("E", 1)},
        msg={"V_msg_E": ("V", "E"), "E_msg_V": ("E", "V")},
        loop={
            "V": ({"mat": "EV", "msg": "E_msg_V", "var": "E", "transpose": True},),
            "E": tuple(e_rules),
        },
        mlp_depth=cfg.mlp_depth,
        cell_activation=cfg.cell_activation,
        msg_activation=cfg.msg_activation,
        forget_bias=cfg.forget_bias,
        ln_eps=cfg.ln_eps,
    )


def tsp_init(key, cfg: ModelConfig, dtype=jnp.float32) -> dict:
    d = cfg.d
    k_gnn, k_v, k_e, k_vote = jax.random.split(key, 4)
    return {
        "gnn": tgn_init(k_gnn, tsp_spec(cfg), dtype),
        "v_init": jax.random.normal(k_v, (d,), dtype),
        # hidden width d (not in_dim=2): a 2-wide relu bottleneck goes dead
        "e_init": mlp.mlp_init(k_e, [2] + [d] * cfg.mlp_depth, dtype),
        "vote": mlp.mlp_init(k_vote, mlp.mlp_sizes(d, 1, cfg.mlp_depth), dtype),
    }


def initial_states(params: dict, W: jnp.ndarray, C: jnp.ndarray,
                   edge_mask: jnp.ndarray, n: int, cfg: ModelConfig):
    """V0 tiled learned vector; E0 = MLP_init([w, c]) masked on padded edges."""
    B, m = W.shape
    d = cfg.d
    h_v = jnp.broadcast_to(params["v_init"][None, None, :], (B, n, d))
    wc = jnp.stack([W, C], axis=-1)                       # [B, m, 2]
    h_e = mlp.mlp_apply(params["e_init"], wc) * edge_mask[..., None]
    zeros_v = jnp.zeros_like(h_v)
    zeros_e = jnp.zeros_like(h_e)
    return {"V": (zeros_v, h_v), "E": (zeros_e, h_e)}


def forward(
    params: dict,
    batch: Dict[str, jnp.ndarray],
    cfg: ModelConfig,
    tmax: Optional[int] = None,
    return_trajectory: bool = False,
):
    """Batched forward pass -> per-instance logits [B].

    batch: W [B,m], C [B,m], edge_mask [B,m], vertex_mask [B,n] (+ labels).
    """
    tmax = cfg.tmax if tmax is None else tmax
    W, C = batch["W"], batch["C"]
    emask, vmask = batch["edge_mask"], batch["vertex_mask"]
    n = vmask.shape[-1]
    spec = tsp_spec(cfg)
    EV = jnp.asarray(incidence(n), W.dtype)
    matrices = {"EV": EV, "W": W[..., None], "C": C[..., None]}
    if cfg.edge_gating:
        e = edge_list(n)
        eu, ev = jnp.asarray(e[:, 0]), jnp.asarray(e[:, 1])

        def gate(states):
            h_v = states["V"][1] * vmask[..., None]       # [B, n, d]
            g = jnp.sum(h_v[:, eu, :] * h_v[:, ev, :], axis=-1)  # [B, m]
            return (g * emask)[..., None]
        matrices["G"] = gate
    init = initial_states(params, W, C, emask, n, cfg)
    masks = {"V": vmask, "E": emask}
    out = tgn_run(params["gnn"], spec, matrices, init, tmax,
                  masks=masks, remat=cfg.remat,
                  return_trajectory=return_trajectory,
                  unroll=cfg.scan_unroll,
                  remat_policy=cfg.remat_policy)
    if return_trajectory:
        final, traj = out
    else:
        final, traj = out, None
    h_e = final["E"][1]
    votes = mlp.mlp_apply(params["vote"], h_e)[..., 0]    # [B, m]
    denom = jnp.maximum(jnp.sum(emask, axis=-1), 1.0)
    logits = jnp.sum(votes * emask, axis=-1) / denom      # per-instance mean
    if return_trajectory:
        return logits, traj
    return logits


def loss_fn(params: dict, batch: Dict[str, jnp.ndarray], cfg: ModelConfig,
            tmax: Optional[int] = None) -> Tuple[jnp.ndarray, Dict]:
    """Sigmoid BCE on the per-instance mean logit (reference loss)."""
    logits = forward(params, batch, cfg, tmax).astype(jnp.float32)
    labels = batch["labels"].astype(logits.dtype)
    loss = jnp.mean(
        jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits))))
    acc = jnp.mean(((logits > 0).astype(logits.dtype) == labels).astype(logits.dtype))
    return loss, {"loss": loss, "accuracy": acc, "logits": logits}
