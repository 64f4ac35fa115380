"""Decision-TSP forward on the block-diagonal sparse layout (Pallas path).

Semantically identical to models/tsp.py (the dense padded path) — same
parameters, same equations, per-iteration allclose (tests/test_sparse_path.py)
— but operating on the UniformBlockGraph mega-batch with flat [N, d] vertex
and [M, d] edge tensors and Pallas incidence-SpMM kernels (ops/spmm.py).

This is the layout that scales: the edge axis is what gets partitioned across
the `graph` mesh axis (SURVEY §2.2 — the sequence-parallel analogue), and the
fused kernels keep the hot loop MXU-resident [B:L5].

Autodiff: the two incidence aggregations are transposes of each other, so
each kernel's VJP is the other kernel — wired via jax.custom_vjp below.  Mask
and index inputs are treated as constants (zero cotangents).
"""
from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tsp_gnn_tpu.config import ModelConfig
from tsp_gnn_tpu.models import mlp
from tsp_gnn_tpu.ops import spmm
from tsp_gnn_tpu.ops.layout import UniformBlockGraph


def make_incidence_ops(v_pad: int, m_pad: int, num_problems: int,
                       use_pallas: bool = True, tile_e: int = 1024,
                       interpret=None, agg_group: int = 1):
    """Returns (e_from_v, v_from_e) closures with custom VJPs.

    d/dx_v [ (S+T) @ x_v ] . g  =  (S+T)^T @ g   — i.e. the other kernel.
    agg_group > 1 selects the grouped-problem kernels (spmm.*_grouped:
    `agg_group` whole problems per grid step — fewer pipeline bubbles,
    no output revisits in the scatter direction).
    """
    kw = dict(v_pad=v_pad, m_pad=m_pad)
    if use_pallas and agg_group > 1:
        _efv = functools.partial(spmm.e_from_v_grouped, group=agg_group,
                                 interpret=interpret,
                                 num_problems=num_problems, **kw)
        _vfe = functools.partial(spmm.v_from_e_grouped, group=agg_group,
                                 interpret=interpret,
                                 num_problems=num_problems, **kw)
    elif use_pallas:
        _efv = functools.partial(spmm.e_from_v, tile_e=tile_e,
                                 interpret=interpret, **kw)
        _vfe = functools.partial(spmm.v_from_e, tile_e=tile_e,
                                 interpret=interpret,
                                 num_problems=num_problems, **kw)
    else:
        _efv = functools.partial(spmm.e_from_v_ref, **kw)
        _vfe = functools.partial(spmm.v_from_e_ref,
                                 num_problems=num_problems, **kw)

    @jax.custom_vjp
    def e_from_v(src2, tgt2, em2, x_v):
        return _efv(src2, tgt2, em2, x_v)

    def efv_fwd(src2, tgt2, em2, x_v):
        return _efv(src2, tgt2, em2, x_v), (src2, tgt2, em2)

    def efv_bwd(res, g):
        src2, tgt2, em2 = res
        return None, None, None, _vfe(src2, tgt2, em2, g)

    e_from_v.defvjp(efv_fwd, efv_bwd)

    @jax.custom_vjp
    def v_from_e(src2, tgt2, em2, x_e):
        return _vfe(src2, tgt2, em2, x_e)

    def vfe_fwd(src2, tgt2, em2, x_e):
        return _vfe(src2, tgt2, em2, x_e), (src2, tgt2, em2)

    def vfe_bwd(res, g):
        src2, tgt2, em2 = res
        return None, None, None, _efv(src2, tgt2, em2, g)

    v_from_e.defvjp(vfe_fwd, vfe_bwd)
    return e_from_v, v_from_e


def make_sddmm_op(v_pad: int, m_pad: int, num_problems: int,
                  use_pallas: bool = True, tile_e: int = 1024,
                  interpret=None):
    """Per-edge <x_src, x_tgt> with gradients — the SDDMM kernel's
    production consumer (edge-gating model variant) [VERDICT r2 #10].

    VJP derivation (el: e_from_v, ve: v_from_e, both em-masked, g: [M,1]
    cotangent): d<x_s,x_t>/dx_v sums g_e * x_other over incident edges;
    with 0/1 masks  ve(g * el(x))[v] = dx[v] + x[v] * ve(g)[v],  so
        dx = ve(g * el(x)) - x * ve(g)
    — three calls to the already-verified incidence kernels, no new
    Mosaic code in the backward."""
    kw = dict(v_pad=v_pad, m_pad=m_pad)
    if use_pallas:
        _sd = functools.partial(spmm.sddmm, tile_e=tile_e,
                                interpret=interpret, **kw)
        _efv = functools.partial(spmm.e_from_v, tile_e=tile_e,
                                 interpret=interpret, **kw)
        _vfe = functools.partial(spmm.v_from_e, tile_e=tile_e,
                                 interpret=interpret,
                                 num_problems=num_problems, **kw)
    else:
        _sd = functools.partial(spmm.sddmm_ref, **kw)
        _efv = functools.partial(spmm.e_from_v_ref, **kw)
        _vfe = functools.partial(spmm.v_from_e_ref,
                                 num_problems=num_problems, **kw)

    @jax.custom_vjp
    def sd(src2, tgt2, em2, x_v):
        return _sd(src2, tgt2, em2, x_v).reshape(-1, 1)      # [M, 1]

    def fwd(src2, tgt2, em2, x_v):
        return sd(src2, tgt2, em2, x_v), (src2, tgt2, em2, x_v)

    def bwd(res, g):
        src2, tgt2, em2, x_v = res
        h_sum = _efv(src2, tgt2, em2, x_v)                   # em*(x_s + x_t)
        # broadcast g across the feature dim: d=1 lanes would force Mosaic
        # onto a degenerate 1-wide tile; every column of ve(g_b) is deg_g
        g_b = jnp.broadcast_to(g, (g.shape[0], x_v.shape[-1]))
        dx = (_vfe(src2, tgt2, em2, g * h_sum)
              - x_v * _vfe(src2, tgt2, em2, g_b))
        return None, None, None, dx

    sd.defvjp(fwd, bwd)
    return sd


def block_batch_arrays(g: UniformBlockGraph) -> Dict[str, np.ndarray]:
    """UniformBlockGraph -> feed dict.

    Indices/edge-validity for the kernels are LANE-MAJOR [M/128, 128]
    (src2/tgt2/em2 — see ops/spmm.py layout notes); per-edge feature columns
    stay [M, 1]."""
    col = lambda a: np.asarray(a).reshape(-1, 1)
    lane = lambda a: np.asarray(a).reshape(-1, 128)
    return {
        "src2": lane(g.src).astype(np.int32),
        "tgt2": lane(g.tgt).astype(np.int32),
        "em2": lane(g.edge_mask).astype(np.float32),
        "edge_mask": col(g.edge_mask).astype(np.float32),
        "vert_mask": col(g.vert_mask).astype(np.float32),
        "W": col(g.W).astype(np.float32),
        "C": col(g.C).astype(np.float32),
        "labels": np.asarray(g.labels, np.float32),
        "n_edges": np.asarray(g.n_edges, np.int32),
        "n_vertices": np.asarray(g.n_vertices, np.int32),
    }


def make_flat_step(cfg: ModelConfig, gnn_params: dict,
                   batch: Dict[str, jnp.ndarray], masks: Dict[str, jnp.ndarray],
                   e_from_v, v_from_e, sddmm_op=None):
    """THE single step definition for flat block-diagonal layouts
    (VERDICT r1 #5): binds the tsp spec + an aggregation backend into
    `tgn.tgn_step`, so the Pallas sparse path and the shard_mapped halo path
    share the cell/MLP wiring with the dense engine instead of hand-rolling
    it.  `e_from_v`/`v_from_e` take (src2, tgt2, em2, x); `sddmm_op`
    (required iff cfg.edge_gating) computes the per-edge gate [M, 1]."""
    from tsp_gnn_tpu.models import tgn
    from tsp_gnn_tpu.models.tsp import tsp_spec
    spec = tsp_spec(cfg)
    src2, tgt2, em2 = batch["src2"], batch["tgt2"], batch["em2"]
    # "EV" is realised by the aggregation closures, not a materialised matrix
    matrices = {"EV": None, "W": batch["W"], "C": batch["C"]}
    if cfg.edge_gating:
        assert sddmm_op is not None, "edge_gating needs an sddmm_op backend"
        matrices["G"] = lambda states: sddmm_op(src2, tgt2, em2,
                                                states["V"][1])

    def aggregate(rule, _M, x):
        if rule.get("transpose", False):
            return v_from_e(src2, tgt2, em2, x)    # V <- incident edges
        return e_from_v(src2, tgt2, em2, x)        # E <- its two endpoints

    def step(state):
        return tgn.tgn_step(gnn_params, spec, matrices, state, masks,
                            aggregate=aggregate)
    return step


def make_segment_readout(m_pad: int, num_problems: int, *,
                         use_pallas: bool = True, interpret=None):
    """Per-problem (vote_sum, edge_count) via the Pallas segment-reduce
    kernel (ops/spmm.segment_sum_per_problem) — the production readout
    [VERDICT r1 Weak #6].  Linear op: custom VJP broadcasts the incoming
    per-problem cotangent back over each problem's (masked) edge lanes."""
    if use_pallas:
        fn = functools.partial(spmm.segment_sum_per_problem, m_pad=m_pad,
                               num_problems=num_problems, interpret=interpret)
    else:
        fn = functools.partial(spmm.segment_sum_ref, m_pad=m_pad,
                               num_problems=num_problems)
    rows_per_prob = m_pad // 128

    @jax.custom_vjp
    def seg(votes2, em2):
        return fn(votes2, em2)

    def fwd(votes2, em2):
        return fn(votes2, em2), (em2,)

    def bwd(res, g):
        (em2,) = res
        gv = jnp.repeat(g[:, 0], rows_per_prob)[:, None]   # [M//128, 1]
        return (jnp.broadcast_to(gv, em2.shape) * em2,
                jnp.zeros_like(em2))   # masks are data, not trained
    seg.defvjp(fwd, bwd)
    return seg


def forward_sparse(
    params: dict,
    batch: Dict[str, jnp.ndarray],
    cfg: ModelConfig,
    *,
    v_pad: int,
    m_pad: int,
    tmax: Optional[int] = None,
    use_pallas: bool = True,
    tile_e: int = 1024,
    interpret=None,
    return_trajectory: bool = False,
    agg_group: int = 1,
):
    """Sparse-path forward -> per-problem logits [B].

    batch arrays per block_batch_arrays; params identical to models/tsp.py.
    The per-iteration step is tgn.tgn_step with the Pallas incidence ops
    plugged in as the aggregation backend (one step definition everywhere).
    """
    tmax = cfg.tmax if tmax is None else tmax
    B = batch["labels"].shape[0]
    em, vm = batch["edge_mask"], batch["vert_mask"]
    e_from_v, v_from_e = make_incidence_ops(
        v_pad, m_pad, B, use_pallas=use_pallas, tile_e=tile_e,
        interpret=interpret, agg_group=agg_group)

    d = params["v_init"].shape[0]
    N, M = B * v_pad, B * m_pad

    h_v = jnp.broadcast_to(params["v_init"][None, :], (N, d))
    wc = jnp.concatenate([batch["W"], batch["C"]], axis=-1)
    h_e = mlp.mlp_apply(params["e_init"], wc) * em
    state = {"V": (jnp.zeros((N, d), h_v.dtype), h_v),
             "E": (jnp.zeros((M, d), h_e.dtype), h_e)}

    sddmm_op = (make_sddmm_op(v_pad, m_pad, B, use_pallas=use_pallas,
                              tile_e=tile_e, interpret=interpret)
                if cfg.edge_gating else None)
    step = make_flat_step(cfg, params["gnn"], batch, {"V": vm, "E": em},
                          e_from_v, v_from_e, sddmm_op=sddmm_op)
    if cfg.remat:
        from tsp_gnn_tpu.models.tgn import checkpoint_step
        step = checkpoint_step(step, cfg.remat_policy)

    def body(carry, _):
        nxt = step(carry)
        ys = ({"V": nxt["V"][1], "E": nxt["E"][1]}
              if return_trajectory else None)
        return nxt, ys

    final, traj = jax.lax.scan(body, state, None, length=tmax,
                               unroll=min(cfg.scan_unroll, tmax))
    h_e = final["E"][1]
    votes = mlp.mlp_apply(params["vote"], h_e) * em          # [M, 1]
    seg = make_segment_readout(m_pad, B, use_pallas=use_pallas,
                               interpret=interpret)
    out = seg(votes[:, 0].reshape(-1, 128), batch["em2"])    # [B, 2]
    logits = out[:, 0] / jnp.maximum(out[:, 1], 1.0)
    if return_trajectory:
        return logits, traj
    return logits


def make_fused_logits(cfg: ModelConfig, *, v_pad: int, m_pad: int,
                      group: int = 4, tmax: Optional[int] = None,
                      use_pallas_bwd: bool = True):
    """Training-capable fused forward: the VMEM-resident rollout kernel
    (ops/fused_rollout) computes logits; the backward recomputes through the
    scan path and takes ITS vjp (gradient correctness inherited from the
    tested-equivalent scan implementation — rematerialisation, no residuals
    saved).  Batch cotangents are zero (indices/masks/weights are data)."""
    from tsp_gnn_tpu.ops import fused_rollout
    assert not cfg.edge_gating, (
        "edge_gating is not implemented in the fused rollout kernel; "
        "use the scan paths (fused=False)")

    def scan_logits(params, batch):
        return forward_sparse(params, batch, cfg, v_pad=v_pad, m_pad=m_pad,
                              tmax=tmax, use_pallas=use_pallas_bwd)

    @jax.custom_vjp
    def logits_fn(params, batch):
        return fused_rollout.forward_fused(params, batch, cfg, v_pad=v_pad,
                                           m_pad=m_pad, tmax=tmax,
                                           group=group)

    def fwd(params, batch):
        return logits_fn(params, batch), (params, batch)

    def bwd(res, g):
        params, batch = res
        _, vjp = jax.vjp(lambda p: scan_logits(p, batch), params)
        (dparams,) = vjp(g)

        def zero_ct(x):
            if jnp.issubdtype(x.dtype, jnp.inexact):
                return jnp.zeros_like(x)
            return np.zeros(x.shape, jax.dtypes.float0)

        return dparams, jax.tree.map(zero_ct, batch)

    logits_fn.defvjp(fwd, bwd)
    return logits_fn


def loss_fn_sparse(params, batch, cfg: ModelConfig, *, v_pad: int,
                   m_pad: int, tmax: Optional[int] = None,
                   use_pallas: bool = True, tile_e: int = 1024,
                   interpret=None,
                   agg_group: int = 1) -> Tuple[jnp.ndarray, Dict]:
    logits = forward_sparse(params, batch, cfg, v_pad=v_pad, m_pad=m_pad,
                            tmax=tmax, use_pallas=use_pallas, tile_e=tile_e,
                            interpret=interpret,
                            agg_group=agg_group).astype(jnp.float32)
    labels = batch["labels"].astype(logits.dtype)
    loss = jnp.mean(jnp.maximum(logits, 0) - logits * labels
                    + jnp.log1p(jnp.exp(-jnp.abs(logits))))
    acc = jnp.mean(((logits > 0).astype(logits.dtype) == labels)
                   .astype(logits.dtype))
    return loss, {"loss": loss, "accuracy": acc, "logits": logits}
