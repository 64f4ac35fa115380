"""Fused message-passing rollout: the whole tmax loop in VMEM.

The XLA scan path writes and re-reads every type's (h, c) state to HBM each
iteration — the dominant traffic of the hot loop (SURVEY §3.2).  This kernel
keeps a GROUP of problems' states resident in VMEM for the ENTIRE rollout:
per grid step it loads initial states once, runs tmax iterations of
  msg MLPs -> incidence aggregation (one-hot MXU tiles, as ops/spmm.py)
  -> LayerNorm-LSTM updates (both types)
entirely on-chip, and writes only the final states.  HBM traffic drops from
O(tmax * states) to O(states).

This is the "fused SpMM+LSTM step kernel, bf16 embeddings" deliverable of
BASELINE.json configs[3].  Forward-only: training wraps it in jax.custom_vjp
with the (tested-equivalent) jnp path supplying the backward via
recomputation, so autodiff correctness is inherited, while eval/inference and
the forward half of training take the fused path.

Parameter packing (all MLPs are depth-3 d->d, see models/mlp.py sizing) —
ALL 2-D so every VMEM ref is a plain Mosaic-friendly tile (the round-1
4-D/3-D constant refs tripped the Mosaic verifier; sub-arrays are sliced
with STATIC row offsets since `which`/`l` are Python-unrolled):
  msg_w   [6*d, d]   rows [(which*3+l)*d : +d]   (which 0 = V_msg_E, 1 = E_msg_V)
  msg_b   [6, d]     row which*3+l
  lstm_k  [2*2d, 4d] rows [which*2d : +2d]
  ln_g/ln_b [10, d]  row which*5+gate
"""
from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tsp_gnn_tpu.config import ModelConfig
from tsp_gnn_tpu.models import cells, mlp

TILE = 128


def pack_params(params: dict, cfg: ModelConfig, dtype=jnp.float32) -> Dict:
    """Model params (models/tsp.py layout) -> fused-kernel arrays."""
    gnn = params["gnn"]
    d = params["v_init"].shape[0]
    assert cfg.mlp_depth == 3, "fused kernel assumes depth-3 message MLPs"

    def stack_mlp(p):
        return (jnp.stack([layer["w"] for layer in p]).astype(dtype),
                jnp.stack([layer["b"] for layer in p]).astype(dtype))

    wv, bv = stack_mlp(gnn["msgs"]["V_msg_E"])        # [3, d, d], [3, d]
    we, be = stack_mlp(gnn["msgs"]["E_msg_V"])
    lstm_k = jnp.concatenate([gnn["cells"]["V"]["kernel"],
                              gnn["cells"]["E"]["kernel"]],
                             axis=0).astype(dtype)     # [2*2d, 4d]
    gains, shifts = [], []
    for cell in ("V", "E"):
        gains += [gnn["cells"][cell][f"ln_{g}"]["g"] for g in cells.GATES]
        shifts += [gnn["cells"][cell][f"ln_{g}"]["b"] for g in cells.GATES]
    return {
        "msg_w": jnp.concatenate([wv, we]).reshape(6 * d, d),
        "msg_b": jnp.concatenate([bv, be]).reshape(6, d),
        "lstm_k": lstm_k,
        "ln_g": jnp.stack(gains).astype(jnp.float32),   # [10, d]
        "ln_b": jnp.stack(shifts).astype(jnp.float32),
    }


def _ln(x, g, b, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps) * g + b).astype(x.dtype)


def _sigmoid(x):
    """sigmoid with f32 internals: Mosaic's bf16 `logistic` lowering emits an
    f32-scalar -> bf16-vector `vector.broadcast` that fails the MLIR verifier
    (measured on jaxlib 0.9.0; scripts/fused_repro.py captures it), so the
    transcendental runs in f32 and casts back."""
    return jax.nn.sigmoid(x.astype(jnp.float32)).astype(x.dtype)


def _tanh(x):
    """tanh via f32 — same Mosaic bf16 transcendental hazard as _sigmoid."""
    return jnp.tanh(x.astype(jnp.float32)).astype(x.dtype)


def _mlp(x, w_ref, b_ref, which, depth=3):
    # NB: every ref access below is a STATIC 2-D slice (which/l are
    # Python-unrolled); 1-D row reads + [None, :] re-broadcast tripped the
    # Mosaic 'vector.broadcast' verifier on the bf16 path.
    d = x.shape[-1]
    for l in range(depth):
        w = w_ref[(which * depth + l) * d:(which * depth + l + 1) * d, :]
        row = which * depth + l
        b = b_ref[row:row + 1, :].astype(x.dtype)
        x = jnp.dot(x, w, preferred_element_type=jnp.float32
                    ).astype(x.dtype) + b
        if l < depth - 1:
            x = jnp.maximum(x, 0)
    return x


def _lstm(z_in, h, c, k_ref, g_ref, b_ref, which, act, forget_bias, eps):
    d = h.shape[-1]
    k = k_ref[which * 2 * d:(which + 1) * 2 * d, :]
    z = jnp.dot(jnp.concatenate([z_in, h], axis=-1), k,
                preferred_element_type=jnp.float32).astype(z_in.dtype)

    def ln_gate(x, gate):
        row = which * 5 + gate  # static: which/gate are Python ints
        return _ln(x, g_ref[row:row + 1, :], b_ref[row:row + 1, :], eps)

    i = ln_gate(z[:, 0 * d:1 * d], 0)
    j = ln_gate(z[:, 1 * d:2 * d], 1)
    f = ln_gate(z[:, 2 * d:3 * d], 2)
    o = ln_gate(z[:, 3 * d:4 * d], 3)
    new_c = c * _sigmoid(f + forget_bias) + _sigmoid(i) * act(j)
    ln_c = ln_gate(new_c, 4)
    new_h = act(ln_c) * _sigmoid(o)
    return new_h, new_c


def _rollout_kernel(src_ref, tgt_ref, em_ref, emcol_ref, vm_ref, hv0_ref,
                    he0_ref, mw_ref, mb_ref, k_ref, g_ref, b_ref,
                    hv_out, he_out, *,
                    tmax, v_pad, m_pad, group, cell_act, forget_bias, eps):
    act = {"relu": lambda x: jnp.maximum(x, 0), "tanh": _tanh}[cell_act]
    rows = m_pad // TILE
    # uniform compute dtype: implicit f32xbf16 promotion inside the kernel
    # produced Mosaic broadcast-verifier failures
    dtype = hv0_ref.dtype
    vm = vm_ref[:].astype(dtype)
    # the per-edge mask is consumed in TWO layouts: lane-major [rows, 128]
    # for the one-hot tiles (em_ref) and column [M, 1] for masking edge-state
    # rows (emcol_ref).  It arrives as two inputs because an in-kernel
    # lane->sublane reshape is a Mosaic relayout the toolchain rejects
    # ("infer-vector-layout: unsupported shape cast", scripts/fused_repro.py).
    em_col = emcol_ref[:].astype(dtype)

    # Per-problem transposed one-hot incidence [v_pad, m_pad], built ONCE
    # before the tmax loop (round-1 rebuilt [v_pad, 128] tiles inside every
    # iteration — 2*tmax*rows redundant VPU compares).  VMEM cost is tiny
    # (group * v_pad * m_pad * 4B ~ hundreds of KB); both aggregation
    # directions become ONE MXU dot per problem per iteration, and the
    # v_from_e direction contracts over m_pad (>=1024) instead of 128 —
    # full systolic-array depth.
    vid = jax.lax.broadcasted_iota(jnp.int32, (v_pad, TILE), 0)
    ohs = []
    for p in range(group):
        tiles = []
        for r in range(rows):
            idx = p * rows + r  # static slice bounds: Python-unrolled
            oh = ((vid == src_ref[idx:idx + 1, :]).astype(dtype)
                  + (vid == tgt_ref[idx:idx + 1, :]).astype(dtype))
            tiles.append(oh * em_ref[idx:idx + 1, :].astype(dtype))
        ohs.append(jnp.concatenate(tiles, axis=1))     # [v_pad, m_pad]

    def body(_, carry):
        h_v, c_v, h_e, c_e = carry
        msg_v = _mlp(h_v * vm, mw_ref, mb_ref, 0)
        msg_e = _mlp(h_e * em_col, mw_ref, mb_ref, 1) * em_col
        agg_e_parts = []
        agg_v_parts = []
        for p in range(group):
            xw = msg_v[p * v_pad:(p + 1) * v_pad, :]
            xe = msg_e[p * m_pad:(p + 1) * m_pad, :]
            agg_e_parts.append(jax.lax.dot_general(
                ohs[p], xw, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(h_e.dtype))
            agg_v_parts.append(jax.lax.dot_general(
                ohs[p], xe, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(h_v.dtype))
        agg_e = jnp.concatenate(agg_e_parts, axis=0)
        agg_v = jnp.concatenate(agg_v_parts, axis=0)
        h_v, c_v = _lstm(agg_v, h_v, c_v, k_ref, g_ref, b_ref, 0, act,
                         forget_bias, eps)
        h_e, c_e = _lstm(agg_e, h_e, c_e, k_ref, g_ref, b_ref, 1, act,
                         forget_bias, eps)
        return h_v, c_v, h_e, c_e

    h_v0 = hv0_ref[:]
    h_e0 = he0_ref[:]
    init = (h_v0, jnp.zeros_like(h_v0), h_e0, jnp.zeros_like(h_e0))
    h_v, c_v, h_e, c_e = jax.lax.fori_loop(0, tmax, body, init)
    hv_out[:] = h_v
    he_out[:] = h_e


def fused_rollout(src2, tgt2, em2, edge_mask, vert_mask, h_v0, h_e0,
                  packed, *,
                  tmax: int, v_pad: int, m_pad: int, num_problems: int,
                  group: int = 4, cell_activation: str = "relu",
                  forget_bias: float = 1.0, ln_eps: float = 1e-12,
                  interpret=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run tmax MP iterations fully on-chip; returns (h_v_T, h_e_T).

    src2/tgt2/em2: lane-major [M/128, 128]; edge_mask [M, 1] (the same mask
    in column layout — see the relayout note in _rollout_kernel);
    vert_mask [N, 1]; h_v0 [N, d]; h_e0 [M, d]; packed = pack_params(...).
    """
    from tsp_gnn_tpu.ops.spmm import resolve_interpret
    interpret = resolve_interpret(interpret)
    d = h_v0.shape[-1]
    while num_problems % group:
        group //= 2
    rows = m_pad // TILE
    grid = (num_problems // group,)
    # all parameter blocks are 2-D tiles (see packing note in the docstring)
    const = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _rollout_kernel, tmax=tmax, v_pad=v_pad, m_pad=m_pad, group=group,
        cell_act=cell_activation, forget_bias=forget_bias, eps=ln_eps)
    return pl.pallas_call(
        kernel,
        grid=grid,
        # the default 16MB scoped-vmem stack limit rejects group=4 at
        # flagship shapes (measured: 20.55M needed — scripts/fused_repro.py);
        # v5e VMEM is 128MB, leave headroom for the in/out blocks
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        in_specs=[
            pl.BlockSpec((group * rows, TILE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group * rows, TILE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group * rows, TILE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group * m_pad, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group * v_pad, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group * v_pad, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group * m_pad, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            const(packed["msg_w"].shape),
            const(packed["msg_b"].shape),
            const(packed["lstm_k"].shape),
            const(packed["ln_g"].shape),
            const(packed["ln_b"].shape),
        ],
        out_specs=(
            pl.BlockSpec((group * v_pad, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group * m_pad, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((num_problems * v_pad, d), h_v0.dtype),
            jax.ShapeDtypeStruct((num_problems * m_pad, d), h_e0.dtype),
        ),
        interpret=interpret,
    )(src2, tgt2, em2, edge_mask, vert_mask, h_v0, h_e0,
      packed["msg_w"], packed["msg_b"], packed["lstm_k"],
      packed["ln_g"], packed["ln_b"])


def forward_fused(params: dict, batch: Dict[str, jnp.ndarray],
                  cfg: ModelConfig, *, v_pad: int, m_pad: int,
                  tmax=None, group: int = 4,
                  interpret=None) -> jnp.ndarray:
    """Sparse-layout forward using the fused rollout; returns logits [B].

    Matches models/tsp_sparse.forward_sparse (tests assert allclose)."""
    tmax = cfg.tmax if tmax is None else tmax
    assert not cfg.feed_wc_each_step, "fused path: feed_wc not supported"
    B = batch["labels"].shape[0]
    d = params["v_init"].shape[0]
    N = B * v_pad
    em = batch["edge_mask"]
    h_v0 = jnp.broadcast_to(params["v_init"][None, :], (N, d)).astype(
        batch["W"].dtype)
    wc = jnp.concatenate([batch["W"], batch["C"]], axis=-1)
    h_e0 = mlp.mlp_apply(params["e_init"], wc) * em
    packed = pack_params(params, cfg, dtype=h_e0.dtype)
    _, h_e = fused_rollout(
        batch["src2"], batch["tgt2"], batch["em2"], em,
        batch["vert_mask"], h_v0, h_e0, packed,
        tmax=tmax, v_pad=v_pad, m_pad=m_pad,
        num_problems=B, group=group, cell_activation=cfg.cell_activation,
        forget_bias=cfg.forget_bias, ln_eps=cfg.ln_eps, interpret=interpret)
    votes = mlp.mlp_apply(params["vote"], h_e) * em
    sums = votes.reshape(B, m_pad).sum(-1)
    cnt = jnp.maximum(em.reshape(B, m_pad).sum(-1), 1.0)
    return sums / cnt
