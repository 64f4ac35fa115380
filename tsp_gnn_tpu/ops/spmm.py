"""Pallas TPU kernels: incidence SpMM (both directions), SDDMM, segment sum.

These are the sparse-aggregation kernels mandated by BASELINE.json ("sparse
gather/scatter SpMM/SDDMM ... CSR/ELL tiles for MXU"), designed TPU-first
rather than ported: instead of scalar gather/scatter (VPU-bound, slow on
TPU), each 128-edge row materialises its slice of the incidence matrix as an
on-the-fly TRANSPOSED one-hot tile and rides the MXU:

    oh_t[v, e] = [src[e] == v] + [tgt[e] == v]          (built on the VPU)
    e_from_v:  out[e_tile] = oh_t^T @ x_window           (dot_general)
    v_from_e:  out[v_window] += oh_t @ x[e_tile]         (accumulated)
    sddmm:     out[e] = <x[src[e]], x[tgt[e]]>

Layout notes (the performance-critical part):
  * endpoint indices and edge masks are stored LANE-MAJOR as [M//128, 128]
    int32/f32 — a [M, 1] column layout costs 128x the bandwidth because
    Mosaic pads the lane dimension to 128;
  * the transposed one-hot is built by comparing a sublane iota [v_pad, 128]
    against an index row broadcast across sublanes — no relayout anywhere;
  * the uniform block-diagonal layout (ops/layout.py UniformBlockGraph) makes
    tile geometry static: edge tile t belongs to problem t*TILE_E//m_pad and
    only touches that problem's v_pad vertex rows, so BlockSpec index maps
    express the whole sparsity pattern and v_from_e accumulates over
    consecutive output revisits in VMEM.

Reference parity: these replace tf.sparse_tensor_dense_matmul in the
reference's message-passing loop [SURVEY §2.3 step 3, §3.2 hot loop].
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128


def resolve_interpret(interpret) -> bool:
    """interpret=None -> auto: interpreter mode on CPU backends (tests,
    forced-CPU runs), compiled Mosaic on TPU."""
    if interpret is None:
        return jax.default_backend() == "cpu"
    return interpret


def _pick_tile_e(m_pad: int, tile_e: int, interpret: bool) -> int:
    while m_pad % tile_e:
        tile_e //= 2
    assert tile_e >= TILE, f"m_pad={m_pad} must be a multiple of {TILE}"
    if not interpret and tile_e < 8 * TILE:
        raise ValueError(
            f"m_pad={m_pad} must be a multiple of 1024 for compiled TPU "
            f"kernels (index blocks need 8 sublane rows; build the layout "
            f"with edge_align=1024)")
    return tile_e


def _oh_t(src_row, tgt_row, em_row, v_pad: int, dtype):
    """Transposed one-hot [v_pad, 128] for one 128-edge row."""
    vid = jax.lax.broadcasted_iota(jnp.int32, (v_pad, TILE), 0)
    oh = ((vid == src_row[None, :]).astype(dtype)
          + (vid == tgt_row[None, :]).astype(dtype))
    return oh * em_row[None, :].astype(dtype)


# ---------------------------------------------------------------- e_from_v

def _oh_t_tile(src_ref, tgt_ref, em_ref, v_pad: int, rows: int, dtype):
    """Transposed one-hot [v_pad, rows*128] for a whole edge tile.

    Per-row one-hots are concatenated along the LANE axis (legal in Mosaic,
    unlike a sublane->lane reshape), so the kernels issue ONE MXU dot per
    tile instead of `rows` small ones — a single [v_pad, tile_e] x
    [tile_e, d] (or transposed) contraction keeps the systolic array busy
    instead of draining it every 128 edges."""
    return jnp.concatenate(
        [_oh_t(src_ref[r, :], tgt_ref[r, :], em_ref[r, :], v_pad, dtype)
         for r in range(rows)], axis=1)


def _e_from_v_kernel(src_ref, tgt_ref, em_ref, xv_ref, out_ref, *,
                     v_pad, rows):
    x = xv_ref[:]
    oh = _oh_t_tile(src_ref, tgt_ref, em_ref, v_pad, rows, x.dtype)
    out = jax.lax.dot_general(oh, x, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    out_ref[:] = out.astype(out_ref.dtype)                # [tile_e, d]


def e_from_v(src2, tgt2, em2, x_v, *, v_pad: int, m_pad: int,
             tile_e: int = 1024, interpret=None):
    """out[e] = x_v[prob(e)*v_pad + src[e]] + x_v[prob(e)*v_pad + tgt[e]].

    src2/tgt2/em2: [M//128, 128] lane-major; x_v: [B*v_pad, d]; out: [M, d].
    """
    d = x_v.shape[-1]
    M = src2.shape[0] * TILE
    interpret = resolve_interpret(interpret)
    tile_e = _pick_tile_e(m_pad, tile_e, interpret)
    rows = tile_e // TILE
    grid = (M // tile_e,)
    prob = lambda i: (i * tile_e) // m_pad
    idx_spec = pl.BlockSpec((rows, TILE), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_e_from_v_kernel, v_pad=v_pad, rows=rows),
        grid=grid,
        in_specs=[idx_spec, idx_spec, idx_spec,
                  pl.BlockSpec((v_pad, d), lambda i: (prob(i), 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tile_e, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, d), x_v.dtype),
        interpret=interpret,
    )(src2, tgt2, em2, x_v)


# ---------------------------------------------------------------- v_from_e

def _v_from_e_kernel(src_ref, tgt_ref, em_ref, xe_ref, out_ref, *,
                     v_pad, rows, tiles_per_prob):
    i = pl.program_id(0)

    @pl.when(i % tiles_per_prob == 0)
    def _zero():
        out_ref[:] = jnp.zeros_like(out_ref)

    oh = _oh_t_tile(src_ref, tgt_ref, em_ref, v_pad, rows, xe_ref.dtype)
    acc = jax.lax.dot_general(
        oh, xe_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)               # [v_pad, d]
    out_ref[:] += acc.astype(out_ref.dtype)


def v_from_e(src2, tgt2, em2, x_e, *, v_pad: int, m_pad: int,
             num_problems: int, tile_e: int = 1024, interpret=None):
    """out[v] = sum of x_e over edges incident to v (block-diagonal scatter).

    x_e: [M, d]; out: [B*v_pad, d].  Output blocks are revisited consecutively
    by the edge tiles of each problem and accumulated in VMEM.
    """
    d = x_e.shape[-1]
    M = src2.shape[0] * TILE
    interpret = resolve_interpret(interpret)
    tile_e = _pick_tile_e(m_pad, tile_e, interpret)
    rows = tile_e // TILE
    tiles_per_prob = m_pad // tile_e
    grid = (M // tile_e,)
    prob = lambda i: (i * tile_e) // m_pad
    idx_spec = pl.BlockSpec((rows, TILE), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_v_from_e_kernel, v_pad=v_pad, rows=rows,
                          tiles_per_prob=tiles_per_prob),
        grid=grid,
        in_specs=[idx_spec, idx_spec, idx_spec,
                  pl.BlockSpec((tile_e, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((v_pad, d), lambda i: (prob(i), 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((num_problems * v_pad, d), x_e.dtype),
        interpret=interpret,
    )(src2, tgt2, em2, x_e)


# ----------------------------------------------- grouped-problem variants
#
# The single-problem kernels above pay one grid step per (problem, edge
# tile): at flagship shapes that is 256 tiny steps whose pipeline bubbles
# dominate (528 us measured vs ~150 us of ideal traffic+MXU, PERF.md
# round-4 SOL table).  The grouped variants put `group` WHOLE problems in
# one grid step — per-problem dots keep the MXU flops identical (a fused
# block-diagonal one-hot would multiply MACs by `group`), but grid steps
# shrink by `group` and every DMA stream grows by `group`.  v_from_e also
# loses its output-revisit accumulation: each problem's vertex window is
# written exactly once, no read-modify-write across grid steps.


def _oh_t_prob(src_ref, tgt_ref, em_ref, p, rpp, v_pad, dtype):
    """Transposed one-hot [v_pad, m_pad] of problem p (rows p*rpp..)."""
    return jnp.concatenate(
        [_oh_t(src_ref[p * rpp + r, :], tgt_ref[p * rpp + r, :],
               em_ref[p * rpp + r, :], v_pad, dtype)
         for r in range(rpp)], axis=1)


def _e_from_v_g_kernel(src_ref, tgt_ref, em_ref, xv_ref, out_ref, *,
                       v_pad, m_pad, rpp, group):
    x = xv_ref[:]
    for p in range(group):
        oh = _oh_t_prob(src_ref, tgt_ref, em_ref, p, rpp, v_pad, x.dtype)
        out = jax.lax.dot_general(
            oh, x[p * v_pad:(p + 1) * v_pad, :], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # [m_pad, d]
        out_ref[p * m_pad:(p + 1) * m_pad, :] = out.astype(out_ref.dtype)


def e_from_v_grouped(src2, tgt2, em2, x_v, *, v_pad: int, m_pad: int,
                     num_problems: int, group: int = 8, interpret=None):
    """Grouped e_from_v: grid step = `group` whole problems.

    Same contract as e_from_v; requires m_pad % 128 == 0.  `group` is
    clamped to a divisor of num_problems."""
    d = x_v.shape[-1]
    interpret = resolve_interpret(interpret)
    assert m_pad % TILE == 0, m_pad
    while num_problems % group:
        group //= 2
    rpp = m_pad // TILE
    grid = (num_problems // group,)
    idx_spec = pl.BlockSpec((group * rpp, TILE), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_e_from_v_g_kernel, v_pad=v_pad, m_pad=m_pad,
                          rpp=rpp, group=group),
        grid=grid,
        in_specs=[idx_spec, idx_spec, idx_spec,
                  pl.BlockSpec((group * v_pad, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((group * m_pad, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((num_problems * m_pad, d), x_v.dtype),
        interpret=interpret,
    )(src2, tgt2, em2, x_v)


def _v_from_e_g_kernel(src_ref, tgt_ref, em_ref, xe_ref, out_ref, *,
                       v_pad, m_pad, rpp, group):
    x = xe_ref[:]
    for p in range(group):
        oh = _oh_t_prob(src_ref, tgt_ref, em_ref, p, rpp, v_pad, x.dtype)
        acc = jax.lax.dot_general(
            oh, x[p * m_pad:(p + 1) * m_pad, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # [v_pad, d]
        out_ref[p * v_pad:(p + 1) * v_pad, :] = acc.astype(out_ref.dtype)


def v_from_e_grouped(src2, tgt2, em2, x_e, *, v_pad: int, m_pad: int,
                     num_problems: int, group: int = 8, interpret=None):
    """Grouped v_from_e: one write per vertex window, no revisits."""
    d = x_e.shape[-1]
    interpret = resolve_interpret(interpret)
    assert m_pad % TILE == 0, m_pad
    while num_problems % group:
        group //= 2
    rpp = m_pad // TILE
    grid = (num_problems // group,)
    idx_spec = pl.BlockSpec((group * rpp, TILE), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_v_from_e_g_kernel, v_pad=v_pad, m_pad=m_pad,
                          rpp=rpp, group=group),
        grid=grid,
        in_specs=[idx_spec, idx_spec, idx_spec,
                  pl.BlockSpec((group * m_pad, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((group * v_pad, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((num_problems * v_pad, d), x_e.dtype),
        interpret=interpret,
    )(src2, tgt2, em2, x_e)


def _sddmm_g_kernel(src_ref, tgt_ref, em_ref, xv_ref, out_ref, *,
                    v_pad, rpp, group):
    x = xv_ref[:]
    dn = (((0,), (0,)), ((), ()))
    vid = jax.lax.broadcasted_iota(jnp.int32, (v_pad, TILE), 0)
    for p in range(group):
        x_p = x[p * v_pad:(p + 1) * v_pad, :]
        oh_s = jnp.concatenate(
            [(vid == src_ref[p * rpp + r, :][None, :]).astype(x.dtype)
             for r in range(rpp)], axis=1)                # [v_pad, m_pad]
        oh_t = jnp.concatenate(
            [(vid == tgt_ref[p * rpp + r, :][None, :]).astype(x.dtype)
             for r in range(rpp)], axis=1)
        a = jax.lax.dot_general(oh_s, x_p, dn,
                                preferred_element_type=jnp.float32)
        b = jax.lax.dot_general(oh_t, x_p, dn,
                                preferred_element_type=jnp.float32)
        prod = a * b                                      # [m_pad, d]
        for r in range(rpp):
            dot = jnp.sum(prod[r * TILE:(r + 1) * TILE, :], axis=-1)
            out_ref[p * rpp + r, :] = dot.astype(out_ref.dtype) * em_ref[
                p * rpp + r, :].astype(out_ref.dtype)


def sddmm_grouped(src2, tgt2, em2, x_v, *, v_pad: int, m_pad: int,
                  num_problems: int, group: int = 8, interpret=None):
    """Grouped SDDMM: `group` whole problems per grid step."""
    interpret = resolve_interpret(interpret)
    assert m_pad % TILE == 0, m_pad
    while num_problems % group:
        group //= 2
    rpp = m_pad // TILE
    grid = (num_problems // group,)
    idx_spec = pl.BlockSpec((group * rpp, TILE), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_sddmm_g_kernel, v_pad=v_pad, rpp=rpp,
                          group=group),
        grid=grid,
        in_specs=[idx_spec, idx_spec, idx_spec,
                  pl.BlockSpec((group * v_pad, x_v.shape[-1]),
                               lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=idx_spec,
        out_shape=jax.ShapeDtypeStruct((num_problems * rpp, TILE),
                                       x_v.dtype),
        interpret=interpret,
    )(src2, tgt2, em2, x_v)


# ------------------------------------------------------------------- sddmm

def _sddmm_kernel(src_ref, tgt_ref, em_ref, xv_ref, out_ref, *,
                  v_pad, rows):
    x = xv_ref[:]
    dn = (((0,), (0,)), ((), ()))
    vid = jax.lax.broadcasted_iota(jnp.int32, (v_pad, TILE), 0)
    # ONE MXU dot per endpoint for the whole tile (lane-concat one-hots);
    # the per-edge <a, b> reduce + write stays per 128-edge row — a
    # [tile_e] -> [rows, 128] reshape is an illegal sublane relayout
    oh_s = jnp.concatenate(
        [(vid == src_ref[r, :][None, :]).astype(x.dtype)
         for r in range(rows)], axis=1)                   # [v_pad, tile_e]
    oh_t = jnp.concatenate(
        [(vid == tgt_ref[r, :][None, :]).astype(x.dtype)
         for r in range(rows)], axis=1)
    a = jax.lax.dot_general(oh_s, x, dn,
                            preferred_element_type=jnp.float32)
    b = jax.lax.dot_general(oh_t, x, dn,
                            preferred_element_type=jnp.float32)
    prod = a * b                                          # [tile_e, d]
    for r in range(rows):
        dot = jnp.sum(prod[r * TILE:(r + 1) * TILE, :], axis=-1)
        out_ref[r, :] = dot.astype(out_ref.dtype) * em_ref[r, :].astype(
            out_ref.dtype)


def sddmm(src2, tgt2, em2, x_v, *, v_pad: int, m_pad: int,
          tile_e: int = 1024, interpret=None):
    """out2[e] = <x_v[src[e]], x_v[tgt[e]]>, lane-major [M//128, 128]."""
    M = src2.shape[0] * TILE
    interpret = resolve_interpret(interpret)
    tile_e = _pick_tile_e(m_pad, tile_e, interpret)
    rows = tile_e // TILE
    grid = (M // tile_e,)
    prob = lambda i: (i * tile_e) // m_pad
    idx_spec = pl.BlockSpec((rows, TILE), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_sddmm_kernel, v_pad=v_pad, rows=rows),
        grid=grid,
        in_specs=[idx_spec, idx_spec, idx_spec,
                  pl.BlockSpec((v_pad, x_v.shape[-1]),
                               lambda i: (prob(i), 0),
                               memory_space=pltpu.VMEM)],
        out_specs=idx_spec,
        out_shape=jax.ShapeDtypeStruct((M // TILE, TILE), x_v.dtype),
        interpret=interpret,
    )(src2, tgt2, em2, x_v)


# ------------------------------------------------------------- segment sum

def _segsum_kernel(x_ref, em_ref, out_ref, *, rows_per_prob, probs):
    x = x_ref[:] * em_ref[:]
    xs = x.reshape(probs, rows_per_prob * TILE)
    ms = em_ref[:].reshape(probs, rows_per_prob * TILE)
    out_ref[:] = jnp.stack([jnp.sum(xs, axis=1), jnp.sum(ms, axis=1)],
                           axis=-1)


_SEG_GROUP = 8  # problems per grid step (sublane-aligned output block)


def segment_sum_per_problem(x2, em2, *, m_pad: int, num_problems: int,
                            interpret=None):
    """Per-problem (sum, count) of a lane-major per-edge scalar [M//128, 128]
    -> [B, 2] (the readout segment-reduce).  Falls back to the jnp reference
    when B is not a multiple of the sublane group."""
    interpret = resolve_interpret(interpret)
    if num_problems % _SEG_GROUP:
        return segment_sum_ref(x2, em2, m_pad=m_pad,
                               num_problems=num_problems)
    rows_per_prob = m_pad // TILE
    grid = (num_problems // _SEG_GROUP,)
    blk = pl.BlockSpec((_SEG_GROUP * rows_per_prob, TILE),
                       lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_segsum_kernel, rows_per_prob=rows_per_prob,
                          probs=_SEG_GROUP),
        grid=grid,
        in_specs=[blk, blk],
        out_specs=pl.BlockSpec((_SEG_GROUP, 2), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((num_problems, 2), x2.dtype),
        interpret=interpret,
    )(x2, em2)


# -------------------------------------------------- jnp reference versions
# (also the CPU fallbacks; lane-major index layout shared with the kernels)

def _flat(a2):
    return a2.reshape(-1)


def e_from_v_ref(src2, tgt2, em2, x_v, *, v_pad, m_pad):
    src, tgt, em = _flat(src2), _flat(tgt2), _flat(em2)
    M = src.shape[0]
    prob = jnp.arange(M) // m_pad
    gs = x_v[prob * v_pad + src]
    gt = x_v[prob * v_pad + tgt]
    return (gs + gt) * em[:, None]


def v_from_e_ref(src2, tgt2, em2, x_e, *, v_pad, m_pad, num_problems):
    src, tgt, em = _flat(src2), _flat(tgt2), _flat(em2)
    M = src.shape[0]
    prob = jnp.arange(M) // m_pad
    out = jnp.zeros((num_problems * v_pad, x_e.shape[-1]), x_e.dtype)
    xm = x_e * em[:, None]
    out = out.at[prob * v_pad + src].add(xm)
    out = out.at[prob * v_pad + tgt].add(xm)
    return out


def sddmm_ref(src2, tgt2, em2, x_v, *, v_pad, m_pad):
    src, tgt, em = _flat(src2), _flat(tgt2), _flat(em2)
    M = src.shape[0]
    prob = jnp.arange(M) // m_pad
    gs = x_v[prob * v_pad + src]
    gt = x_v[prob * v_pad + tgt]
    out = jnp.sum(gs * gt, axis=-1) * em
    return out.reshape(src2.shape)


def segment_sum_ref(x2, em2, *, m_pad, num_problems):
    xs = (_flat(x2) * _flat(em2)).reshape(num_problems, m_pad)
    ms = _flat(em2).reshape(num_problems, m_pad)
    return jnp.stack([xs.sum(-1), ms.sum(-1)], axis=-1)
