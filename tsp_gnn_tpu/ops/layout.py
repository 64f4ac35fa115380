"""Block-diagonal sparse graph layout for the TPU kernels.

The reference batches instances into ONE disconnected sparse graph via
block-diagonal incidence stacking [SURVEY §2.5, §3.4].  This module builds
that mega-graph in a TILED layout sized for the MXU [B:L5 "CSR/ELL tiles"]:

  * every problem occupies uniform v_pad vertex / m_pad edge slots (tile
    multiples), so an edge tile's problem and vertex window are static —
    the whole sparsity pattern lives in BlockSpec index maps (ops/spmm.py);
  * per edge: LOCAL endpoint ids (src < tgt) and a validity mask;
  * per vertex: a validity mask for the segmented readout.

This layout is what gets edge-partitioned across the `graph` mesh axis
(tsp_gnn_tpu/parallel): chips own contiguous edge-tile ranges; the halo is
the window of vertex tiles their edges touch.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List

import numpy as np

from tsp_gnn_tpu.models.tsp import edge_list

TILE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pad_uniform_edges(g: "UniformBlockGraph",
                      m_new: int) -> "UniformBlockGraph":
    """Extend every problem's padded edge slots to m_new (masked zeros) —
    used to make m_pad divisible by the graph-axis partition count."""
    assert m_new >= g.m_pad and m_new % TILE == 0
    B, extra = g.num_problems, m_new - g.m_pad
    if extra == 0:
        return g
    def grow(a, fill=0):
        a2 = np.asarray(a).reshape(B, g.m_pad)
        pad = np.full((B, extra), fill, a2.dtype)
        return np.concatenate([a2, pad], axis=1).reshape(-1)
    return UniformBlockGraph(
        src=grow(g.src), tgt=grow(g.tgt), edge_mask=grow(g.edge_mask),
        vert_mask=g.vert_mask, W=grow(g.W), C=grow(g.C), labels=g.labels,
        n_vertices=g.n_vertices, n_edges=g.n_edges, v_pad=g.v_pad,
        m_pad=m_new)


@dataclass
class UniformBlockGraph:
    """Block-diagonal mega-graph with UNIFORM per-problem padding.

    Every problem occupies exactly `v_pad` vertex slots and `m_pad` edge
    slots (both tile multiples), so tile geometry is fully static: edge tile
    t belongs to problem t // etiles_per_problem and touches exactly the
    vertex-tile window of that problem.  This is the layout the Pallas SpMM /
    SDDMM / fused-step kernels consume (ops/spmm.py) and the unit the
    edge-partitioner splits across the `graph` mesh axis.
    """
    src: np.ndarray        # [M] int32, LOCAL vertex id within the problem
    tgt: np.ndarray        # [M] int32, local
    edge_mask: np.ndarray  # [M] f32
    vert_mask: np.ndarray  # [N] f32
    W: np.ndarray          # [M] f32
    C: np.ndarray          # [M] f32
    labels: np.ndarray     # [B]
    n_vertices: np.ndarray
    n_edges: np.ndarray
    v_pad: int             # padded vertices per problem (tile multiple)
    m_pad: int             # padded edges per problem (tile multiple)

    @property
    def num_problems(self) -> int:
        return self.labels.shape[0]


EDGE_ALIGN = 1024  # 8 sublane rows of 128 lanes — Mosaic's min index block


def build_uniform_block_graph(instances: List[Dict], deviation: float,
                              pad_n: int, tile: int = TILE,
                              edge_align: int = EDGE_ALIGN
                              ) -> UniformBlockGraph:
    """Dual-labeled uniform mega-graph; src/tgt are LOCAL ids (global id =
    problem * v_pad + local).  Edge slots are aligned to `edge_align` (1024 =
    the smallest legal Mosaic index block of 8x128) so the Pallas kernels can
    block the lane-major index arrays."""
    v_pad = _round_up(pad_n, tile)
    m_max = pad_n * (pad_n - 1) // 2
    m_pad = _round_up(m_max, edge_align)

    probs = []
    for inst in instances:
        n = int(inst["n"])
        assert n <= pad_n
        cost_norm = float(inst["opt_cost"]) / n
        for sign, label in ((1.0, 1.0), (-1.0, 0.0)):
            probs.append((n, np.asarray(inst["W"], np.float32),
                          (1.0 + sign * deviation) * cost_norm, label))
    B = len(probs)
    M, N = B * m_pad, B * v_pad

    src = np.zeros(M, np.int32)
    tgt = np.zeros(M, np.int32)
    edge_mask = np.zeros(M, np.float32)
    vert_mask = np.zeros(N, np.float32)
    W = np.zeros(M, np.float32)
    C = np.zeros(M, np.float32)
    labels = np.zeros(B, np.float32)
    n_vertices = np.zeros(B, np.int32)
    n_edges = np.zeros(B, np.int32)
    for i, (n, w, c, label) in enumerate(probs):
        m = n * (n - 1) // 2
        e = edge_list(n)
        eo, vo = i * m_pad, i * v_pad
        src[eo:eo + m] = e[:, 0]
        tgt[eo:eo + m] = e[:, 1]
        edge_mask[eo:eo + m] = 1.0
        vert_mask[vo:vo + n] = 1.0
        W[eo:eo + m] = w
        C[eo:eo + m] = c
        labels[i] = label
        n_vertices[i] = n
        n_edges[i] = m
    return UniformBlockGraph(src=src, tgt=tgt, edge_mask=edge_mask,
                             vert_mask=vert_mask, W=W, C=C, labels=labels,
                             n_vertices=n_vertices, n_edges=n_edges,
                             v_pad=v_pad, m_pad=m_pad)
