"""Property-based tests (hypothesis): solver, layout and cell invariants."""
import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from tsp_gnn_tpu.data import generator, solver
from tsp_gnn_tpu.data.loader import make_dense_batch, num_edges
from tsp_gnn_tpu.models.tsp import edge_list
from tsp_gnn_tpu.ops import layout


@settings(max_examples=20, deadline=None)
@given(n=st.integers(4, 11), seed=st.integers(0, 10_000))
def test_solver_returns_valid_tour(n, seed):
    rng = np.random.default_rng(seed)
    dist = generator.pairwise_dist(rng.random((n, 2)))
    tour, cost = solver.solve(dist, method="auto", rng=rng)
    assert sorted(tour) == list(range(n))
    np.testing.assert_allclose(cost, solver.tour_cost(dist, tour), rtol=1e-9)
    # triangle-inequality sanity: optimal tour >= 2 * max distance from hull
    assert cost > 0


@settings(max_examples=20, deadline=None)
@given(n=st.integers(2, 40))
def test_edge_list_bijection(n):
    e = edge_list(n)
    assert e.shape == (num_edges(n), 2)
    assert (e[:, 0] < e[:, 1]).all()
    # all pairs unique and covering
    assert len({(int(u), int(v)) for u, v in e}) == num_edges(n)


@settings(max_examples=10, deadline=None)
@given(ns=st.lists(st.integers(5, 14), min_size=1, max_size=4),
       dev=st.floats(0.01, 0.5), seed=st.integers(0, 1000))
def test_dense_batch_mask_consistency(ns, dev, seed):
    rng = np.random.default_rng(seed)
    insts = [generator.generate_instance(rng, n) for n in ns]
    pad = max(ns)
    b = make_dense_batch(insts, dev, pad)
    # masked-out entries carry no signal
    assert (b["W"] * (1 - b["edge_mask"])).sum() == 0
    assert (b["C"] * (1 - b["edge_mask"])).sum() == 0
    # per-problem real edge count matches n
    np.testing.assert_array_equal(
        b["edge_mask"].sum(-1).astype(int),
        [num_edges(int(n)) for n in b["n_vertices"]])
    # dual labels alternate
    np.testing.assert_array_equal(b["labels"][0::2], 1.0)
    np.testing.assert_array_equal(b["labels"][1::2], 0.0)


@settings(max_examples=10, deadline=None)
@given(ns=st.lists(st.integers(5, 14), min_size=1, max_size=3),
       seed=st.integers(0, 1000))
def test_uniform_layout_local_ids(ns, seed):
    rng = np.random.default_rng(seed)
    insts = [generator.generate_instance(rng, n) for n in ns]
    g = layout.build_uniform_block_graph(insts, 0.02, max(ns))
    B = g.num_problems
    src = g.src.reshape(B, g.m_pad)
    em = g.edge_mask.reshape(B, g.m_pad).astype(bool)
    for p in range(B):
        n = int(g.n_vertices[p])
        assert src[p][em[p]].max() < n
        # degree property through the mask
        tgt = g.tgt.reshape(B, g.m_pad)
        cnt = np.bincount(
            np.concatenate([src[p][em[p]], tgt[p][em[p]]]), minlength=n)
        np.testing.assert_array_equal(cnt, n - 1)


def test_layer_norm_shift_invariance():
    """LN output is invariant to adding a constant to the inputs (with unit
    gain / zero shift) — a defining property of the reference cell."""
    import jax.numpy as jnp
    from tsp_gnn_tpu.models.cells import layer_norm
    x = jnp.asarray(np.random.default_rng(0).standard_normal((5, 16)),
                    jnp.float32)
    g = jnp.ones(16)
    b = jnp.zeros(16)
    y1 = layer_norm(x, g, b)
    y2 = layer_norm(x + 3.7, g, b)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               rtol=1e-4, atol=1e-5)
