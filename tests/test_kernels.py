"""Pallas kernel tests (SURVEY §4.2): each kernel vs its jnp reference on the
uniform block-diagonal layout, interpret=True for CPU CI, including ragged
tails (n < pad_n), padded rows and the lane-major index layout."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tsp_gnn_tpu.data import generator
from tsp_gnn_tpu.ops import layout, spmm


def _graph(ns, pad_n=20, dev=0.02, seed=0):
    rng = np.random.default_rng(seed)
    insts = [generator.generate_instance(rng, n) for n in ns]
    return layout.build_uniform_block_graph(insts, dev, pad_n)


@pytest.fixture(scope="module")
def g():
    return _graph([12, 20, 17])


def _lanes(g):
    lane = lambda a, dt: jnp.asarray(np.asarray(a).reshape(-1, 128), dt)
    return (lane(g.src, jnp.int32), lane(g.tgt, jnp.int32),
            lane(g.edge_mask, jnp.float32))


def test_uniform_layout_invariants(g):
    B = g.num_problems
    assert B == 6
    assert g.v_pad % 128 == 0 and g.m_pad % 128 == 0
    assert g.src.shape[0] == B * g.m_pad
    # real edges have src < tgt < n
    for p in range(B):
        n = g.n_vertices[p]
        m = g.n_edges[p]
        s = g.src[p * g.m_pad: p * g.m_pad + m]
        t = g.tgt[p * g.m_pad: p * g.m_pad + m]
        assert (s < t).all() and (t < n).all()
        assert g.edge_mask[p * g.m_pad: p * g.m_pad + m].all()
        assert not g.edge_mask[p * g.m_pad + m: (p + 1) * g.m_pad].any()


def test_pad_uniform_edges(g):
    g2 = layout.pad_uniform_edges(g, g.m_pad + 256)
    assert g2.m_pad == g.m_pad + 256
    np.testing.assert_array_equal(
        g2.edge_mask.reshape(g.num_problems, -1)[:, :g.m_pad],
        g.edge_mask.reshape(g.num_problems, -1))
    assert g2.edge_mask.reshape(g.num_problems, -1)[:, g.m_pad:].sum() == 0


@pytest.mark.parametrize("d", [64, 128])
@pytest.mark.parametrize("tile_e", [128, 512])
def test_e_from_v_matches_ref(g, d, tile_e):
    B = g.num_problems
    x_v = jax.random.normal(jax.random.PRNGKey(0), (B * g.v_pad, d))
    src2, tgt2, em2 = _lanes(g)
    kw = dict(v_pad=g.v_pad, m_pad=g.m_pad)
    got = spmm.e_from_v(src2, tgt2, em2, x_v, tile_e=tile_e,
                        interpret=True, **kw)
    want = spmm.e_from_v_ref(src2, tgt2, em2, x_v, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("tile_e", [128, 512])
def test_v_from_e_matches_ref(g, tile_e):
    B = g.num_problems
    d = 64
    x_e = jax.random.normal(jax.random.PRNGKey(1), (B * g.m_pad, d))
    src2, tgt2, em2 = _lanes(g)
    kw = dict(v_pad=g.v_pad, m_pad=g.m_pad, num_problems=B)
    got = spmm.v_from_e(src2, tgt2, em2, x_e, tile_e=tile_e,
                        interpret=True, **kw)
    want = spmm.v_from_e_ref(src2, tgt2, em2, x_e, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_sddmm_matches_ref(g):
    B = g.num_problems
    x_v = jax.random.normal(jax.random.PRNGKey(2), (B * g.v_pad, 64))
    src2, tgt2, em2 = _lanes(g)
    kw = dict(v_pad=g.v_pad, m_pad=g.m_pad)
    got = spmm.sddmm(src2, tgt2, em2, x_v, interpret=True, **kw)
    want = spmm.sddmm_ref(src2, tgt2, em2, x_v, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_segment_sum_matches_ref():
    g = _graph([12, 20, 17, 9])  # B=8: exercises the Pallas path (B%8==0)
    B = g.num_problems
    votes = jax.random.normal(jax.random.PRNGKey(3),
                              (B * g.m_pad // 128, 128))
    _, _, em2 = _lanes(g)
    got = spmm.segment_sum_per_problem(votes, em2, m_pad=g.m_pad,
                                       num_problems=B, interpret=True)
    want = spmm.segment_sum_ref(votes, em2, m_pad=g.m_pad, num_problems=B)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got[:, 1]).astype(int),
                                  g.n_edges)


def test_incidence_degree_property(g):
    """v_from_e of all-ones edge features = vertex degrees (n-1 per real
    vertex of each problem)."""
    B = g.num_problems
    x_e = jnp.ones((B * g.m_pad, 8), jnp.float32)
    src2, tgt2, em2 = _lanes(g)
    deg = spmm.v_from_e(src2, tgt2, em2, x_e, v_pad=g.v_pad, m_pad=g.m_pad,
                        num_problems=B, interpret=True)
    deg = np.asarray(deg[:, 0]).reshape(B, g.v_pad)
    for p in range(B):
        n = g.n_vertices[p]
        np.testing.assert_allclose(deg[p, :n], n - 1)
        np.testing.assert_allclose(deg[p, n:], 0)


@pytest.mark.parametrize("group", [1, 2, 3, 8])
def test_e_from_v_grouped_matches_ref(g, group):
    """Grouped-problem gather kernel == reference for divisor and
    non-divisor group sizes (non-divisors clamp down; 8 > B clamps to a
    divisor of B=6 -> 2)."""
    B = g.num_problems
    d = 64
    x_v = jax.random.normal(jax.random.PRNGKey(0), (B * g.v_pad, d))
    src2, tgt2, em2 = _lanes(g)
    kw = dict(v_pad=g.v_pad, m_pad=g.m_pad, num_problems=B)
    got = spmm.e_from_v_grouped(src2, tgt2, em2, x_v, group=group,
                                interpret=True, **kw)
    want = spmm.e_from_v_ref(src2, tgt2, em2, x_v, v_pad=g.v_pad,
                             m_pad=g.m_pad)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("group", [1, 2, 3, 8])
def test_v_from_e_grouped_matches_ref(g, group):
    B = g.num_problems
    d = 64
    x_e = jax.random.normal(jax.random.PRNGKey(1), (B * g.m_pad, d))
    src2, tgt2, em2 = _lanes(g)
    kw = dict(v_pad=g.v_pad, m_pad=g.m_pad, num_problems=B)
    got = spmm.v_from_e_grouped(src2, tgt2, em2, x_e, group=group,
                                interpret=True, **kw)
    want = spmm.v_from_e_ref(src2, tgt2, em2, x_e, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_grouped_bf16(g):
    """bf16 inputs round-trip through the grouped kernels (f32 accumulate)."""
    B = g.num_problems
    d = 64
    x_v = jax.random.normal(jax.random.PRNGKey(2),
                            (B * g.v_pad, d)).astype(jnp.bfloat16)
    src2, tgt2, em2 = _lanes(g)
    kw = dict(v_pad=g.v_pad, m_pad=g.m_pad, num_problems=B)
    got = spmm.e_from_v_grouped(src2, tgt2, em2, x_v, group=2,
                                interpret=True, **kw)
    want = spmm.e_from_v_ref(src2, tgt2, em2, x_v.astype(jnp.float32),
                             v_pad=g.v_pad, m_pad=g.m_pad)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("group", [2, 3])
def test_sddmm_grouped_matches_ref(g, group):
    B = g.num_problems
    d = 64
    x_v = jax.random.normal(jax.random.PRNGKey(3), (B * g.v_pad, d))
    src2, tgt2, em2 = _lanes(g)
    got = spmm.sddmm_grouped(src2, tgt2, em2, x_v, v_pad=g.v_pad,
                             m_pad=g.m_pad, num_problems=B, group=group,
                             interpret=True)
    want = spmm.sddmm_ref(src2, tgt2, em2, x_v, v_pad=g.v_pad,
                          m_pad=g.m_pad)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
