"""Data-path tests (SURVEY §4.4): solver optimality, generator determinism,
file round-trip, dual-label balance, block/batch invariants."""
import itertools
import os

import numpy as np
import pytest

from tsp_gnn_tpu.data import fileio, generator, solver
from tsp_gnn_tpu.data.loader import InstanceLoader, make_dense_batch, num_edges
from tsp_gnn_tpu.models.tsp import edge_list, incidence


def brute_force(dist):
    n = dist.shape[0]
    best = np.inf
    for perm in itertools.permutations(range(1, n)):
        tour = np.asarray((0,) + perm)
        best = min(best, solver.tour_cost(dist, tour))
    return best


def test_held_karp_optimal(rng):
    for _ in range(5):
        coords = rng.random((7, 2))
        dist = generator.pairwise_dist(coords)
        tour, cost = solver.held_karp(dist)
        assert sorted(tour) == list(range(7))
        np.testing.assert_allclose(cost, solver.tour_cost(dist, tour), rtol=1e-9)
        np.testing.assert_allclose(cost, brute_force(dist), rtol=1e-9)


def test_two_opt_near_optimal(rng):
    gaps = []
    for _ in range(5):
        coords = rng.random((11, 2))
        dist = generator.pairwise_dist(coords)
        _, opt = solver.held_karp(dist)
        tour, cost = solver.local_search(dist, restarts=4, rng=rng)
        assert sorted(tour) == list(range(11))
        gaps.append(cost / opt - 1.0)
    assert np.mean(gaps) < 0.01, f"2-opt mean gap too large: {gaps}"


def test_generator_deterministic():
    a = generator.generate_instances(seed=3, count=3, n_min=8, n_max=12)
    b = generator.generate_instances(seed=3, count=3, n_min=8, n_max=12)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x["W"], y["W"])
        np.testing.assert_allclose(x["opt_cost"], y["opt_cost"])
    assert all(8 <= i["n"] <= 12 for i in a)
    # weights live in [0, sqrt(2)]
    assert all(0 <= i["W"].min() and i["W"].max() <= np.sqrt(2) for i in a)


def test_shard_roundtrip(tmp_path):
    insts = generator.generate_instances(seed=1, count=4, n_min=8, n_max=10)
    p = str(tmp_path / "shard.npz")
    generator.save_shard(p, insts)
    back = generator.load_shard(p)
    assert len(back) == 4
    for x, y in zip(insts, back):
        np.testing.assert_array_equal(x["W"], y["W"])
        assert x["n"] == y["n"]


def test_create_dataset_resume(tmp_path):
    """--resume fills missing shards with the content an uninterrupted run
    would have written (per-shard seeds are deterministic in shard index)."""
    from tsp_gnn_tpu.dataset import create_dataset
    path = str(tmp_path / "d")
    create_dataset(path, samples=24, n_min=8, n_max=10, shard_size=8)
    ref = generator.load_shard(os.path.join(path, "shard_00001.npz"))
    os.unlink(os.path.join(path, "shard_00001.npz"))
    # top up to 32 samples: must regenerate only shard 1 and add shard 3
    create_dataset(path, samples=32, n_min=8, n_max=10, shard_size=8,
                   resume=True)
    names = sorted(os.listdir(path))
    assert names == [f"shard_0000{i}.npz" for i in range(4)]
    back = generator.load_shard(os.path.join(path, "shard_00001.npz"))
    for x, y in zip(ref, back):
        np.testing.assert_array_equal(x["W"], y["W"])


def test_create_dataset_resume_short_final_shard(tmp_path):
    """Topping up a run whose previous total was NOT a multiple of
    shard_size must regenerate the short final shard, not keep it
    [ADVICE r2]."""
    from tsp_gnn_tpu.dataset import create_dataset
    path = str(tmp_path / "d")
    # 20 samples @ shard_size 8 -> shards of 8, 8, 4 (short final)
    create_dataset(path, samples=20, n_min=8, n_max=10, shard_size=8)
    assert len(generator.load_shard(os.path.join(path, "shard_00002.npz"))) == 4
    create_dataset(path, samples=32, n_min=8, n_max=10, shard_size=8,
                   resume=True)
    for i in range(4):
        sh = generator.load_shard(os.path.join(path, f"shard_0000{i}.npz"))
        assert len(sh) == 8, f"shard {i} has {len(sh)} samples"


def test_graph_file_roundtrip(tmp_path):
    inst = generator.generate_instance(np.random.default_rng(0), 9)
    p = str(tmp_path / "i.graph")
    fileio.write_graph(p, inst)
    back = fileio.read_graph(p)
    assert back["n"] == 9
    np.testing.assert_allclose(back["W"], inst["W"], rtol=1e-6)
    np.testing.assert_allclose(back["opt_cost"], inst["opt_cost"], rtol=1e-6)
    np.testing.assert_array_equal(back["tour"], inst["tour"])


def test_dense_batch_invariants():
    insts = generator.generate_instances(seed=2, count=3, n_min=8, n_max=12)
    dev = 0.02
    batch = make_dense_batch(insts, dev, pad_n=12)
    B, m = batch["W"].shape
    assert B == 6 and m == num_edges(12)
    # dual labels: alternating YES/NO, balanced
    np.testing.assert_array_equal(batch["labels"], [1, 0] * 3)
    # YES target cost > NO target cost, both = (1 +/- dev) * C*/n on real edges
    for i, inst in enumerate(insts):
        n = inst["n"]
        em = batch["edge_mask"][2 * i] > 0
        cn = inst["opt_cost"] / n
        np.testing.assert_allclose(batch["C"][2 * i][em], (1 + dev) * cn, rtol=1e-5)
        np.testing.assert_allclose(batch["C"][2 * i + 1][em], (1 - dev) * cn, rtol=1e-5)
        assert em.sum() == num_edges(n)
        assert batch["vertex_mask"][2 * i].sum() == n
    # padded lanes carry zeros
    assert (batch["W"] * (1 - batch["edge_mask"])).sum() == 0


def test_incidence_row_sums():
    for n in (5, 12, 20):
        ev = incidence(n)
        np.testing.assert_array_equal(ev.sum(1), 2 * np.ones(num_edges(n)))
        e = edge_list(n)
        # each vertex appears in n-1 edges
        np.testing.assert_array_equal(ev.sum(0), (n - 1) * np.ones(n))
        assert (e[:, 0] < e[:, 1]).all()


def test_instance_loader_batches(tmp_path):
    insts = generator.generate_instances(seed=4, count=8, n_min=8, n_max=10)
    loader = InstanceLoader(insts, deviation=0.02, pad_n=10)
    batches = list(loader.get_batches(4))
    assert len(batches) == 2
    assert batches[0]["W"].shape == (8, num_edges(10))
    # directory loading
    generator.save_shard(str(tmp_path / "s0.npz"), insts[:4])
    generator.save_shard(str(tmp_path / "s1.npz"), insts[4:])
    loader2 = InstanceLoader(str(tmp_path), deviation=0.02)
    assert loader2.instances is None          # directories stream lazily
    assert sum(len(b) for b in loader2.get_instance_batches(4)) == 8
    assert loader2.pad_n == 10                # inferred by peeking a shard


def test_lazy_loader_streams_directory(tmp_path):
    """Directory sources stream shards lazily: nothing materialised, new
    shards written between passes are picked up (generation-in-flight)."""
    from tsp_gnn_tpu.data import generator
    from tsp_gnn_tpu.data.loader import InstanceLoader
    rng = np.random.default_rng(0)
    insts = [generator.generate_instance(rng, 8, "held_karp")
             for _ in range(12)]
    generator.save_shard(str(tmp_path / "shard_00000.npz"), insts[:6])
    generator.save_shard(str(tmp_path / "shard_00001.npz"), insts[6:])
    loader = InstanceLoader(str(tmp_path), pad_n=8, shuffle_seed=1)
    assert loader.instances is None          # lazy: not materialised
    got = list(loader.get_instance_batches(4))
    assert sum(len(b) for b in got) == 12
    assert all(len(b) == 4 for b in got)
    # a shard landing between passes is visible to the next pass
    more = [generator.generate_instance(rng, 8, "held_karp")
            for _ in range(4)]
    generator.save_shard(str(tmp_path / "shard_00002.npz"), more)
    got2 = list(loader.get_instance_batches(4))
    assert sum(len(b) for b in got2) == 16
    # unreadable shard (mid-write) is skipped, not fatal
    (tmp_path / "shard_00003.npz").write_bytes(b"not a zip")
    got3 = list(loader.get_instance_batches(4))
    assert sum(len(b) for b in got3) == 16


def test_lazy_loader_max_n_curriculum(tmp_path):
    from tsp_gnn_tpu.data import generator
    from tsp_gnn_tpu.data.loader import InstanceLoader
    rng = np.random.default_rng(0)
    insts = ([generator.generate_instance(rng, 6, "held_karp")
              for _ in range(6)]
             + [generator.generate_instance(rng, 10, "held_karp")
                for _ in range(6)])
    generator.save_shard(str(tmp_path / "shard_00000.npz"), insts)
    loader = InstanceLoader(str(tmp_path), pad_n=10)
    loader.max_n = 6
    got = list(loader.get_instance_batches(3))
    assert sum(len(b) for b in got) == 6
    assert all(int(i["n"]) <= 6 for b in got for i in b)
    # curriculum floor: a cap below every instance must not stall
    loader.max_n = 4
    got = list(loader.get_instance_batches(3))
    assert sum(len(b) for b in got) == 12
    assert loader.max_n == 4                 # restored after fallback


def test_parallel_instance_batches_deterministic():
    """Process-pool stream: deterministic per-batch seeds, bounded in-flight."""
    from tsp_gnn_tpu.data.pipeline import parallel_instance_batches
    import itertools
    a = list(itertools.islice(parallel_instance_batches(
        5, 3, 7, 9, "held_karp", workers=2, depth=2), 3))
    b = list(itertools.islice(parallel_instance_batches(
        5, 3, 7, 9, "held_karp", workers=2, depth=3), 3))
    assert len(a) == 3 and all(len(x) == 3 for x in a)
    for ba, bb in zip(a, b):
        for ia, ib in zip(ba, bb):
            assert ia["n"] == ib["n"]
            np.testing.assert_allclose(ia["W"], ib["W"])
            np.testing.assert_allclose(ia["opt_cost"], ib["opt_cost"])


def test_held_karp_bound_valid_and_tight():
    """1-tree subgradient bound: true lower bound, within ~2% of exact DP
    optimum at small n (the label-noise instrument for n>40)."""
    from tsp_gnn_tpu.data import solver
    rng = np.random.default_rng(11)
    for _ in range(4):
        n = int(rng.integers(8, 13))
        pts = rng.random((n, 2))
        d = np.sqrt(((pts[:, None] - pts[None]) ** 2).sum(-1))
        _, opt = solver.held_karp(d)
        lb = solver.held_karp_bound(d, iters=150)
        assert lb <= opt + 1e-9
        assert lb >= 0.97 * opt, f"bound too loose: {lb} vs {opt}"


def test_shard_count_v1_format(tmp_path):
    """--resume must recognise v1-format shards (per-instance zip members)
    so it skips rather than relabels them [code-review r3]."""
    from tsp_gnn_tpu.dataset import _shard_count
    insts = generator.generate_instances(seed=1, count=4, n_min=8, n_max=10)
    p = str(tmp_path / "v1.npz")
    arrs = {"count": np.int32(4)}
    for i, inst in enumerate(insts):
        for k in ("n", "coords", "W", "tour", "opt_cost"):
            arrs[f"{i}/{k}"] = np.asarray(inst[k])
    np.savez(p, **arrs)
    assert _shard_count(p) == 4
    p2 = str(tmp_path / "v2.npz")
    generator.save_shard(p2, insts)
    assert _shard_count(p2) == 4


def test_loader_pad_n_scans_all_shards(tmp_path, rng):
    """pad_n inference must scan EVERY shard's sizes, not peek the first —
    a directory whose later shards hold larger n used to assert mid-training
    in make_dense_batch [VERDICT r3 weak #3]."""
    small = [generator.generate_instance(rng, 8, "two_opt", 1)
             for _ in range(4)]
    big = [generator.generate_instance(rng, 12, "two_opt", 1)
           for _ in range(4)]
    # lexicographically first shard holds the SMALL instances
    generator.save_shard(str(tmp_path / "shard_00000.npz"), small)
    generator.save_shard(str(tmp_path / "shard_00001.npz"), big)
    loader = InstanceLoader(str(tmp_path), deviation=0.02)
    assert loader.pad_n == 12
    batches = list(loader.get_batches(4))
    assert batches
    for b in batches:
        assert b["W"].shape[1] == num_edges(12)


def test_shard_max_n_both_formats(tmp_path):
    """generator.shard_max_n reads only the size members of v1 AND v2
    shards (the loader's directory scan relies on it being cheap)."""
    insts = generator.generate_instances(seed=2, count=3, n_min=9, n_max=11)
    p2 = str(tmp_path / "v2.npz")
    generator.save_shard(p2, insts)
    expect = max(int(i["n"]) for i in insts)
    assert generator.shard_max_n(p2) == expect
    arrs = {"count": np.int32(3)}
    for i, inst in enumerate(insts):
        for k in ("n", "coords", "W", "tour", "opt_cost"):
            arrs[f"{i}/{k}"] = np.asarray(inst[k])
    p1 = str(tmp_path / "v1.npz")
    np.savez(p1, **arrs)
    assert generator.shard_max_n(p1) == expect
    # unreadable file -> 0, not an exception (generator mid-write)
    bad = str(tmp_path / "bad.npz")
    with open(bad, "wb") as f:
        f.write(b"not a zip")
    assert generator.shard_max_n(bad) == 0
