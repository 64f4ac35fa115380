"""Batch assembly + dual cost-threshold labeling.

Parity target: the reference's instance_loader.py [SURVEY §2.5, §3.4]: every
generated instance with optimal cost C* yields TWO training problems —
target (1+dev)*C* labeled YES and (1-dev)*C* labeled NO — so batches are
balanced by construction; the per-edge target-cost channel is the
per-vertex-normalised cost C/n.

TPU-native layout decision: instead of the reference's block-diagonal sparse
mega-graph, the default batch is DENSE-PADDED — all instances padded to a
static pad_n, the K_{pad_n} incidence shared batch-wide (one MXU matmul per
aggregation).  The block-diagonal sparse layout still exists for the
edge-partitioned multi-chip path (tsp_gnn_tpu/parallel) and the Pallas
ELL kernels (tsp_gnn_tpu/ops).
"""
from __future__ import annotations

from typing import Dict, Iterator, List, Optional

import numpy as np

from tsp_gnn_tpu.models.tsp import edge_list


def num_edges(n: int) -> int:
    return n * (n - 1) // 2


def _edge_mask(n: int, pad_n: int) -> np.ndarray:
    """Mask of K_n edges inside the canonical K_{pad_n} edge order."""
    e = edge_list(pad_n)
    return ((e[:, 0] < n) & (e[:, 1] < n)).astype(np.float32)


def _embed_weights(W_n: np.ndarray, n: int, pad_n: int) -> np.ndarray:
    """Scatter K_n canonical weights into K_{pad_n} canonical edge slots."""
    e = edge_list(pad_n)
    out = np.zeros(e.shape[0], np.float32)
    sel = (e[:, 0] < n) & (e[:, 1] < n)
    out[sel] = W_n
    return out


def make_dense_batch(instances: List[Dict], deviation: float,
                     pad_n: int) -> Dict[str, np.ndarray]:
    """2 problems per instance (YES at (1+dev), NO at (1-dev)).

    Returns arrays: W [B,m], C [B,m], edge_mask [B,m], vertex_mask [B,n],
    labels [B], n_vertices [B], n_edges [B]   with B = 2*len(instances),
    m = pad_n*(pad_n-1)/2.
    """
    m_pad = num_edges(pad_n)
    B = 2 * len(instances)
    W = np.zeros((B, m_pad), np.float32)
    C = np.zeros((B, m_pad), np.float32)
    emask = np.zeros((B, m_pad), np.float32)
    vmask = np.zeros((B, pad_n), np.float32)
    labels = np.zeros((B,), np.float32)
    n_v = np.zeros((B,), np.int32)
    n_e = np.zeros((B,), np.int32)
    for i, inst in enumerate(instances):
        n = int(inst["n"])
        assert n <= pad_n, f"instance n={n} exceeds pad_n={pad_n}"
        w = _embed_weights(np.asarray(inst["W"], np.float32), n, pad_n)
        em = _edge_mask(n, pad_n)
        cost_norm = float(inst["opt_cost"]) / n   # per-vertex normalisation [P]
        for k, (sign, label) in enumerate(((1.0, 1.0), (-1.0, 0.0))):
            b = 2 * i + k
            W[b] = w
            C[b] = (1.0 + sign * deviation) * cost_norm * em
            emask[b] = em
            vmask[b, :n] = 1.0
            labels[b] = label
            n_v[b] = n
            n_e[b] = num_edges(n)
    return {"W": W, "C": C, "edge_mask": emask, "vertex_mask": vmask,
            "labels": labels, "n_vertices": n_v, "n_edges": n_e}


class InstanceLoader:
    """Reference-parity loader API [SURVEY §1 L1]: wraps a list of instances
    (or a directory of shards / .graph files) and yields feed-ready batches.

    Directory sources STREAM lazily (VERDICT r1 "Next round" #7): shards are
    re-listed at the start of every pass (so a still-running generator's new
    shards are picked up), loaded one at a time, and mixed through a
    fixed-size shuffle buffer — the 2^20-instance paper training set never
    materialises in host RAM.  List sources keep the simple in-memory path.
    """

    SHUFFLE_BUFFER = 8192   # instances held for mixing on the lazy path

    def __init__(self, source, deviation: float = 0.02,
                 pad_n: Optional[int] = None, shuffle_seed: int = 0):
        from tsp_gnn_tpu.data import generator
        import os
        self._dir: Optional[str] = None
        self.instances: Optional[list] = None
        if isinstance(source, str):
            if os.path.isdir(source):
                self._dir = source
                assert self._shard_paths(), f"no instances found in {source}"
                if pad_n is None:
                    # scan EVERY shard's size members (cheap: shard_max_n
                    # decompresses only the 'n' arrays) — peeking the first
                    # shard crashed mid-training on directories whose later
                    # shards hold larger n [VERDICT r3 weak #3].  .graph
                    # text files in the directory are scanned too.
                    import glob
                    pad_n = max(generator.shard_max_n(p)
                                for p in self._shard_paths())
                    for gp in glob.glob(os.path.join(source, "*.graph")):
                        from tsp_gnn_tpu.data import fileio
                        pad_n = max(pad_n, int(fileio.read_graph(gp)["n"]))
                    assert pad_n > 0, f"no readable instances in {source}"
            else:
                self.instances = generator.load_shard(source)
        else:
            self.instances = list(source)
        if self.instances is not None:
            assert self.instances, "no instances found"
        self.deviation = deviation
        self.pad_n = pad_n or max(int(i["n"]) for i in self.instances)
        self.max_n: Optional[int] = None   # size curriculum [B:L8]: cap n
        self._rng = np.random.default_rng(shuffle_seed)

    def _shard_paths(self) -> list:
        import glob
        import os
        return sorted(glob.glob(os.path.join(self._dir, "*.npz")))

    def _iter_instances_lazy(self) -> Iterator[Dict]:
        """One pass over the directory: fresh shard listing, shuffled shard
        order, one shard resident at a time.  Unreadable shards (e.g. a file
        the generator is mid-write) are skipped, not fatal."""
        from tsp_gnn_tpu.data import fileio, generator
        import glob
        import os
        paths = self._shard_paths()
        self._rng.shuffle(paths)
        for p in paths:
            try:
                insts = generator.load_shard(p)
            except Exception:
                continue
            idx = self._rng.permutation(len(insts))
            for j in idx:
                yield insts[int(j)]
        for p in sorted(glob.glob(os.path.join(self._dir, "*.graph"))):
            yield fileio.read_graph(p)

    def _lazy_batches(self, batch_size: int, shuffle: bool) -> Iterator[list]:
        buf: list = []
        filt_n = self.max_n
        yielded = 0
        for inst in self._iter_instances_lazy():
            if filt_n is not None and int(inst["n"]) > filt_n:
                continue
            buf.append(inst)
            if len(buf) >= max(self.SHUFFLE_BUFFER, batch_size):
                if shuffle:
                    self._rng.shuffle(buf)
                while len(buf) >= batch_size + self.SHUFFLE_BUFFER // 2:
                    yield buf[:batch_size]
                    del buf[:batch_size]
                    yielded += 1
        if shuffle:
            self._rng.shuffle(buf)
        while len(buf) >= batch_size:
            yield buf[:batch_size]
            del buf[:batch_size]
            yielded += 1
        if yielded == 0 and filt_n is not None:
            # curriculum floor (matches the in-memory path): a max_n cap that
            # filters out everything must not stall training
            self.max_n = None
            try:
                yield from self._lazy_batches(batch_size, shuffle)
            finally:
                self.max_n = filt_n

    def get_instance_batches(self, batch_size: int,
                             shuffle: bool = True) -> Iterator[list]:
        """Yield lists of `batch_size` instances, honouring `self.max_n`
        (size curriculum); callers build dense or sparse layouts from them."""
        if self._dir is not None:
            yield from self._lazy_batches(batch_size, shuffle)
            return
        if self.max_n is not None:
            pool = [i for i in self.instances if int(i["n"]) <= self.max_n]
            if len(pool) < batch_size:   # curriculum floor: keep training
                pool = self.instances
        else:
            pool = self.instances
        order = np.arange(len(pool))
        if shuffle:
            self._rng.shuffle(order)
        for s in range(0, len(order) - batch_size + 1, batch_size):
            yield [pool[j] for j in order[s:s + batch_size]]

    def get_batches(self, batch_size: int,
                    shuffle: bool = True) -> Iterator[Dict[str, np.ndarray]]:
        """Yield dense batches of `batch_size` instances (2x problems each),
        at the current `self.deviation` (deviation curriculum)."""
        for chunk in self.get_instance_batches(batch_size, shuffle):
            yield make_dense_batch(chunk, self.deviation, self.pad_n)
