"""TSP labeling solvers — the Concorde replacement.

Parity target: the reference's dataset.py labels every instance with the
OPTIMAL tour cost via the external Concorde C library [SURVEY §2.1 C4].
Concorde is unavailable here (no network, SURVEY §0), so per the build plan
(SURVEY §2.1 native-code census) labeling is:

  * exact Held-Karp dynamic programming for small n (cross-check / tests),
  * multi-restart nearest-neighbour + 2-opt + Or-opt local search for larger
    n (gap << 1% at n<=40, measured in tests/test_data.py),
  * a C++ implementation of the same local search (native/solver.cpp, loaded
    via ctypes) for production-volume generation; this module is the NumPy
    fallback and the correctness reference for the C++ path.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from tsp_gnn_tpu.data import native


def tour_cost(dist: np.ndarray, tour: np.ndarray) -> float:
    return float(dist[tour, np.roll(tour, -1)].sum())


def held_karp(dist: np.ndarray) -> Tuple[np.ndarray, float]:
    """Exact O(n^2 2^n) DP.  Practical to n<=14; used as the optimality oracle."""
    n = dist.shape[0]
    if n <= 2:
        tour = np.arange(n)
        return tour, tour_cost(dist, tour)
    assert n <= 16, "Held-Karp restricted to n<=16"
    nsub = 1 << (n - 1)                     # subsets of {1..n-1}
    INF = np.inf
    dp = np.full((nsub, n - 1), INF)
    parent = np.full((nsub, n - 1), -1, np.int32)
    for j in range(n - 1):
        dp[1 << j, j] = dist[0, j + 1]
    for mask in range(1, nsub):
        ends = [j for j in range(n - 1) if mask & (1 << j)]
        if len(ends) == 1:
            continue
        for j in ends:
            pmask = mask ^ (1 << j)
            cand = dp[pmask, :] + dist[1:, j + 1]
            # exclude ends not present in pmask (their dp is INF anyway)
            k = int(np.argmin(cand))
            dp[mask, j] = cand[k]
            parent[mask, j] = k
    full = nsub - 1
    closing = dp[full, :] + dist[1:, 0][np.arange(n - 1)]
    j = int(np.argmin(closing))
    best = float(closing[j])
    # reconstruct
    tour = [0]
    mask = full
    chain = []
    while j >= 0:
        chain.append(j + 1)
        nj = parent[mask, j]
        mask ^= 1 << j
        j = nj
    tour += chain[::-1]
    return np.asarray(tour, np.int64), best


def held_karp_bound(dist: np.ndarray, iters: int = 100,
                    ub: Optional[float] = None) -> float:
    """Held–Karp 1-tree LOWER bound via subgradient ascent.

    A true lower bound on the optimal tour for ANY n (typically within
    1–2% of optimal on Euclidean instances) — quantifies the label-noise
    upper bound of the heuristic solver at n where exact DP is infeasible
    (SURVEY §7 hard-part #4, [VERDICT r2 #4]): gap(solver) <= (cost - LB)/LB.

    1-tree: MST over nodes {1..n-1} plus node 0's two cheapest edges, on
    reduced costs d'[i,j] = d[i,j] + pi[i] + pi[j]; bound = w(1-tree)
    - 2*sum(pi), maximised over pi by subgradient steps on (degree - 2).
    """
    n = dist.shape[0]
    if n < 3:
        return 0.0
    pi = np.zeros(n)
    best = -np.inf
    if ub is None:
        _, ub = local_search(dist, restarts=1, use_or_opt=False)
    step0 = 1.0
    for it in range(iters):
        d = dist + pi[None, :] + pi[:, None]
        # Prim's MST over nodes 1..n-1 (O(n^2)), seeded at node 1
        in_tree = np.zeros(n, bool)
        in_tree[0] = True  # excluded from MST; handled by its 2 cheapest
        in_tree[1] = True
        parent = np.ones(n, np.int64)
        deg = np.zeros(n, np.int64)
        w = 0.0
        key = d[1].copy()
        key[in_tree] = np.inf
        for _ in range(n - 2):
            u = int(np.argmin(key))
            in_tree[u] = True
            w += key[u]
            deg[u] += 1
            deg[parent[u]] += 1
            better = d[u] < key
            parent[better] = u
            key = np.minimum(key, d[u])
            key[in_tree] = np.inf
        # node 0: two cheapest reduced edges
        e0 = np.sort(d[0, 1:])[:2]
        w += e0.sum()
        deg[0] = 2
        i2 = np.argsort(d[0, 1:])[:2] + 1
        deg[i2[0]] += 1
        deg[i2[1]] += 1
        bound = w - 2.0 * pi.sum()
        best = max(best, bound)
        g = deg - 2
        gn = float((g * g).sum())
        if gn == 0:
            break  # the 1-tree is a tour: bound is optimal
        t = step0 * (1.0 - it / iters) * max(ub - bound, 1e-12) / gn
        pi = pi + t * g
    return float(best)


def nearest_neighbor(dist: np.ndarray, start: int = 0) -> np.ndarray:
    n = dist.shape[0]
    visited = np.zeros(n, bool)
    tour = np.empty(n, np.int64)
    tour[0] = start
    visited[start] = True
    cur = start
    big = dist.max() * n + 1.0
    for i in range(1, n):
        row = np.where(visited, big, dist[cur])
        cur = int(np.argmin(row))
        tour[i] = cur
        visited[cur] = True
    return tour


def two_opt(dist: np.ndarray, tour: np.ndarray,
            max_iters: int = 10_000) -> np.ndarray:
    """First-improvement-free vectorised 2-opt: each pass evaluates ALL
    segment reversals at once and applies the best positive gain."""
    tour = tour.copy()
    n = len(tour)
    for _ in range(max_iters):
        nxt = np.roll(tour, -1)
        d_cur = dist[tour, nxt]                            # [n] d(t_i, t_{i+1})
        # gain[i, j] for reversing t[i+1..j] (i < j): removes edges i and j,
        # adds (t_i, t_j) and (t_{i+1}, t_{j+1})
        add1 = dist[tour][:, tour]                         # d(t_i, t_j)
        add2 = dist[nxt][:, nxt]                           # d(t_{i+1}, t_{j+1})
        gain = d_cur[:, None] + d_cur[None, :] - add1 - add2
        iu = np.triu_indices(n, k=1)
        g = gain[iu]
        k = int(np.argmax(g))
        if g[k] <= 1e-12:
            return tour
        i, j = iu[0][k], iu[1][k]
        tour[i + 1:j + 1] = tour[i + 1:j + 1][::-1]
    return tour


def or_opt(dist: np.ndarray, tour: np.ndarray, seg_lens=(1, 2, 3),
           max_iters: int = 10_000) -> np.ndarray:
    """Or-opt: relocate short segments; vectorised over insertion points."""
    tour = tour.copy()
    n = len(tour)
    for _ in range(max_iters):
        improved = False
        for L in seg_lens:
            if L >= n - 2:
                continue
            for i in range(n):
                seg = [(i + k) % n for k in range(L)]
                a, b = tour[(i - 1) % n], tour[seg[0]]
                c, d = tour[seg[-1]], tour[(i + L) % n]
                remove = dist[a, b] + dist[c, d] - dist[a, d]
                # candidate insertion between tour[j] and tour[j+1]
                js = np.array([j for j in range(n)
                               if j not in seg and (j + 1) % n != seg[0]
                               and (j - (i - 1)) % n != 0])
                if len(js) == 0:
                    continue
                p, q = tour[js], tour[(js + 1) % n]
                insert = dist[p, b] + dist[c, q] - dist[p, q]
                gains = remove - insert
                k = int(np.argmax(gains))
                if gains[k] > 1e-12:
                    seg_vals = [tour[s] for s in seg]
                    rest = [t for idx, t in enumerate(tour)
                            if idx not in set(seg)]
                    pos = rest.index(tour[js[k]])
                    tour = np.asarray(
                        rest[:pos + 1] + seg_vals + rest[pos + 1:], np.int64)
                    improved = True
                    break
            if improved:
                break
        if not improved:
            return tour
    return tour


def local_search(dist: np.ndarray, restarts: int = 4,
                 rng: Optional[np.random.Generator] = None,
                 use_or_opt: bool = True) -> Tuple[np.ndarray, float]:
    """Multi-restart NN + 2-opt (+ Or-opt) — near-optimal labels."""
    n = dist.shape[0]
    rng = rng or np.random.default_rng(0)
    starts = rng.permutation(n)[:max(1, restarts)]
    best_tour, best_cost = None, np.inf
    for s in starts:
        t = nearest_neighbor(dist, int(s))
        t = two_opt(dist, t)
        if use_or_opt:
            t = or_opt(dist, t)
            t = two_opt(dist, t)
        cost = tour_cost(dist, t)
        if cost < best_cost:
            best_tour, best_cost = t, cost
    return best_tour, float(best_cost)


def solve(dist: np.ndarray, method: str = "auto", restarts: int = 4,
          rng: Optional[np.random.Generator] = None) -> Tuple[np.ndarray, float]:
    """Label an instance: returns (tour, cost).

    method: "auto" (exact for n<=12, C++ local search if built, else NumPy),
            "held_karp", "two_opt", "cpp".
    """
    n = dist.shape[0]
    if method == "held_karp" or (method == "auto" and n <= 12):
        return held_karp(dist)
    if method == "cpp" or (method == "auto" and native.available()):
        return native.solve(dist, restarts=restarts)
    global _warned_numpy_fallback
    if method == "auto" and not _warned_numpy_fallback:
        _warned_numpy_fallback = True
        import warnings
        warnings.warn(
            "C++ labeling solver not built — falling back to the NumPy "
            "local search, which is orders of magnitude slower at "
            "production volume (quadratic-Python Or-opt).  Build it with "
            "`make -C native` for dataset generation.", RuntimeWarning)
    return local_search(dist, restarts=restarts, rng=rng)


_warned_numpy_fallback = False
