"""Labeling cost + optimality-gap table for the configs[4] workload
(n in [100, 200]) [VERDICT r2 #4].

For each n: time the PRODUCTION labeler (C++ ILS via ctypes, the dataset
CLI defaults) and bound its optimality gap two ways:
  * vs a long-ILS proxy (restarts=32) — how much more search buys;
  * vs the Held-Karp 1-tree lower bound — a TRUE upper bound on the gap,
    valid at any n (solver.held_karp_bound, subgradient ascent).

The +/-2% deviation labels are meaningful only if the label noise is well
below 2%; this is the measurement SURVEY §7 hard-part #4 demanded above
n=40.  Writes JSONL rows to stdout / results/labeling_cost_r3.jsonl.
"""
import json
import sys
import time

import numpy as np

from tsp_gnn_tpu.data import native, solver


def main():
    assert native.available(), "build native/solver.cpp first (make -C native)"
    out = open("results/labeling_cost_r3.jsonl", "w")
    rng = np.random.default_rng(0)
    for n in (40, 100, 150, 200):
        k = 8 if n > 40 else 16
        gaps_long, gaps_lb, times = [], [], []
        for _ in range(k):
            pts = rng.random((n, 2))
            d = np.sqrt(((pts[:, None] - pts[None]) ** 2).sum(-1))
            t0 = time.perf_counter()
            _, cost = native.solve(d, restarts=4)
            times.append(time.perf_counter() - t0)
            _, cost_long = native.solve(d, restarts=32)
            lb = solver.held_karp_bound(d, iters=200, ub=cost)
            gaps_long.append(cost / cost_long - 1.0)
            gaps_lb.append(cost / lb - 1.0)
        row = {
            "n": n, "instances": k,
            "s_per_instance_restarts4": round(float(np.mean(times)), 4),
            "gap_vs_long_ils_mean_pct": round(100 * float(np.mean(gaps_long)), 3),
            "gap_vs_long_ils_max_pct": round(100 * float(np.max(gaps_long)), 3),
            "gap_ub_vs_hk_bound_mean_pct": round(100 * float(np.mean(gaps_lb)), 3),
            "gap_ub_vs_hk_bound_max_pct": round(100 * float(np.max(gaps_lb)), 3),
        }
        print(json.dumps(row))
        sys.stdout.flush()
        out.write(json.dumps(row) + "\n")
        out.flush()
    out.close()


if __name__ == "__main__":
    main()
