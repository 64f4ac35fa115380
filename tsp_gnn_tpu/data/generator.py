"""Random Euclidean decision-TSP instance generation.

Parity target: the reference's dataset.py [SURVEY §2.5] — n ~ U{n_min..n_max}
points uniform in the unit square, complete graph with Euclidean weights
(range [0, sqrt(2)], no further normalisation needed), optimal tour cost from
the solver, instances written to disk.  The per-vertex cost normalisation
(C*/n) and the +/-dev dual labeling happen in the loader (SURVEY §2.4).
"""
from __future__ import annotations

import os
from typing import Dict, Iterator, List, Optional

import numpy as np

from tsp_gnn_tpu.data import solver as tsp_solver
from tsp_gnn_tpu.models.tsp import edge_list


def pairwise_dist(coords: np.ndarray) -> np.ndarray:
    diff = coords[:, None, :] - coords[None, :, :]
    return np.sqrt((diff ** 2).sum(-1))


def edge_weights(dist: np.ndarray) -> np.ndarray:
    """Canonical [m] edge-weight vector (lexicographic u<v order)."""
    e = edge_list(dist.shape[0])
    return dist[e[:, 0], e[:, 1]]


def generate_instance(rng: np.random.Generator, n: int,
                      solver_method: str = "auto",
                      restarts: int = 4) -> Dict:
    coords = rng.random((n, 2))
    dist = pairwise_dist(coords)
    tour, cost = tsp_solver.solve(dist, method=solver_method,
                                  restarts=restarts, rng=rng)
    return {
        "n": n,
        "coords": coords.astype(np.float32),
        "W": edge_weights(dist).astype(np.float32),
        "tour": tour.astype(np.int32),
        "opt_cost": np.float32(cost),
    }


def generate_instances(seed: int, count: int, n_min: int, n_max: int,
                       solver_method: str = "auto",
                       restarts: int = 4) -> List[Dict]:
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(count):
        n = int(rng.integers(n_min, n_max + 1))
        out.append(generate_instance(rng, n, solver_method, restarts))
    return out


def instance_stream(seed: int, n_min: int, n_max: int,
                    solver_method: str = "auto",
                    restarts: int = 4) -> Iterator[Dict]:
    """Endless deterministic stream (training without a materialised set)."""
    rng = np.random.default_rng(seed)
    while True:
        n = int(rng.integers(n_min, n_max + 1))
        yield generate_instance(rng, n, solver_method, restarts)


def save_shard(path: str, instances: List[Dict]) -> None:
    """npz shard: ragged instances stored with per-instance keys."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    flat = {}
    for i, inst in enumerate(instances):
        for k, v in inst.items():
            flat[f"{i}/{k}"] = v
    flat["count"] = np.int64(len(instances))
    np.savez_compressed(path, **flat)


def load_shard(path: str) -> List[Dict]:
    z = np.load(path)
    count = int(z["count"])
    out = []
    for i in range(count):
        out.append({k: z[f"{i}/{k}"] for k in ("n", "coords", "W", "tour",
                                               "opt_cost")})
        out[-1]["n"] = int(out[-1]["n"])
    return out
