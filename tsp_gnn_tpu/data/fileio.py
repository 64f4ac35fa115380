"""TSPLIB-flavoured text instance files.

Parity target: the reference's dataset.py writes each instance as a text file
with dimension, weight and tour sections [SURVEY §2.5 — exact format tagged
K-med, i.e. ours to define].  Format:

    TYPE : TSP
    DIMENSION : <n>
    EDGE_WEIGHT_SECTION          # upper-triangular row-major, canonical order
    <w_01> <w_02> ... <w_0,n-1>
    <w_12> ...
    TOUR_SECTION
    <v0> <v1> ... <v_{n-1}>
    COST : <optimal cost>
    EOF
"""
from __future__ import annotations

import os
from typing import Dict

import numpy as np



def write_graph(path: str, inst: Dict) -> None:
    n = int(inst["n"])
    W = np.asarray(inst["W"], np.float64)
    lines = ["TYPE : TSP", f"DIMENSION : {n}", "EDGE_WEIGHT_SECTION"]
    idx = 0
    for u in range(n):
        row = W[idx: idx + (n - 1 - u)]
        idx += n - 1 - u
        lines.append(" ".join(f"{w:.9f}" for w in row))
    lines.append("TOUR_SECTION")
    lines.append(" ".join(str(int(v)) for v in inst["tour"]))
    lines.append(f"COST : {float(inst['opt_cost']):.9f}")
    lines.append("EOF")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def read_graph(path: str) -> Dict:
    with open(path) as f:
        lines = [ln.strip() for ln in f if ln.strip()]
    n = None
    weights = []
    tour = None
    cost = None
    section = None
    for ln in lines:
        if ln.startswith("DIMENSION"):
            n = int(ln.split(":")[1])
        elif ln == "EDGE_WEIGHT_SECTION":
            section = "w"
        elif ln == "TOUR_SECTION":
            section = "t"
        elif ln.startswith("COST"):
            cost = float(ln.split(":")[1])
            section = None
        elif ln in ("EOF", "TYPE : TSP") or ln.startswith("TYPE"):
            continue
        elif section == "w":
            weights.extend(float(x) for x in ln.split())
        elif section == "t":
            tour = np.asarray([int(x) for x in ln.split()], np.int32)
    assert n is not None and cost is not None and tour is not None
    W = np.asarray(weights, np.float32)
    assert W.shape[0] == n * (n - 1) // 2, "weight count mismatch"
    return {"n": n, "W": W, "tour": tour, "opt_cost": np.float32(cost),
            "coords": np.zeros((n, 2), np.float32)}
