"""Benchmark: edges/s/chip in the message-passing training loop [B:L2].

Runs the flagship n=40 decision-TSP training step (forward tmax scan +
backward + Adam) on the attached chip and reports edge-updates per second
(real edges x tmax per step / step time).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline: BASELINE.json has no published throughput ("published": {},
SURVEY §6) — reported as the ratio to the previous round's recorded value
(BENCH_r*.json) when present, else 1.0.
"""
import glob
import json
import os
import re
import sys
import time


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tsp_gnn_tpu import train as tr
    from tsp_gnn_tpu.config import get_config
    from tsp_gnn_tpu.data import generator
    from tsp_gnn_tpu.data.loader import make_dense_batch
    from tsp_gnn_tpu.models import tsp

    cfg = get_config("n40")  # n in [20,40], batch 128 instances, tmax 32
    n_pad = cfg.data.pad_n
    rng = np.random.default_rng(0)
    # batch_size INSTANCES (each dual-labeled into 2 problems) — the exact
    # workload train.py dispatches for this preset
    insts = [generator.generate_instance(
        rng, int(rng.integers(cfg.data.n_min, cfg.data.n_max + 1)),
        "two_opt", restarts=1) for _ in range(cfg.data.batch_size)]
    batch = make_dense_batch(insts, cfg.data.deviation, n_pad)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}

    params = tsp.tsp_init(jax.random.PRNGKey(0), cfg.model)
    opt_state = tr.make_optimizer(cfg).init(params)

    # production path: CHUNK optimizer steps per dispatch (train.py --chunk)
    chunk = int(os.environ.get("BENCH_CHUNK", "8"))
    stacked = {k: jnp.asarray(np.stack([v] * chunk)) for k, v in batch.items()}

    # warmup / compile
    params, opt_state, m = tr.train_chunk(params, opt_state, stacked, cfg)
    jax.block_until_ready(m["loss"])

    iters = int(os.environ.get("BENCH_STEPS", "40")) // chunk
    # block EVERY dispatch: on the axon backend a block on the final loss of
    # a donated chain does not reliably wait for the whole chain, which
    # produced a ~100x-inflated first measurement.
    t0 = time.perf_counter()
    for _ in range(iters):
        params, opt_state, m = tr.train_chunk(params, opt_state, stacked, cfg)
        jax.block_until_ready(m["loss"])
    dt = time.perf_counter() - t0

    edge_updates = int(batch["n_edges"].sum()) * cfg.model.tmax * chunk * iters
    eps = edge_updates / dt

    prev = None
    for f in sorted(glob.glob("BENCH_r*.json")):
        try:
            rec = json.load(open(f))
            if rec.get("metric", "").startswith("edges_per_s"):
                prev = rec["value"]
        except Exception:
            pass
    vs = (eps / prev) if prev else 1.0
    print(json.dumps({"metric": "edges_per_s_per_chip", "value": eps,
                      "unit": "edge-updates/s", "vs_baseline": round(vs, 4)}))


if __name__ == "__main__":
    main()
