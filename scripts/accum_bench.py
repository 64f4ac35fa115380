"""Measure the gradient-accumulation large_batch step (BASELINE configs[3])
on the real chip [VERDICT r2 #3].

The 4096-instance batch is delivered as accum=16 x 256-instance
micro-batches inside ONE dispatch (train.train_accum_step): the compiled
program body is the 256-instance micro-step scanned 16 times, so the
executable stays inside the tunnel compile service's proven size envelope
while the optimizer sees exact 4k-batch semantics
(tests/test_train_smoke.py::test_accum_step_equals_big_batch).

Writes results/accum_bench_r3.jsonl.  Run solo on the chip:
  timeout 7200 env PYTHONPATH=/root/repo:/root/.axon_site \
    python scripts/accum_bench.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    from tsp_gnn_tpu import train as tr
    from tsp_gnn_tpu.config import get_config
    from tsp_gnn_tpu.data import generator
    from tsp_gnn_tpu.models import tsp
    from tsp_gnn_tpu.utils.system import enable_compilation_cache

    enable_compilation_cache()
    out = open("results/accum_bench_r3.jsonl", "a")

    def emit(**kw):
        print(json.dumps(kw), flush=True)
        out.write(json.dumps(kw) + "\n")
        out.flush()

    cfg = get_config("large_batch")   # sparse bf16, batch 256, accum 16
    rng = np.random.default_rng(0)
    micro = cfg.data.batch_size
    insts = [generator.generate_instance(
        rng, int(rng.integers(20, 41)), "two_opt", 1) for _ in range(micro)]
    one = tr.build_batch(insts, cfg.data.deviation, cfg.data.pad_n,
                         cfg.train.layout)
    edges_micro = int(one["n_edges"].sum()) * cfg.model.tmax

    def sync(p):
        np.asarray(jax.tree.leaves(p)[0])

    for accum in (4, 16):
        try:
            stacked = tr.device_batch(
                {k: np.stack([v] * accum) for k, v in one.items()})
            params = tsp.tsp_init(jax.random.PRNGKey(0), cfg.model)
            opt_state = tr.make_optimizer(cfg).init(params)
            t0 = time.perf_counter()
            params, opt_state, m = tr.train_accum_step(
                params, opt_state, stacked, cfg)
            sync(params)
            warm = time.perf_counter() - t0
            iters = 2
            t0 = time.perf_counter()
            for _ in range(iters):
                params, opt_state, m = tr.train_accum_step(
                    params, opt_state, stacked, cfg)
                sync(params)
            dt = (time.perf_counter() - t0) / iters
            emit(kind="accum_step", layout=cfg.train.layout,
                 bf16=cfg.train.bf16, micro_instances=micro, accum=accum,
                 effective_instances=micro * accum, ms=dt * 1e3,
                 edges_per_s=edges_micro * accum / dt,
                 loss=float(m["loss"]), warmup_s=round(warm, 1))
        except Exception as e:  # noqa: BLE001
            emit(kind="accum_step", accum=accum, error=str(e)[:300])
    out.close()


if __name__ == "__main__":
    main()
