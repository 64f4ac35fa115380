"""Bucket-shape sweep: per-pad step time of the flagship program, measured
with PRE-STAGED device batches (the r4_perf buckets stage charged ~25 ms of
host->device tunnel transfer to every chunk — this isolates compute).

Each pad p is measured on batches of instances with n in (prev_pad, p] (the
content a bucketed stream would feed it).  Offline, any candidate bucket set
can be scored as sum(real_edges)/sum(time) under the U{20..40} mix.

  timeout 5400 env PYTHONPATH=/root/repo:/root/.axon_site \
    python scripts/bucket_sweep.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OUT = "results/bucket_sweep.jsonl"
PADS = (24, 28, 32, 34, 36, 40)


def emit(**kv):
    print(json.dumps(kv), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(kv) + "\n")


def main():
    import jax

    from tsp_gnn_tpu import train as tr
    from tsp_gnn_tpu.config import get_config
    from tsp_gnn_tpu.data import generator
    from tsp_gnn_tpu.data.loader import make_dense_batch
    from tsp_gnn_tpu.models import tsp
    from tsp_gnn_tpu.utils.system import enable_compilation_cache

    enable_compilation_cache()
    assert jax.devices()[0].platform != "cpu"
    cfg = get_config("n40")
    chunk = 16
    rng = np.random.default_rng(5)
    pads = tuple(int(x) for x in os.environ.get(
        "BUCKET_SWEEP_PADS", ",".join(map(str, PADS))).split(","))
    emit(event="bucket_sweep_start", pads=list(pads),
         t=time.strftime("%F %T"))
    prev = 19
    for pad in pads:
        lo = max(20, prev + 1)
        insts = [generator.generate_instance(
            rng, int(rng.integers(lo, pad + 1)), "two_opt", 1)
            for _ in range(cfg.data.batch_size)]
        prev = pad
        batch = make_dense_batch(insts, cfg.data.deviation, pad)
        stacked = tr.device_batch({k: np.stack([v] * chunk)
                                   for k, v in batch.items()})
        edges = int(batch["n_edges"].sum()) * cfg.model.tmax * chunk
        try:
            params = tsp.tsp_init(jax.random.PRNGKey(0), cfg.model)
            opt = tr.make_optimizer(cfg).init(params)
            t0 = time.perf_counter()
            params, opt, _ = tr.train_chunk(params, opt, stacked, cfg)
            np.asarray(jax.tree.leaves(params)[0])
            warm = time.perf_counter() - t0
            reps = 3
            t0 = time.perf_counter()
            for _ in range(reps):
                params, opt, _ = tr.train_chunk(params, opt, stacked, cfg)
                np.asarray(jax.tree.leaves(params)[0])
            dt = (time.perf_counter() - t0) / reps
            emit(pad=pad, n_range=[lo, pad], warmup_s=round(warm, 1),
                 ms_per_step=dt / chunk * 1e3, edges_per_s=edges / dt,
                 real_edges_per_batch=int(batch["n_edges"].sum()),
                 m_pad=int(batch["W"].shape[1]))
        except Exception as e:  # noqa: BLE001
            emit(pad=pad, error=f"{type(e).__name__}: {e}"[:300])
    emit(event="bucket_sweep_end", t=time.strftime("%F %T"))


if __name__ == "__main__":
    main()
