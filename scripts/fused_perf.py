"""Fused-rollout vs scan timing on the real chip at flagship shapes.

Run after the Mosaic fixes (scripts/fused_repro.py now passes): measures
forward fused-vs-scan in both dtypes and the chunked train step with the
fused forward (custom-VJP scan backward), appending JSON lines to stdout.

  timeout 3000 python scripts/fused_perf.py | tee results/fused_perf.jsonl
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def emit(**kv):
    print(json.dumps(kv), flush=True)


def timed(f, *args, reps=5):
    import jax
    import numpy as np

    def hard_sync(out):
        np.asarray(jax.tree.leaves(out)[0])
        return out
    hard_sync(f(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = hard_sync(f(*args))
    return (time.perf_counter() - t0) / reps, out


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tsp_gnn_tpu import train as tr
    from tsp_gnn_tpu.config import get_config
    from tsp_gnn_tpu.data import generator
    from tsp_gnn_tpu.models import tsp, tsp_sparse
    from tsp_gnn_tpu.ops import fused_rollout, layout
    from tsp_gnn_tpu.utils.system import enable_compilation_cache

    enable_compilation_cache()
    assert jax.devices()[0].platform != "cpu", "run on the TPU"

    cfg = get_config("n40")
    rng = np.random.default_rng(0)
    insts = [generator.generate_instance(
        rng, int(rng.integers(20, 41)), "two_opt", 1) for _ in range(64)]
    g = layout.build_uniform_block_graph(insts, 0.02, 40)
    B = g.num_problems
    kw = dict(v_pad=g.v_pad, m_pad=g.m_pad)
    batch = {k: jnp.asarray(v)
             for k, v in tsp_sparse.block_batch_arrays(g).items()}
    params = tsp.tsp_init(jax.random.PRNGKey(0), cfg.model)
    edges = int(np.asarray(batch["n_edges"]).sum()) * cfg.model.tmax

    group = int(os.environ.get("FUSED_GROUP", "4"))
    for dtype_name, cast in [("bf16", tr._cast_bf16), ("f32", lambda t: t)]:
        p, b = cast(params), cast(batch)
        scan_f = jax.jit(lambda pp, bb: tsp_sparse.forward_sparse(
            pp, bb, cfg.model, use_pallas=True, **kw))
        fused_f = jax.jit(lambda pp, bb: fused_rollout.forward_fused(
            pp, bb, cfg.model, group=group, **kw))
        for name, f in [("scan", scan_f), ("fused", fused_f)]:
            try:
                dt, out = timed(f, p, b)
                emit(kind="forward", path=name, dtype=dtype_name, ms=dt * 1e3,
                     group=group, logits_finite=bool(jnp.isfinite(out).all()))
            except Exception as e:  # noqa: BLE001
                emit(kind="forward", path=name, dtype=dtype_name,
                     error=str(e)[:300])
        try:
            a = jax.block_until_ready(scan_f(p, b))
            c = jax.block_until_ready(fused_f(p, b))
            emit(kind="fused_vs_scan", dtype=dtype_name,
                 max_diff=float(jnp.max(jnp.abs(a - c))))
        except Exception as e:  # noqa: BLE001
            emit(kind="fused_vs_scan", dtype=dtype_name, error=str(e)[:300])

    # chunked train step with the fused forward (bf16 — the configs[3] combo)
    chunkN = 8
    for name, bf16 in [("fused_train_bf16", True), ("fused_train_f32", False)]:
        try:
            vcfg = cfg.replace(
                train=dataclasses.replace(cfg.train, bf16=bf16,
                                          layout="sparse"),
                kernel=dataclasses.replace(cfg.kernel, fused=True,
                                           batch_tile=group))
            stacked = {k: jnp.stack([v] * chunkN) for k, v in batch.items()}
            p = tsp.tsp_init(jax.random.PRNGKey(0), vcfg.model)
            o = tr.make_optimizer(vcfg).init(p)
            p, o, m = tr.train_chunk(p, o, stacked, vcfg)
            np.asarray(jax.tree.leaves(p)[0])
            t0 = time.perf_counter()
            iters = 3
            for _ in range(iters):
                p, o, m = tr.train_chunk(p, o, stacked, vcfg)
                np.asarray(jax.tree.leaves(p)[0])
            dt = (time.perf_counter() - t0) / (iters * chunkN)
            emit(kind="train_step", variant=name, ms=dt * 1e3,
                 edges_per_s=edges / dt, loss=float(m["loss"]))
        except Exception as e:  # noqa: BLE001
            emit(kind="train_step", variant=name, error=str(e)[:300])


if __name__ == "__main__":
    main()
