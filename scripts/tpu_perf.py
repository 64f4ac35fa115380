"""On-hardware kernel validation + performance measurement.

Run ONLY when no other TPU process is alive.  Produces JSON lines with:
  * compiled-kernel correctness vs jnp references (bf16-pass tolerance),
  * chained per-op timings (dispatch latency amortised inside one jit),
  * fused-rollout vs scan forward timing (f32 and bf16),
  * dense vs sparse chunked train-step timing.

  python scripts/tpu_perf.py | tee results/tpu_perf.jsonl
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def emit(**kv):
    print(json.dumps(kv), flush=True)


def chain(fn, x0, steps):
    import jax

    def body(x, _):
        return fn(x), None
    return jax.jit(lambda x: jax.lax.scan(body, x, None, length=steps)[0])


def timed(f, *args, reps=5):
    import jax
    import numpy as np

    def hard_sync(out):
        np.asarray(jax.tree.leaves(out)[0])   # host pull = true sync
        return out
    hard_sync(f(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = hard_sync(f(*args))
    return (time.perf_counter() - t0) / reps, out


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tsp_gnn_tpu import train as tr
    from tsp_gnn_tpu.config import get_config
    from tsp_gnn_tpu.data import generator
    from tsp_gnn_tpu.models import tsp, tsp_sparse
    from tsp_gnn_tpu.ops import fused_rollout, layout, spmm

    from tsp_gnn_tpu.utils.system import enable_compilation_cache
    enable_compilation_cache()
    assert jax.devices()[0].platform != "cpu", "run on the TPU"
    # long chain: each timed dispatch carries ~35ms tunnel latency plus a
    # ~1.3MB host pull for the sync; K=200 keeps those under 2% of the
    # chained kernel time so the per-roundtrip number is the kernel's
    K = 200

    def sync_params(p):
        """TRUE host sync: np.asarray on an updated-param leaf (a donated
        chain's final-loss block under-waits on this backend — VERDICT #2)."""
        np.asarray(jax.tree.leaves(p)[0])

    cfg = get_config("n40")
    rng = np.random.default_rng(0)
    insts = [generator.generate_instance(
        rng, int(rng.integers(20, 41)), "two_opt", 1) for _ in range(64)]
    g = layout.build_uniform_block_graph(insts, 0.02, 40)
    B = g.num_problems
    M = B * g.m_pad
    batch = {k: jnp.asarray(v)
             for k, v in tsp_sparse.block_batch_arrays(g).items()}
    src2, tgt2, em2 = batch["src2"], batch["tgt2"], batch["em2"]
    d = 64
    kw = dict(v_pad=g.v_pad, m_pad=g.m_pad)
    x_v = jax.random.normal(jax.random.PRNGKey(0), (B * g.v_pad, d))
    x_e = jax.random.normal(jax.random.PRNGKey(1), (B * g.m_pad, d))

    # 1) compiled-kernel correctness (bf16 MXU passes => loose tolerance)
    for name, fn, ref in [
        ("e_from_v", lambda: spmm.e_from_v(src2, tgt2, em2, x_v, **kw),
         lambda: spmm.e_from_v_ref(src2, tgt2, em2, x_v, **kw)),
        ("v_from_e",
         lambda: spmm.v_from_e(src2, tgt2, em2, x_e, num_problems=B, **kw),
         lambda: spmm.v_from_e_ref(src2, tgt2, em2, x_e,
                                   num_problems=B, **kw)),
        ("sddmm", lambda: spmm.sddmm(src2, tgt2, em2, x_v, **kw),
         lambda: spmm.sddmm_ref(src2, tgt2, em2, x_v, **kw)),
        ("segsum",
         lambda: spmm.segment_sum_per_problem(em2 * 2.0, em2, m_pad=g.m_pad,
                                              num_problems=B),
         lambda: spmm.segment_sum_ref(em2 * 2.0, em2, m_pad=g.m_pad,
                                      num_problems=B)),
    ]:
        out = jax.block_until_ready(fn())
        want = jax.block_until_ready(ref())
        err = float(jnp.max(jnp.abs(out.reshape(-1) - want.reshape(-1))))
        scale = float(jnp.max(jnp.abs(want)) + 1e-9)
        emit(kind="kernel_correctness", kernel=name, max_abs_err=err,
             rel_err=err / scale, ok=bool(err / scale < 0.05))

    # 2) chained aggregation round-trip timing: pallas vs xla gather
    rt_pallas = chain(lambda v: spmm.v_from_e(
        src2, tgt2, em2, spmm.e_from_v(src2, tgt2, em2, v, **kw),
        num_problems=B, **kw) * 0.25, x_v, K)
    rt_ref = chain(lambda v: spmm.v_from_e_ref(
        src2, tgt2, em2, spmm.e_from_v_ref(src2, tgt2, em2, v, **kw),
        num_problems=B, **kw) * 0.25, x_v, K)
    for name, f in [("pallas", rt_pallas), ("xla_gather", rt_ref)]:
        dt, _ = timed(f, x_v)
        emit(kind="agg_roundtrip", path=name, us_per_roundtrip=dt / K * 1e6,
             edges=M)

    # 3) fused rollout vs scan forward (tmax=32), f32 and bf16
    params = tsp.tsp_init(jax.random.PRNGKey(0), cfg.model)
    for dtype_name, cast in [("f32", lambda t: t),
                             ("bf16", tr._cast_bf16)]:
        p = cast(params)
        b = cast(batch)
        scan_f = jax.jit(lambda pp, bb: tsp_sparse.forward_sparse(
            pp, bb, cfg.model, use_pallas=True, **kw))
        fused_f = jax.jit(lambda pp, bb: fused_rollout.forward_fused(
            pp, bb, cfg.model, group=4, **kw))
        for name, f in [("scan", scan_f), ("fused", fused_f)]:
            try:
                dt, out = timed(f, p, b)
                emit(kind="forward", path=name, dtype=dtype_name,
                     ms=dt * 1e3,
                     logits_finite=bool(jnp.isfinite(out).all()))
            except Exception as e:  # noqa: BLE001 — report, keep measuring
                emit(kind="forward", path=name, dtype=dtype_name,
                     error=str(e)[:200])
        # cross-check fused == scan on hardware
        try:
            a = jax.block_until_ready(scan_f(p, b))
            c = jax.block_until_ready(fused_f(p, b))
            emit(kind="fused_vs_scan", dtype=dtype_name,
                 max_diff=float(jnp.max(jnp.abs(a - c))))
        except Exception as e:  # noqa: BLE001
            emit(kind="fused_vs_scan", dtype=dtype_name, error=str(e)[:200])

    # 4) chunked train step: dense f32 / dense bf16 / sparse pallas
    import dataclasses
    dense_b = tr.device_batch(tr.build_batch(insts, 0.02, 40, "dense"))
    chunkN = 8
    edges = int(dense_b["n_edges"].sum()) * cfg.model.tmax
    variants = [
        ("dense_f32", cfg, dense_b),
        ("dense_bf16",
         cfg.replace(train=dataclasses.replace(cfg.train, bf16=True)),
         dense_b),
        ("sparse_pallas",
         cfg.replace(train=dataclasses.replace(cfg.train, layout="sparse")),
         batch),
    ]
    for name, vcfg, vb in variants:
        try:
            stacked = {k: jnp.stack([v] * chunkN) for k, v in vb.items()}
            p = tsp.tsp_init(jax.random.PRNGKey(0), vcfg.model)
            o = tr.make_optimizer(vcfg).init(p)
            p, o, m = tr.train_chunk(p, o, stacked, vcfg)
            sync_params(p)
            t0 = time.perf_counter()
            iters = 3
            for _ in range(iters):
                p, o, m = tr.train_chunk(p, o, stacked, vcfg)
                sync_params(p)
            dt = (time.perf_counter() - t0) / (iters * chunkN)
            emit(kind="train_step", variant=name, ms=dt * 1e3,
                 edges_per_s=edges / dt)
        except Exception as e:  # noqa: BLE001
            emit(kind="train_step", variant=name, error=str(e)[:200])


def big_shapes():
    """BASELINE configs[3]/[4] shapes on the real chip (VERDICT r1 #8, #10):
      * large_batch: 4k instances, block-diagonal sparse, fused fwd, bf16 —
        VMEM/HBM feasibility + step time;
      * pad_n=200 graph-partitioned step at graph=1 vs the unpartitioned
        step at equal work — the single-chip upper bound on multi-host
        scaling efficiency (the >=85% target's measurable component).
    Enable with TPU_PERF_BIG=1 (slow: fresh compiles of big programs).
    """
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tsp_gnn_tpu import train as tr
    from tsp_gnn_tpu.config import get_config
    from tsp_gnn_tpu.data import generator
    from tsp_gnn_tpu.models import tsp, tsp_sparse
    from tsp_gnn_tpu.ops import layout
    from tsp_gnn_tpu.parallel import halo
    from tsp_gnn_tpu.parallel.mesh import make_mesh

    def sync_params(p):
        np.asarray(jax.tree.leaves(p)[0])

    # ---- large_batch (configs[3]): 4096 instances, fused, bf16 ----
    cfg = get_config("large_batch")
    lb_insts = int(os.environ.get("TPU_PERF_LB_INSTS", "4096"))
    if lb_insts <= 0:
        emit(kind="large_batch_skipped", reason="TPU_PERF_LB_INSTS<=0")
        _run_partition_overhead(emit)
        return
    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    insts = [generator.generate_instance(
        rng, int(rng.integers(20, 41)), "two_opt", 1) for _ in range(lb_insts)]
    g = layout.build_uniform_block_graph(insts, 0.02, 40)
    batch = tr.device_batch(tsp_sparse.block_batch_arrays(g))
    emit(kind="large_batch_host_assembly", s=time.perf_counter() - t0,
         problems=g.num_problems, edges=g.num_problems * g.m_pad)
    try:
        p = tsp.tsp_init(jax.random.PRNGKey(0), cfg.model)
        o = tr.make_optimizer(cfg).init(p)
        edges = int(batch["n_edges"].sum()) * cfg.model.tmax
        p, o, m = tr.train_step(p, o, batch, cfg)
        sync_params(p)
        t0 = time.perf_counter()
        iters = 3
        for _ in range(iters):
            p, o, m = tr.train_step(p, o, batch, cfg)
            sync_params(p)
        dt = (time.perf_counter() - t0) / iters
        emit(kind="train_step", variant=f"large_batch_bf16_{lb_insts}",
             ms=dt * 1e3, edges_per_s=edges / dt, loss=float(m["loss"]))
    except Exception as e:  # noqa: BLE001
        emit(kind="train_step", variant=f"large_batch_bf16_{lb_insts}",
             error=str(e)[:300])

    _run_partition_overhead(emit)


def _run_partition_overhead(emit):
    """pad_n=200 halo step, graph=1, vs unpartitioned (configs[4]).

    Guarded against TPU_PERF_P200_INSTS<=0 — the r2b rerun was launched
    with 0 instances, producing a 0//0 crash and a NaN-loss row
    [VERDICT r2 #7]; now that's an explicit skip."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tsp_gnn_tpu import train as tr
    from tsp_gnn_tpu.config import get_config
    from tsp_gnn_tpu.data import generator
    from tsp_gnn_tpu.models import tsp, tsp_sparse
    from tsp_gnn_tpu.ops import layout
    from tsp_gnn_tpu.parallel import halo
    from tsp_gnn_tpu.parallel.mesh import make_mesh

    def sync_params(p):
        np.asarray(jax.tree.leaves(p)[0])

    mcfg = get_config("multihost")
    n_inst = int(os.environ.get("TPU_PERF_P200_INSTS", "32"))
    if n_inst <= 0:
        emit(kind="partition_overhead", skipped=True,
             reason="TPU_PERF_P200_INSTS<=0")
        return
    rng = np.random.default_rng(1)
    insts = [generator.generate_instance(rng, int(rng.integers(100, 201)),
                                         "two_opt", 1) for _ in range(n_inst)]
    g = layout.build_uniform_block_graph(insts, 0.02, 200)
    m_pad = ((g.m_pad + 1023) // 1024) * 1024
    g = layout.pad_uniform_edges(g, m_pad)
    edges = int(np.sum(g.n_edges)) * mcfg.model.tmax
    scfg = mcfg.replace(train=dataclasses.replace(mcfg.train,
                                                  layout="sparse"))
    opt = tr.make_optimizer(scfg)  # same transform chain for both variants
    for variant in ("unpartitioned", "halo_graph1"):
        try:
            p = tsp.tsp_init(jax.random.PRNGKey(0), mcfg.model)
            o = opt.init(p)
            if variant == "unpartitioned":
                b = tr.device_batch(tsp_sparse.block_batch_arrays(g))

                def stepfn(p, o, b, cfg=scfg):
                    return tr.train_step(p, o, b, cfg)
            else:
                mesh = make_mesh(1, 1)
                b = {k: jax.device_put(
                        jnp.asarray(v),
                        NamedSharding(mesh, halo.batch_specs()[k]))
                     for k, v in halo.shard_batch_arrays(g).items()}
                stepfn = halo.make_sharded_train_step(
                    mcfg.model, mesh, opt, v_pad=g.v_pad, m_pad=g.m_pad,
                    use_pallas=os.environ.get("TPU_PERF_P200_PALLAS",
                                              "1") == "1",
                    interpret=False)
                p = jax.device_put(p, NamedSharding(mesh, P()))
                o = jax.device_put(o, NamedSharding(mesh, P()))
            p, o, m = stepfn(p, o, b)
            sync_params(p)
            t0 = time.perf_counter()
            iters = 3
            for _ in range(iters):
                p, o, m = stepfn(p, o, b)
                sync_params(p)
            dt = (time.perf_counter() - t0) / iters
            emit(kind="partition_overhead", variant=variant, ms=dt * 1e3,
                 edges_per_s=edges / dt, loss=float(m["loss"]))
        except Exception as e:  # noqa: BLE001
            emit(kind="partition_overhead", variant=variant,
                 error=str(e)[:300])


if __name__ == "__main__":
    if os.environ.get("TPU_PERF_ONLY") != "big":
        main()
    if os.environ.get("TPU_PERF_BIG"):
        big_shapes()
