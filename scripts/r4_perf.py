"""Round-4 TPU measurement suite (run SOLO on the chip).

Stages (R4_STAGES env, comma-separated, default all):
  probe     — tiny matmul sanity + device print
  bench     — flagship dense step (chunk 16, cached program): era baseline
  buckets   — size-bucketed flagship (28,34,40): mixed-size throughput
  fusedbwd  — sparse b128: scan train step vs fused-Pallas-backward step
              [VERDICT r3 #1 measurement]
  sol       — per-kernel speed-of-light fractions (e_from_v / v_from_e /
              sddmm / segment-sum) at flagship shapes [VERDICT r3 #2]
  crossover — dense vs sparse train step across (n, batch) on one chip
              [VERDICT r3 #7]

Writes JSONL to results/r4_perf.jsonl (append).  Every timing is a TRUE
host sync (np.asarray of a dependent output leaf).  Timings are only
comparable within one session (PERF.md "Backend variance").

  timeout 7200 env PYTHONPATH=/root/repo:/root/.axon_site \
    python scripts/r4_perf.py
"""
import dataclasses
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OUT = "results/r4_perf.jsonl"


def emit(**kv):
    print(json.dumps(kv), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(kv) + "\n")


def stage_enabled(name):
    stages = os.environ.get("R4_STAGES", "")
    return not stages or name in stages.split(",")


def hard_sync(out):
    import jax
    np.asarray(jax.tree.leaves(out)[0])
    return out


def timed(f, *args, reps=3):
    t_w = time.perf_counter()
    hard_sync(f(*args))
    warm = time.perf_counter() - t_w
    t0 = time.perf_counter()
    for _ in range(reps):
        hard_sync(f(*args))
    return (time.perf_counter() - t0) / reps, warm


def guarded(name):
    def deco(fn):
        def run(*a, **kw):
            if not stage_enabled(name):
                return
            t0 = time.perf_counter()
            try:
                fn(*a, **kw)
                emit(stage=name, done=True, s=round(time.perf_counter() - t0, 1))
            except Exception as e:  # noqa: BLE001 — stage-independent suite
                emit(stage=name, error=f"{type(e).__name__}: {e}"[:300])
                traceback.print_exc()
        return run
    return deco


def flagship_insts(count=128, seed=0):
    from tsp_gnn_tpu.data import generator
    rng = np.random.default_rng(seed)
    return [generator.generate_instance(
        rng, int(rng.integers(20, 41)), "two_opt", 1) for _ in range(count)]


@guarded("probe")
def probe():
    import jax
    import jax.numpy as jnp
    x = jnp.ones((256, 256))
    y = jax.jit(lambda a: a @ a)(x)
    hard_sync(y)
    emit(stage="probe", devices=str(jax.devices()), ok=True)


@guarded("bench")
def bench_base(insts):
    import jax
    from tsp_gnn_tpu import train as tr
    from tsp_gnn_tpu.config import get_config
    from tsp_gnn_tpu.data.loader import make_dense_batch
    from tsp_gnn_tpu.models import tsp

    cfg = get_config("n40")
    chunk = 16
    batch = make_dense_batch(insts, cfg.data.deviation, 40)
    stacked = tr.device_batch({k: np.stack([v] * chunk)
                               for k, v in batch.items()})
    params = tsp.tsp_init(jax.random.PRNGKey(0), cfg.model)
    opt = tr.make_optimizer(cfg).init(params)
    # train_chunk donates (params, opt): every call rebinds
    t0 = time.perf_counter()
    params, opt, _ = tr.train_chunk(params, opt, stacked, cfg)
    hard_sync(params)
    warm = time.perf_counter() - t0
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        params, opt, _ = tr.train_chunk(params, opt, stacked, cfg)
        hard_sync(params)
    dt = (time.perf_counter() - t0) / reps
    edges = int(batch["n_edges"].sum()) * cfg.model.tmax * chunk
    emit(stage="bench", variant="dense_flagship_chunk16",
         ms_per_step=dt / chunk * 1e3, warmup_s=round(warm, 1),
         edges_per_s=edges / dt)


@guarded("buckets")
def buckets(insts):
    import jax
    from tsp_gnn_tpu import train as tr
    from tsp_gnn_tpu.config import get_config
    from tsp_gnn_tpu.data import generator
    from tsp_gnn_tpu.data.loader import make_dense_batch
    from tsp_gnn_tpu.models import tsp

    cfg = get_config("n40")
    chunk = 16
    pads = (28, 34, 40)
    rng = np.random.default_rng(7)

    def gen():
        while True:
            yield generator.generate_instance(
                rng, int(rng.integers(20, 41)), "two_opt", 1)

    # 3 chunks (one per shape appears naturally in ~the bucket frequency);
    # collect until every bucket shape appeared at least once, max 6 chunks
    queues, chunks = {}, []
    for pad, chunk_insts in tr.bucketize(gen(), cfg.data.batch_size, pads):
        b = make_dense_batch(chunk_insts, cfg.data.deviation, pad)
        q = queues.setdefault(pad, [])
        q.append(b)
        if len(q) == chunk:
            chunks.append({k: np.stack([bb[k] for bb in q]) for k in q[0]})
            queues[pad] = []
        if len(chunks) >= 6:
            break
    params = tsp.tsp_init(jax.random.PRNGKey(0), cfg.model)
    opt = tr.make_optimizer(cfg).init(params)
    # compile each shape
    t0 = time.perf_counter()
    per_shape = {}
    for c in chunks:
        if c["W"].shape in per_shape:
            continue
        params, opt, _ = tr.train_chunk(params, opt, tr.device_batch(c), cfg)
        hard_sync(params)
        per_shape[c["W"].shape] = True
    warm = time.perf_counter() - t0
    # timed mixed sequence
    t0 = time.perf_counter()
    edges = 0
    for c in chunks:
        params, opt, _ = tr.train_chunk(params, opt, tr.device_batch(c), cfg)
        hard_sync(params)
        edges += int(c["n_edges"].sum()) * cfg.model.tmax
    dt = time.perf_counter() - t0
    n_steps = len(chunks) * chunk
    emit(stage="buckets", pads=list(pads), chunks=len(chunks),
         warmup_s=round(warm, 1), ms_per_step=dt / n_steps * 1e3,
         edges_per_s=edges / dt)
    # per-shape step time for the PERF.md table (rebind: donation)
    seen = set()
    for c in chunks:
        if c["W"].shape in seen:
            continue
        seen.add(c["W"].shape)
        t0 = time.perf_counter()
        reps = 2
        for _ in range(reps):
            params, opt, _ = tr.train_chunk(params, opt,
                                            tr.device_batch(c), cfg)
            hard_sync(params)
        dt1 = (time.perf_counter() - t0) / reps
        emit(stage="buckets", shape=str(c["W"].shape),
             ms_per_step=dt1 / chunk * 1e3,
             edges_per_s=int(c["n_edges"].sum()) * cfg.model.tmax / dt1)


@guarded("fusedbwd")
def fusedbwd(insts):
    import jax
    from tsp_gnn_tpu import train as tr
    from tsp_gnn_tpu.config import get_config
    from tsp_gnn_tpu.models import tsp
    from tsp_gnn_tpu.ops import layout
    from tsp_gnn_tpu.models import tsp_sparse

    base = get_config("n40")
    chunk = int(os.environ.get("R4_FBWD_CHUNK", "8"))
    n_insts = int(os.environ.get("R4_FBWD_INSTS", "128"))
    g = layout.build_uniform_block_graph(insts[:n_insts], 0.02, 40)
    batch = tsp_sparse.block_batch_arrays(g)
    stacked = tr.device_batch({k: np.stack([v] * chunk)
                               for k, v in batch.items()})
    edges = int(batch["n_edges"].sum()) * base.model.tmax * chunk

    for bf16 in (True, False):
        for variant, kc in [
            ("sparse_scan", dict(use_pallas=True)),
            ("fused_bwd_g2", dict(use_pallas=True, fused_bwd=True,
                                  bwd_tile=2)),
            ("fused_bwd_g4", dict(use_pallas=True, fused_bwd=True,
                                  bwd_tile=4)),
        ]:
            from tsp_gnn_tpu.config import KernelConfig
            cfg = base.replace(
                train=dataclasses.replace(base.train, layout="sparse",
                                          bf16=bf16),
                kernel=KernelConfig(**kc))
            tag = f"{variant}_{'bf16' if bf16 else 'f32'}"
            try:
                params = tsp.tsp_init(jax.random.PRNGKey(0), cfg.model)
                opt = tr.make_optimizer(cfg).init(params)
                t0 = time.perf_counter()
                params, opt, m = tr.train_chunk(params, opt, stacked, cfg)
                hard_sync(params)
                warm = time.perf_counter() - t0
                t0 = time.perf_counter()
                reps = 3
                for _ in range(reps):
                    params, opt, m = tr.train_chunk(params, opt, stacked,
                                                    cfg)
                    hard_sync(params)
                dt = (time.perf_counter() - t0) / reps
                emit(stage="fusedbwd", variant=tag, warmup_s=round(warm, 1),
                     ms_per_step=dt / chunk * 1e3, edges_per_s=edges / dt,
                     loss=float(m["loss"]))
            except Exception as e:  # noqa: BLE001
                emit(stage="fusedbwd", variant=tag,
                     error=f"{type(e).__name__}: {e}"[:300])


@guarded("sol")
def sol(insts):
    """Per-kernel fraction of speed-of-light [VERDICT r3 #2].

    SOL model per kernel = max(compute, memory) time of an IDEAL kernel:
    memory = minimal bytes it must move (inputs once + outputs once at the
    HBM roofline), compute = minimal MXU flops of the algorithm.  The
    incidence kernels are memory-bound at d=64 (gather/scatter-shaped);
    fraction_of_sol = ideal_time / measured_time.
    """
    import jax
    import jax.numpy as jnp
    from tsp_gnn_tpu.models import tsp_sparse
    from tsp_gnn_tpu.ops import layout, spmm
    from tsp_gnn_tpu.utils import profiling

    K = 200
    g = layout.build_uniform_block_graph(insts, 0.02, 40)
    B = g.num_problems
    batch = {k: jnp.asarray(v)
             for k, v in tsp_sparse.block_batch_arrays(g).items()}
    src2, tgt2, em2 = batch["src2"], batch["tgt2"], batch["em2"]
    d = 64
    N, M = B * g.v_pad, B * g.m_pad
    kw = dict(v_pad=g.v_pad, m_pad=g.m_pad)
    x_v = jax.random.normal(jax.random.PRNGKey(0), (N, d))
    x_e = jax.random.normal(jax.random.PRNGKey(1), (M, d))
    idx_bytes = M * 4 * 3          # src2 + tgt2 + em2 (int32/f32 lanes)
    f32 = 4

    def chain(fn, x0):
        def body(x, _):
            return fn(x), None
        return jax.jit(lambda x: jax.lax.scan(body, x, None, length=K)[0])

    del x_e
    cases = [
        # aggregation ROUND-TRIP v_from_e(e_from_v(x)): shape-preserving, so
        # it chains; ideal bytes = both kernels' minimal traffic (x_v and
        # x_e each read+written once, indices read twice), ideal compute =
        # M*d (gather-add) + 2*M*d (scatter-add)
        ("agg_roundtrip",
         lambda x: spmm.v_from_e(
             src2, tgt2, em2, spmm.e_from_v(src2, tgt2, em2, x, **kw),
             num_problems=B, **kw) * 0.25, x_v,
         2 * (N + M) * d * f32 + 2 * idx_bytes, 3 * M * d),
        # sddmm: reads x_v + indices, writes [M]; ideal = 2*M*d madds.
        # The chain feeds a tiny function of the output back into x so the
        # kernel cannot be DCE'd; the extra [N,d] add + [M] reduction is
        # noise vs the kernel.
        ("sddmm",
         lambda x: x + 1e-20 * jnp.sum(
             spmm.sddmm(src2, tgt2, em2, x, **kw)), x_v,
         (N * d + M) * f32 + idx_bytes, 2 * M * d * 2),
    ]
    for name, fn, x0, bytes_min, flops_min in cases:
        f = chain(fn, x0)
        dt, warm = timed(f, x0, reps=3)
        per_call = dt / K
        r = profiling.roofline(flops_min, bytes_min, per_call)
        emit(stage="sol", kernel=name, us=per_call * 1e6,
             warmup_s=round(warm, 1), **{k: (round(v, 4)
                                             if isinstance(v, float) else v)
                                         for k, v in r.items()})
    # segment-sum: chain on the votes array
    votes2 = em2 * 2.0

    def seg_fn(v):
        out = spmm.segment_sum_per_problem(v, em2, m_pad=g.m_pad,
                                           num_problems=B)
        return v + 1e-9 * out[0, 0]
    f = chain(seg_fn, votes2)
    dt, warm = timed(f, votes2, reps=3)
    per_call = dt / K
    r = profiling.roofline(M, 2 * M * f32 + B * 2 * f32, per_call)
    emit(stage="sol", kernel="segment_sum", us=per_call * 1e6,
         warmup_s=round(warm, 1), **{k: (round(v, 4)
                                         if isinstance(v, float) else v)
                                     for k, v in r.items()})


@guarded("crossover")
def crossover():
    """Dense vs sparse(scan+Pallas) train step across (n, batch) — where do
    the sparse kernels overtake the dense einsum on one chip?"""
    import jax
    from tsp_gnn_tpu import train as tr
    from tsp_gnn_tpu.config import KernelConfig, get_config
    from tsp_gnn_tpu.data import generator
    from tsp_gnn_tpu.data.loader import make_dense_batch
    from tsp_gnn_tpu.models import tsp, tsp_sparse
    from tsp_gnn_tpu.ops import layout

    base = get_config("n40")
    chunk = 4
    shapes = [(40, 64), (40, 128), (40, 256), (100, 16), (100, 32),
              (200, 8)]
    rng = np.random.default_rng(3)
    for n_max, bsz in shapes:
        n_min = {40: 20, 100: 100, 200: 100}[n_max]
        insts = [generator.generate_instance(
            rng, int(rng.integers(n_min, n_max + 1)), "two_opt", 1)
            for _ in range(bsz)]
        for layout_name in ("dense", "sparse"):
            cfg = base.replace(
                data=dataclasses.replace(base.data, n_min=n_min,
                                         n_max=n_max, pad_n=n_max,
                                         batch_size=bsz),
                train=dataclasses.replace(base.train, bf16=True,
                                          layout=layout_name),
                kernel=KernelConfig(use_pallas=True))
            tag = f"n{n_max}_b{bsz}_{layout_name}"
            try:
                batch = tr.build_batch(insts, 0.02, n_max, layout_name)
                stacked = tr.device_batch({k: np.stack([v] * chunk)
                                           for k, v in batch.items()})
                edges = int(batch["n_edges"].sum()) * base.model.tmax * chunk
                params = tsp.tsp_init(jax.random.PRNGKey(0), cfg.model)
                opt = tr.make_optimizer(cfg).init(params)
                t0 = time.perf_counter()
                params, opt, m = tr.train_chunk(params, opt, stacked, cfg)
                hard_sync(params)
                warm = time.perf_counter() - t0
                reps = 2
                t0 = time.perf_counter()
                for _ in range(reps):
                    params, opt, m = tr.train_chunk(params, opt, stacked,
                                                    cfg)
                    hard_sync(params)
                dt = (time.perf_counter() - t0) / reps
                emit(stage="crossover", variant=tag,
                     warmup_s=round(warm, 1), ms_per_step=dt / chunk * 1e3,
                     edges_per_s=edges / dt, loss=float(m["loss"]))
            except Exception as e:  # noqa: BLE001
                emit(stage="crossover", variant=tag,
                     error=f"{type(e).__name__}: {e}"[:300])


def main():
    from tsp_gnn_tpu.utils.system import enable_compilation_cache
    enable_compilation_cache()
    import jax
    assert jax.devices()[0].platform != "cpu", "run on the TPU"
    emit(event="r4_perf_start", t=time.strftime("%F %T"))
    insts = flagship_insts()
    probe()
    bench_base(insts)
    buckets(insts)
    fusedbwd(insts)
    sol(insts)
    crossover()
    emit(event="r4_perf_end", t=time.strftime("%F %T"))


if __name__ == "__main__":
    main()
