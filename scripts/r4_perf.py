"""Round-4 TPU measurement suite (run SOLO on the chip).

Stages (R4_STAGES env, comma-separated, default all):
  probe     — tiny matmul sanity + device print
  bench     — flagship dense step (chunk 16, cached program): era baseline
  buckets   — size-bucketed flagship (28,34,40): mixed-size throughput
  noremat   — scan-form no-remat dense step vs matched remat (the remat
              ceiling probe; win = < 0.75x the remat step)
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


@guarded("noremat")
def noremat(insts):
    """Probe: does a no-remat (or partial-unroll no-remat) dense train step
    compile on today's tunnel era, and does it beat full remat?

    The flagship accepts the 4-forward-equivalent remat ceiling because
    remat=False FULL-UNROLL programs crash the remote compile helper
    (verify notes).  A scan-form (unroll 4) no-remat program is a much
    smaller Mosaic/XLA input — same trick that got the fused backward
    through (rollout_grad.py header) — and its carry saves fit HBM easily
    (32 iters x ~54 MB bf16 at b128).  Win condition: < 0.75x the matched
    remat=True unroll-4 step."""
    import dataclasses

    import jax
    from tsp_gnn_tpu import train as tr
    from tsp_gnn_tpu.config import get_config
    from tsp_gnn_tpu.data.loader import make_dense_batch
    from tsp_gnn_tpu.models import tsp

    base = get_config("n40")
    chunk = 4
    batch = make_dense_batch(insts, base.data.deviation, 40)
    stacked = tr.device_batch({k: np.stack([v] * chunk)
                               for k, v in batch.items()})
    edges = int(batch["n_edges"].sum()) * base.model.tmax * chunk
    for remat, unroll in ((True, 4), (False, 4), (False, 8)):
        tag = f"remat{int(remat)}_unroll{unroll}"
        cfg = base.replace(model=dataclasses.replace(
            base.model, remat=remat, scan_unroll=unroll))
        try:
            params = tsp.tsp_init(jax.random.PRNGKey(0), cfg.model)
            opt = tr.make_optimizer(cfg).init(params)
            t0 = time.perf_counter()
            params, opt, m = tr.train_chunk(params, opt, stacked, cfg)
            hard_sync(params)
            warm = time.perf_counter() - t0
            reps = 4
            t0 = time.perf_counter()
            for _ in range(reps):
                params, opt, m = tr.train_chunk(params, opt, stacked, cfg)
                hard_sync(params)
            dt = (time.perf_counter() - t0) / reps
            emit(stage="noremat", variant=tag, warmup_s=round(warm, 1),
                 ms_per_step=dt / chunk * 1e3, edges_per_s=edges / dt,
                 loss=float(m["loss"]))
        except Exception as e:  # noqa: BLE001
            emit(stage="noremat", variant=tag,
                 error=f"{type(e).__name__}: {e}"[:300])


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

    Each kernel is measured alone (K chained invocations inside ONE jit so
    dispatch/tunnel latency amortizes away) and reported against THREE
    yardsticks:

      * sol_min  — ideal-kernel time: max(minimal HBM bytes / peak BW,
        minimal flops / peak MXU).  The theoretical floor for ANY
        implementation of the op (a gather/scatter at d=64 is memory-bound,
        so this is essentially minimal-bytes / 819 GB/s).
      * mxu_frac — achieved fraction of f32 MXU peak under the kernel's
        ACTUAL algorithm (the one-hot-matmul formulation does M*v_pad*d
        MACs, v_pad/1 more than a gather's M*d adds — the deliberate
        flops-for-layout trade of ops/spmm.py).  The one-hot contraction
        dim is v_pad=40 < 128 lanes, so ~31% is the shape's own ceiling.
      * xla_ref   — the jnp gather/scatter reference (ops/spmm.py *_ref)
        timed IDENTICALLY (same chain, same feedback term): the do-nothing
        alternative the kernels must beat.

    The chain feedback multiplies the carry by (1 + 1e-20*sum(out)) so no
    implementation can dead-code the kernel; the extra full-output reduce
    is paid equally by both implementations.
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
    v_pad = g.v_pad
    N, M = B * v_pad, B * g.m_pad
    kw = dict(v_pad=g.v_pad, m_pad=g.m_pad)
    x_v = jax.random.normal(jax.random.PRNGKey(0), (N, d))
    x_e = jax.random.normal(jax.random.PRNGKey(1), (M, d))
    idx_bytes = M * 4 * 3          # src2 + tgt2 + em2 (int32/f32 lanes)
    f32 = 4
    peak_f32 = profiling.V5E_PEAK_F32_FLOPS

    def chain(fn, x0):
        def body(x, _):
            y = fn(x)
            return x * (1.0 + 1e-20 * jnp.sum(y)), None
        # return a SCALAR of the final carry: hard_sync transfers the jit
        # output over the axon tunnel (~10 MB/s), so returning the carry
        # itself buries the kernel time under megabytes of host pullback
        # (caught in the first round-4 sol run: pallas and jnp "tied" at
        # exactly carry_bytes/tunnel_bw for every kernel)
        return jax.jit(
            lambda x: jnp.sum(jax.lax.scan(body, x, None, length=K)[0]))

    # (name, pallas_fn, ref_fn, carry, bytes_min, flops_min, flops_alg)
    cases = [
        ("e_from_v",
         lambda x: spmm.e_from_v(src2, tgt2, em2, x, **kw),
         lambda x: spmm.e_from_v_ref(src2, tgt2, em2, x, **kw),
         x_v,
         (N * d + M * d) * f32 + idx_bytes,
         2 * M * d,                       # gather-add two endpoints
         2 * M * v_pad * d),              # one [tile_e,v_pad]x[v_pad,d] dot
        ("e_from_v_g8",
         lambda x: spmm.e_from_v_grouped(src2, tgt2, em2, x, group=8,
                                         num_problems=B, **kw),
         lambda x: spmm.e_from_v_ref(src2, tgt2, em2, x, **kw),
         x_v,
         (N * d + M * d) * f32 + idx_bytes,
         2 * M * d, 2 * M * v_pad * d),
        ("e_from_v_g16",
         lambda x: spmm.e_from_v_grouped(src2, tgt2, em2, x, group=16,
                                         num_problems=B, **kw),
         lambda x: spmm.e_from_v_ref(src2, tgt2, em2, x, **kw),
         x_v,
         (N * d + M * d) * f32 + idx_bytes,
         2 * M * d, 2 * M * v_pad * d),
        ("v_from_e",
         lambda x: spmm.v_from_e(src2, tgt2, em2, x, num_problems=B, **kw),
         lambda x: spmm.v_from_e_ref(src2, tgt2, em2, x, num_problems=B,
                                     **kw),
         x_e,
         (M * d + N * d) * f32 + idx_bytes,
         2 * M * d,                       # scatter-add two endpoints
         2 * M * v_pad * d),              # transposed one-hot dot
        ("v_from_e_g8",
         lambda x: spmm.v_from_e_grouped(src2, tgt2, em2, x, group=8,
                                         num_problems=B, **kw),
         lambda x: spmm.v_from_e_ref(src2, tgt2, em2, x, num_problems=B,
                                     **kw),
         x_e,
         (M * d + N * d) * f32 + idx_bytes,
         2 * M * d, 2 * M * v_pad * d),
        ("v_from_e_g16",
         lambda x: spmm.v_from_e_grouped(src2, tgt2, em2, x, group=16,
                                         num_problems=B, **kw),
         lambda x: spmm.v_from_e_ref(src2, tgt2, em2, x, num_problems=B,
                                     **kw),
         x_e,
         (M * d + N * d) * f32 + idx_bytes,
         2 * M * d, 2 * M * v_pad * d),
        ("sddmm",
         lambda x: spmm.sddmm(src2, tgt2, em2, x, **kw),
         lambda x: spmm.sddmm_ref(src2, tgt2, em2, x, **kw),
         x_v,
         (N * d + M) * f32 + idx_bytes,
         2 * M * d * 2,                   # two gathers + per-edge dot
         4 * M * v_pad * d + 2 * M * d),  # two one-hot dots + reduce
        ("sddmm_g8",
         lambda x: spmm.sddmm_grouped(src2, tgt2, em2, x, group=8,
                                      num_problems=B, **kw),
         lambda x: spmm.sddmm_ref(src2, tgt2, em2, x, **kw),
         x_v,
         (N * d + M) * f32 + idx_bytes,
         2 * M * d * 2,
         4 * M * v_pad * d + 2 * M * d),
    ]
    for name, fn, ref_fn, x0, bytes_min, flops_min, flops_alg in cases:
        rows = {}
        for impl, impl_fn in (("pallas", fn), ("xla_ref", ref_fn)):
            try:
                f = chain(impl_fn, x0)
                dt, warm = timed(f, x0, reps=3)
            except Exception as e:  # noqa: BLE001 — per-case isolation
                emit(stage="sol", kernel=name, impl=impl,
                     error=f"{type(e).__name__}: {e}"[:300])
                continue
            per_call = dt / K
            r = profiling.roofline(flops_min, bytes_min, per_call)
            rows[impl] = per_call
            emit(stage="sol", kernel=name, impl=impl,
                 us=round(per_call * 1e6, 1), warmup_s=round(warm, 1),
                 gbps_min=round(bytes_min / per_call / 1e9, 1),
                 sol_min_frac=round(r["fraction_of_sol"], 4),
                 bound=r["bound"],
                 tflops_alg=round(flops_alg / per_call / 1e12, 2),
                 mxu_frac=round(flops_alg / per_call / peak_f32, 4))
        if len(rows) == 2:
            emit(stage="sol", kernel=name,
                 speedup_vs_xla=round(rows["xla_ref"] / rows["pallas"], 2))
    # segment-sum: memory-bound pure reduce, chain on the votes array
    votes2 = em2 * 2.0
    seg_cases = [
        ("pallas", lambda v: spmm.segment_sum_per_problem(
            v, em2, m_pad=g.m_pad, num_problems=B)),
        ("xla_ref", lambda v: spmm.segment_sum_ref(
            v, em2, m_pad=g.m_pad, num_problems=B)),
    ]
    seg_rows = {}
    for impl, seg in seg_cases:
        def seg_fn(v, seg=seg):
            return seg(v)
        f = chain(seg_fn, votes2)
        dt, warm = timed(f, votes2, reps=3)
        per_call = dt / K
        bytes_min = 2 * M * f32 + B * 2 * f32
        r = profiling.roofline(3 * M, bytes_min, per_call)
        seg_rows[impl] = per_call
        emit(stage="sol", kernel="segment_sum", impl=impl,
             us=round(per_call * 1e6, 1), warmup_s=round(warm, 1),
             gbps_min=round(bytes_min / per_call / 1e9, 1),
             sol_min_frac=round(r["fraction_of_sol"], 4), bound=r["bound"])
    emit(stage="sol", kernel="segment_sum",
         speedup_vs_xla=round(seg_rows["xla_ref"] / seg_rows["pallas"], 2))


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
    noremat(insts)
    fusedbwd(insts)
    sol(insts)
    crossover()
    emit(event="r4_perf_end", t=time.strftime("%F %T"))


if __name__ == "__main__":
    main()
