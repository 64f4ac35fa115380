"""Benchmark: edges/s/chip in the message-passing training loop [B:L2].

Runs the flagship n=40 decision-TSP training step (forward tmax scan +
backward + Adam) on the attached chip and reports edge-updates per second
(real edges x tmax per step / step time).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline: BASELINE.json has no published throughput ("published": {},
SURVEY §6) — reported as the ratio to PERF.md's honest round-1 hand
measurement (~11M edge-updates/s steady-state) so the ratio tracks real
progress instead of round-1's bogus artifact (VERDICT Weak #1).

Measurement discipline (VERDICT "Next round" #2):
  * every timed dispatch is forced to a TRUE host sync by pulling one
    updated-parameter leaf to host memory via np.asarray — the axon
    backend's block_until_ready on a donated chain's loss under-waited and
    produced a 33x-over-speed-of-light number in round 1;
  * a physical-plausibility guard computes achieved TFLOP/s from an
    analytical per-step FLOP count and HARD-FAILS (exit 1) if it exceeds
    the chip's peak (utils/profiling.py roofline constants).
"""
import json
import os
import sys
import time

# Honest round-1 steady-state reference (PERF.md "Headline"): the ratio
# baseline for vs_baseline until a published number exists.
R1_HONEST_EDGES_PER_S = 11e6


def dense_flops_per_step(B: int, n: int, m: int, d: int, tmax: int,
                         mlp_depth: int = 3, remat: bool = True) -> float:
    """Analytical FLOPs of one optimizer step on the dense-padded path.

    Per problem per MP iteration: message MLPs (depth x 2*d^2 per element on
    m edges + n vertices), LSTM linears (2d->4d: 16*d^2 per element), and the
    two incidence einsums (2*m*n*d each direction).  Backward ~2x forward;
    remat re-runs the forward once more.
    """
    per_iter = (2 * mlp_depth + 16) * d * d * (m + n) + 4 * m * n * d
    fwd = B * tmax * per_iter
    mult = 3.0 + (1.0 if remat else 0.0)   # fwd + 2x bwd (+ remat fwd)
    return fwd * mult


def bucketed_bench(cfg, chunk: int, buckets_env: str):
    """Size-bucketed flagship bench (train.py --buckets workload).

    One chunk per bucket is built with content-matched instances (n in the
    bucket's range under the preset's n ~ U{n_min..n_max}) and timed
    separately with pre-staged device batches; the reported number is the
    steady-state mixed throughput sum(p_b * edges_b) / sum(p_b * time_b)
    with p_b = the bucket's probability mass.  This equals the long-run
    throughput of the bucketed stream while keeping generation cost at one
    batch per bucket (raw per-bucket rows: results/bucket_sweep.jsonl)."""
    import jax
    import numpy as np

    from tsp_gnn_tpu import train as tr
    from tsp_gnn_tpu.data import generator
    from tsp_gnn_tpu.data.loader import make_dense_batch
    from tsp_gnn_tpu.models import tsp
    from tsp_gnn_tpu.utils import profiling

    buckets = tuple(sorted(int(x) for x in buckets_env.split(",")))
    assert buckets[-1] >= cfg.data.n_max
    reps = max(1, int(os.environ.get("BENCH_STEPS", "48"))
               // chunk // len(buckets))
    rng = np.random.default_rng(1)

    params = tsp.tsp_init(jax.random.PRNGKey(0), cfg.model)
    opt_state = tr.make_optimizer(cfg).init(params)

    def sync(p):
        np.asarray(jax.tree.leaves(p)[0])

    peak = (profiling.V5E_PEAK_BF16_FLOPS if cfg.train.bf16
            else profiling.V5E_PEAK_F32_FLOPS)
    total_w = total_wt = total_we = total_wf = 0.0
    warmup_s = 0.0
    prev = cfg.data.n_min - 1
    for pad in buckets:
        lo = max(cfg.data.n_min, prev + 1)
        hi = min(pad, cfg.data.n_max)
        prev = pad
        if hi < lo:
            continue
        w = hi - lo + 1          # bucket probability mass (uniform n)
        insts = [generator.generate_instance(
            rng, int(rng.integers(lo, hi + 1)), "two_opt", 1)
            for _ in range(cfg.data.batch_size)]
        batch = make_dense_batch(insts, cfg.data.deviation, pad)
        stacked = tr.device_batch({k: np.stack([v] * chunk)
                                   for k, v in batch.items()})
        t0 = time.perf_counter()
        params, opt_state, _ = tr.train_chunk(params, opt_state, stacked,
                                              cfg)
        sync(params)
        warmup_s += time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(reps):
            params, opt_state, _ = tr.train_chunk(params, opt_state,
                                                  stacked, cfg)
            sync(params)
        dt = (time.perf_counter() - t0) / reps
        edges = int(batch["n_edges"].sum()) * cfg.model.tmax * chunk
        flops = dense_flops_per_step(
            int(batch["labels"].shape[0]), pad, int(batch["W"].shape[1]),
            cfg.model.d, cfg.model.tmax, mlp_depth=cfg.model.mlp_depth,
            remat=cfg.model.remat) * chunk
        total_w += w
        total_wt += w * dt
        total_we += w * edges
        total_wf += w * flops
        print(f"[bench bucket pad={pad} n={lo}-{hi}] "
              f"{dt/chunk*1e3:.1f} ms/step | "
              f"{edges/dt/1e6:.2f}M edge-updates/s", file=sys.stderr)

    eps = total_we / total_wt
    achieved = total_wf / total_wt
    cache_hit = warmup_s < 120.0 * len(buckets)   # heuristic, as in main()
    if achieved > peak:
        print(json.dumps({"metric": "edges_per_s_per_chip", "value": None,
                          "unit": "edge-updates/s", "vs_baseline": None,
                          "error": f"IMPLAUSIBLE: {achieved/1e12:.1f} TFLOP/s"
                                   f" > peak {peak/1e12:.0f}"}))
        sys.exit(1)
    print(f"[bench bucketed {buckets}] {eps/1e6:.2f}M edge-updates/s "
          f"(mixed steady state) | {achieved/1e12:.2f} TFLOP/s "
          f"({100*achieved/peak:.1f}% of peak) | warmup {warmup_s:.1f}s",
          file=sys.stderr)
    print(json.dumps({"metric": "edges_per_s_per_chip", "value": eps,
                      "unit": "edge-updates/s",
                      "vs_baseline": round(eps / R1_HONEST_EDGES_PER_S, 4),
                      "warmup_s": round(warmup_s, 1),
                      "compile_cache_hit_heuristic": cache_hit,
                      "buckets": list(buckets)}))


def _pad_from_m(m_pad: int) -> int:
    """Invert m = n(n-1)/2 for the FLOP model."""
    n = int((1 + (1 + 8 * m_pad) ** 0.5) / 2)
    return n


def main():
    import jax
    import numpy as np

    from tsp_gnn_tpu import train as tr
    from tsp_gnn_tpu.config import get_config
    from tsp_gnn_tpu.data import generator
    from tsp_gnn_tpu.data.loader import make_dense_batch
    from tsp_gnn_tpu.models import tsp
    from tsp_gnn_tpu.utils import profiling
    from tsp_gnn_tpu.utils.system import enable_compilation_cache

    enable_compilation_cache()
    cfg = get_config("n40")  # n in [20,40], batch 128 instances, tmax 32
    n_pad = cfg.data.pad_n
    rng = np.random.default_rng(0)
    # batch_size INSTANCES (each dual-labeled into 2 problems) — the exact
    # workload train.py dispatches for this preset
    insts = [generator.generate_instance(
        rng, int(rng.integers(cfg.data.n_min, cfg.data.n_max + 1)),
        "two_opt", restarts=1) for _ in range(cfg.data.batch_size)]
    batch = make_dense_batch(insts, cfg.data.deviation, n_pad)

    params = tsp.tsp_init(jax.random.PRNGKey(0), cfg.model)
    opt_state = tr.make_optimizer(cfg).init(params)

    # production path: CHUNK optimizer steps per dispatch (train.py --chunk);
    # 16 measured fastest (129.4->123.4 ms/step vs 8 at the flagship
    # unroll-32 program, results/step_sweep_r3.jsonl)
    chunk = int(os.environ.get("BENCH_CHUNK", "16"))

    # Size-bucketed batching is the n40 preset's production path (round 4:
    # 47.9M vs 29.3M edge-updates/s, config.py _preset_n40) and therefore
    # the default bench workload — the mixed-size steady-state throughput
    # weights each bucket by its natural frequency under n ~ U{20..40}.
    # BENCH_BUCKETS="28,34,40" overrides the bucket set; BENCH_BUCKETS=""
    # (empty) forces the legacy single-pad unbucketed measurement.
    buckets_env = os.environ.get("BENCH_BUCKETS")
    if buckets_env is None and cfg.data.bucket_pads:
        buckets_env = ",".join(str(b) for b in cfg.data.bucket_pads)
    if buckets_env:
        return bucketed_bench(cfg, chunk, buckets_env)
    stacked = tr.device_batch({k: np.stack([v] * chunk)
                               for k, v in batch.items()})

    def sync(p):
        """TRUE sync: pull one updated-param leaf into host memory — the
        leaf depends on the entire fwd+bwd+Adam chain, so the transfer
        cannot complete before the device work has."""
        leaf = jax.tree.leaves(p)[0]
        np.asarray(leaf)

    # warmup / compile.  The wall time of this first dispatch identifies the
    # cache state: a persistent-cache hit completes in seconds, a fresh
    # remote compile takes minutes — and on bad compile-service eras the
    # fresh program is also up to 3.2x SLOWER at runtime (PERF.md "Backend
    # variance").  Logged so BENCH_r{N}.json records which era/cache-state
    # produced the number [VERDICT r2 #2].
    t_warm = time.perf_counter()
    params, opt_state, m = tr.train_chunk(params, opt_state, stacked, cfg)
    sync(params)
    warmup_s = time.perf_counter() - t_warm
    # HEURISTIC, machine/toolchain-specific [ADVICE r3]: on THIS tunnel a
    # cached-executable load of the fully-unrolled flagship program is
    # ~50 s (deserialization) and a true fresh remote compile is ~8 min;
    # warmup_s itself is the recorded fact, the boolean just labels it
    cache_hit = warmup_s < 120.0

    iters = max(1, int(os.environ.get("BENCH_STEPS", "40")) // chunk)
    t0 = time.perf_counter()
    for _ in range(iters):
        params, opt_state, m = tr.train_chunk(params, opt_state, stacked, cfg)
        sync(params)
    dt = time.perf_counter() - t0

    edge_updates = int(batch["n_edges"].sum()) * cfg.model.tmax * chunk * iters
    eps = edge_updates / dt

    # ---- physical-plausibility guard (VERDICT Weak #1) ----
    B = int(batch["labels"].shape[0])
    m_pad = int(batch["W"].shape[1])
    flops_step = dense_flops_per_step(B, n_pad, m_pad, cfg.model.d,
                                      cfg.model.tmax,
                                      mlp_depth=cfg.model.mlp_depth,
                                      remat=cfg.model.remat)
    achieved_flops = flops_step * chunk * iters / dt
    peak = (profiling.V5E_PEAK_BF16_FLOPS if cfg.train.bf16
            else profiling.V5E_PEAK_F32_FLOPS)
    if achieved_flops > peak:
        print(json.dumps({
            "metric": "edges_per_s_per_chip", "value": None,
            "unit": "edge-updates/s", "vs_baseline": None,
            "error": f"IMPLAUSIBLE: {achieved_flops/1e12:.1f} TFLOP/s "
                     f"> chip peak {peak/1e12:.0f} — timing under-waited",
        }))
        sys.exit(1)
    print(f"[bench] {eps/1e6:.2f}M edge-updates/s | "
          f"{achieved_flops/1e12:.2f} TFLOP/s "
          f"({100*achieved_flops/peak:.1f}% of peak) | "
          f"step {dt/iters/chunk*1e3:.1f} ms | "
          f"warmup {warmup_s:.1f}s ({'cache hit' if cache_hit else 'FRESH COMPILE — era-sensitive'})",
          file=sys.stderr)

    print(json.dumps({"metric": "edges_per_s_per_chip", "value": eps,
                      "unit": "edge-updates/s",
                      "vs_baseline": round(eps / R1_HONEST_EDGES_PER_S, 4),
                      "warmup_s": round(warmup_s, 1),
                      "compile_cache_hit_heuristic": cache_hit}))


if __name__ == "__main__":
    main()
