"""Training loop for decision-TSP.

Parity target: the reference's train.py [SURVEY §2.1 C7, §3.2] — epochs of
`batches_per_epoch` batches of `batch_size` instances (paper: 128x16), Adam
2e-5 with global-norm clipping, per-epoch log line + checkpoint.

TPU-native: one jitted train step (forward scan + grad + Adam fused by XLA),
buffer donation, optional bf16 compute, curriculum over instance size and
deviation [B:L8], JSONL metrics with edges/s/chip [B:L2], pickle/orbax
checkpoints with full resume state.
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import time
from typing import Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tsp_gnn_tpu.config import Config, get_config
from tsp_gnn_tpu.data import generator
from tsp_gnn_tpu.data.loader import make_dense_batch
from tsp_gnn_tpu.models import tsp
from tsp_gnn_tpu.utils import checkpoint as ckpt
from tsp_gnn_tpu.utils.metrics import MetricsLogger


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(cfg.train.grad_clip),
        optax.adam(cfg.train.lr),
    )


def _cast_bf16(tree):
    return jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if getattr(x, "dtype", None) == jnp.float32 else x, tree)


def _model_loss(params, batch, cfg: Config):
    """Layout dispatch: dense padded batches vs block-diagonal sparse batches
    (Pallas SpMM or fused-rollout forward per cfg.kernel).  v_pad/m_pad are
    recovered from the (static-under-jit) batch shapes."""
    if cfg.train.layout == "dense":
        return tsp.loss_fn(params, batch, cfg.model)
    from tsp_gnn_tpu.models import tsp_sparse
    B = batch["labels"].shape[0]
    m_pad = batch["edge_mask"].shape[0] // B
    v_pad = batch["vert_mask"].shape[0] // B
    kc = cfg.kernel
    if kc.fused or kc.fused_bwd:
        if kc.fused_bwd:
            from tsp_gnn_tpu.ops import rollout_grad
            logits = rollout_grad.forward_fused_train(
                params, batch, cfg.model, v_pad=v_pad, m_pad=m_pad,
                group=kc.bwd_tile, bwd_f32=kc.bwd_f32).astype(jnp.float32)
        else:
            logits_fn = tsp_sparse.make_fused_logits(
                cfg.model, v_pad=v_pad, m_pad=m_pad, group=kc.batch_tile)
            logits = logits_fn(params, batch).astype(jnp.float32)
        labels = batch["labels"].astype(jnp.float32)
        loss = jnp.mean(jnp.maximum(logits, 0) - logits * labels
                        + jnp.log1p(jnp.exp(-jnp.abs(logits))))
        acc = jnp.mean(((logits > 0).astype(jnp.float32) == labels)
                       .astype(jnp.float32))
        return loss, {"loss": loss, "accuracy": acc, "logits": logits}
    return tsp_sparse.loss_fn_sparse(
        params, batch, cfg.model, v_pad=v_pad, m_pad=m_pad,
        use_pallas=kc.use_pallas, tile_e=kc.tile_e,
        agg_group=kc.agg_group)


def _loss_and_grads(params, batch, cfg: Config):
    def loss(p):
        if cfg.train.bf16:
            # mixed precision: f32 master params, bf16 compute (grads flow
            # back through the cast to the f32 masters) [B:L10]
            return _model_loss(_cast_bf16(p), _cast_bf16(batch), cfg)
        return _model_loss(p, batch, cfg)
    return jax.value_and_grad(loss, has_aux=True)(params)


def _step(params, opt_state, batch, cfg: Config):
    (l, aux), grads = _loss_and_grads(params, batch, cfg)
    updates, opt_state = make_optimizer(cfg).update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    gnorm = optax.global_norm(grads)
    return params, opt_state, {"loss": l, "accuracy": aux["accuracy"],
                               "grad_norm": gnorm}


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0, 1))
def train_step(params, opt_state, batch, cfg: Config):
    return _step(params, opt_state, batch, cfg)


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0, 1))
def train_chunk(params, opt_state, batches, cfg: Config):
    """K optimizer steps per dispatch (batches: dict of [K, ...] arrays).

    The axon tunnel costs ~35ms per jit call; scanning K steps inside one
    call amortises it (measured: 162 -> ~130 ms/step at K=8, n40 preset)."""
    def body(carry, b):
        p, o = carry
        p, o, m = _step(p, o, b, cfg)
        return (p, o), m
    (params, opt_state), ms = jax.lax.scan(body, (params, opt_state), batches)
    return params, opt_state, jax.tree.map(lambda x: x.mean(), ms)


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0, 1))
def train_accum_step(params, opt_state, batches, cfg: Config):
    """ONE optimizer step whose gradient is accumulated over K micro-batches
    (batches: dict of [K, ...] arrays) inside a single dispatch.

    Delivers BASELINE configs[3]'s 4k-instance-batch SEMANTICS with
    compile-safe program shapes [VERDICT r2 #3]: the tunnel's compile
    service caps executable programs at ~256 instances, so the large_batch
    preset runs 16x256-instance micro-batches per step.  Equal-sized
    micro-batches make mean-of-micro-grads == the monolithic big-batch
    gradient (mean loss over the union), so clipping + Adam see identical
    inputs; verified vs the single-dispatch big batch in
    tests/test_train_smoke.py.
    """
    def body(carry, b):
        gsum, lsum, asum = carry
        (l, aux), grads = _loss_and_grads(params, b, cfg)
        return (jax.tree.map(jnp.add, gsum, grads),
                lsum + l, asum + aux["accuracy"]), None
    K = jax.tree.leaves(batches)[0].shape[0]
    zero = jax.tree.map(jnp.zeros_like, params)
    (gsum, lsum, asum), _ = jax.lax.scan(
        body, (zero, jnp.zeros(()), jnp.zeros(())), batches)
    grads = jax.tree.map(lambda g: g / K, gsum)
    updates, opt_state = make_optimizer(cfg).update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, {"loss": lsum / K, "accuracy": asum / K,
                               "grad_norm": optax.global_norm(grads)}


@functools.partial(jax.jit, static_argnames=("cfg",))
def eval_step(params, batch, cfg: Config):
    _, aux = tsp.loss_fn(params, batch, cfg.model)
    return {"loss": aux["loss"], "accuracy": aux["accuracy"]}


class Curriculum:
    """Instance-size + deviation curriculum [B:L8, SURVEY §2.6].

    Size ramps linearly from (n_min, n_min+span0) to (n_min, n_max) over
    `ramp_epochs`; deviation stays at cfg.data.deviation by default but can
    anneal from `dev_start` down to the target (harder) value.
    """

    def __init__(self, cfg: Config, ramp_epochs: int = 0,
                 dev_start: Optional[float] = None):
        self.cfg = cfg
        self.ramp_epochs = ramp_epochs
        self.dev_start = dev_start

    def at_epoch(self, epoch: int) -> Tuple[int, int, float]:
        d = self.cfg.data
        if self.ramp_epochs and epoch < self.ramp_epochs:
            frac = epoch / max(1, self.ramp_epochs)
            n_hi = int(round(d.n_min + frac * (d.n_max - d.n_min)))
        else:
            n_hi = d.n_max
        dev = d.deviation
        if self.dev_start is not None and self.ramp_epochs:
            frac = min(1.0, epoch / max(1, self.ramp_epochs))
            dev = self.dev_start + frac * (d.deviation - self.dev_start)
        return d.n_min, max(d.n_min, n_hi), dev

    def state(self, epoch: int) -> dict:
        lo, hi, dev = self.at_epoch(epoch)
        return {"cur_n_min": lo, "cur_n_max": hi, "cur_deviation": dev}


def build_batch(insts, deviation: float, pad_n: int,
                layout: str = "dense") -> Dict[str, np.ndarray]:
    """Instances -> feed-ready batch in the requested layout."""
    if layout == "dense":
        return make_dense_batch(insts, deviation, pad_n)
    from tsp_gnn_tpu.models.tsp_sparse import block_batch_arrays
    from tsp_gnn_tpu.ops.layout import build_uniform_block_graph
    return block_batch_arrays(build_uniform_block_graph(insts, deviation,
                                                        pad_n))


def bucketize(instances: Iterator[Dict], batch_size: int,
              buckets) -> Iterator[Tuple[int, list]]:
    """Group an instance stream into (pad_n, batch) pairs, each batch holding
    `batch_size` instances padded to the smallest bucket >= its n.

    Size-bucketed batching [SURVEY §2.5 batching is ours to design]: the
    single-pad dense layout spends ~42% of its edge compute on padding at
    the flagship distribution (pad 40, E[n]=30); bucketing recovers it.
    """
    buckets = sorted(buckets)
    pending: Dict[int, list] = {b: [] for b in buckets}
    for inst in instances:
        n = int(inst["n"])
        b = next((b for b in buckets if b >= n), None)
        assert b is not None, f"instance n={n} exceeds largest bucket"
        pending[b].append(inst)
        if len(pending[b]) == batch_size:
            yield b, pending[b]
            pending[b] = []


def batch_stream(cfg: Config, seed: int, curriculum: Optional[Curriculum] = None,
                 epoch: int = 0) -> Iterator[Dict[str, np.ndarray]]:
    """On-the-fly instance generation -> feed-ready batches."""
    d = cfg.data
    lo, hi, dev = (curriculum.at_epoch(epoch) if curriculum
                   else (d.n_min, d.n_max, d.deviation))
    pad_n = d.pad_n or d.n_max
    if d.stream_workers > 0:
        from tsp_gnn_tpu.data.pipeline import parallel_instance_batches
        inst_batches = parallel_instance_batches(
            seed, d.batch_size, lo, hi, d.solver, d.two_opt_restarts,
            workers=d.stream_workers)
        if d.bucket_pads:
            insts = (i for bb in inst_batches for i in bb)
            for pad, chunk in bucketize(insts, d.batch_size, d.bucket_pads):
                yield build_batch(chunk, dev, pad, cfg.train.layout)
        else:
            for insts in inst_batches:
                yield build_batch(insts, dev, pad_n, cfg.train.layout)
        return
    rng = np.random.default_rng(seed)

    def gen():
        while True:
            yield generator.generate_instance(
                rng, int(rng.integers(lo, hi + 1)), d.solver,
                d.two_opt_restarts)

    if d.bucket_pads:
        for pad, chunk in bucketize(gen(), d.batch_size, d.bucket_pads):
            yield build_batch(chunk, dev, pad, cfg.train.layout)
        return
    while True:
        insts = [next(gen()) for _ in range(d.batch_size)]
        yield build_batch(insts, dev, pad_n, cfg.train.layout)


def edges_per_step(batch: Dict[str, np.ndarray], tmax: int) -> int:
    """Edge-updates processed per optimiser step: real edges x tmax iters."""
    return int(batch["n_edges"].sum()) * tmax


def device_batch(batch: Dict[str, np.ndarray], dtype=jnp.float32):
    cast = {"W", "C", "edge_mask", "vertex_mask", "labels"}
    return {k: jnp.asarray(v, dtype if k in cast else None)
            for k, v in batch.items()}


def train(cfg: Config, epochs: Optional[int] = None, seed: int = 0,
          log_dir: Optional[str] = None, curriculum_ramp: int = 0,
          eval_instances: int = 64, data_path: Optional[str] = None,
          dev_start: Optional[float] = None, chunk: int = 1,
          profile_dir: Optional[str] = None) -> dict:
    """data_path: directory of npz shards / .graph files (reference-style
    pre-generated training set); None = on-the-fly generation.

    cfg.train.accum > 1: each dispatch is ONE optimizer step accumulating
    that many micro-batches (effective batch = batch_size * accum,
    BASELINE configs[3]); mutually exclusive with chunk > 1."""
    epochs = epochs if epochs is not None else cfg.train.epochs
    log_dir = log_dir or cfg.train.log_path
    logger = MetricsLogger(os.path.join(log_dir, "metrics.jsonl"))
    ckpt_dir = os.path.join(log_dir, "checkpoints")

    key = jax.random.PRNGKey(seed)
    params = tsp.tsp_init(key, cfg.model)
    opt_state = make_optimizer(cfg).init(params)
    start_epoch = 0
    step = 0

    latest = ckpt.latest_checkpoint(ckpt_dir) if cfg.train.resume else None
    if latest:
        # template restore: .npz checkpoints carry leaves + key paths, not
        # Python structure — the fresh (params, opt_state) trees above give
        # the optax NamedTuple skeleton back (pickle files ignore `like`)
        state = ckpt.load_checkpoint(latest, like={
            "params": params, "opt_state": opt_state, "epoch": 0, "step": 0,
            "seed": 0,
            "curriculum": {"cur_n_min": 0, "cur_n_max": 0,
                           "cur_deviation": 0.0}})
        params, opt_state = state["params"], state["opt_state"]
        start_epoch, step = int(state["epoch"]) + 1, int(state["step"])
        logger.log(event="resume", checkpoint=latest, epoch=start_epoch)

    cur = Curriculum(cfg, ramp_epochs=curriculum_ramp, dev_start=dev_start)
    file_loader = None
    if data_path is not None:
        from tsp_gnn_tpu.data.loader import InstanceLoader
        file_loader = InstanceLoader(data_path, deviation=cfg.data.deviation,
                                     pad_n=cfg.data.pad_n or cfg.data.n_max,
                                     shuffle_seed=seed)
    # fixed held-out eval set at the full difficulty
    d = cfg.data
    eval_rng = np.random.default_rng(seed + 10_000)
    eval_insts = [generator.generate_instance(
        eval_rng, int(eval_rng.integers(d.n_min, d.n_max + 1)), d.solver,
        d.two_opt_restarts) for _ in range(eval_instances)]
    eval_batch = device_batch(make_dense_batch(
        eval_insts, d.deviation, d.pad_n or d.n_max))

    final = {}
    # best-eval tracking feeds checkpoint pruning (the best epoch is never
    # pruned); on resume, recover the running best from metrics.jsonl
    best_eval_acc, best_epoch = -float("inf"), None
    if start_epoch and os.path.exists(logger.path):
        with open(logger.path) as f:
            for line in f:
                try:
                    row = json.loads(line)
                except json.JSONDecodeError:
                    continue
                # best tracking only considers CHECKPOINTED epochs (with
                # checkpoint_every > 1 a non-checkpointed best would make
                # pruning protect a nonexistent file) [ADVICE r2]
                if (row.get("event") == "epoch" and "eval_acc" in row
                        and (int(row["epoch"]) + 1)
                        % cfg.train.checkpoint_every == 0
                        and row["eval_acc"] >= best_eval_acc):
                    best_eval_acc = row["eval_acc"]
                    best_epoch = int(row["epoch"])
    for epoch in range(start_epoch, epochs):
        if file_loader is not None:
            # curricula over deviation AND size apply to file batches [B:L8]
            _, n_hi, dev = cur.at_epoch(epoch)
            file_loader.max_n = n_hi if n_hi < cfg.data.n_max else None

            def fresh_stream():
                inst_batches = file_loader.get_instance_batches(
                    cfg.data.batch_size)
                if cfg.data.bucket_pads:
                    insts = (i for bb in inst_batches for i in bb)
                    return (build_batch(chunk, dev, pad, cfg.train.layout)
                            for pad, chunk in bucketize(
                                insts, cfg.data.batch_size,
                                cfg.data.bucket_pads))
                return (build_batch(chunk, dev, file_loader.pad_n,
                                    cfg.train.layout)
                        for chunk in inst_batches)
        else:
            # defined for BOTH sources: next_batch's StopIteration recovery
            # calls it, and a finite generated stream (e.g. a bounded worker
            # pool) must restart too, not NameError [VERDICT r3 weak #4]
            def fresh_stream(epoch=epoch):
                return batch_stream(cfg, seed + epoch, cur, epoch)
        stream = fresh_stream()
        t_epoch = time.time()
        edge_updates = 0
        losses, accs = [], []

        def next_batch():
            nonlocal stream
            try:
                return next(stream)
            except StopIteration:  # file loader exhausted: reshuffle + cycle
                stream = fresh_stream()
                try:
                    return next(stream)
                except StopIteration:
                    raise RuntimeError(
                        f"dataset at {data_path} has fewer instances than "
                        f"batch_size={cfg.data.batch_size}") from None

        accum = cfg.train.accum
        assert accum == 1 or chunk == 1, "--accum excludes --chunk"
        group = accum if accum > 1 else chunk
        assert cfg.train.batches_per_epoch % group == 0

        def chunk_gen():
            """Host-side batch assembly, prefetched off the device path.

            device_batch must run on the MAIN thread: issuing the
            host->device copies from the prefetch producer thread deadlocks
            the axon tunnel runtime (every thread ends up futex-waiting;
            observed 2026-08-17 on the first run after trying it).  Transfer
            dispatch is async anyway, so the critical-path cost is small."""
            nonlocal edge_updates
            # chunks are grouped BY SHAPE: with bucketed batching the stream
            # interleaves bucket sizes, and a stacked dispatch needs uniform
            # arrays.  Without buckets every batch has the same shape and
            # this degenerates to the simple sequential grouping.
            queues: Dict[tuple, list] = {}
            emitted = 0
            while emitted < cfg.train.batches_per_epoch // group:
                b = next_batch()
                q = queues.setdefault(b["W"].shape, [])
                q.append(b)
                if len(q) < group:
                    continue
                queues[b["W"].shape] = []
                emitted += 1
                for bb in q:
                    edge_updates += edges_per_step(bb, cfg.model.tmax)
                if group == 1:
                    yield q[0]
                else:
                    yield {k: np.stack([bb[k] for bb in q]) for k in q[0]}

        from tsp_gnn_tpu.data.pipeline import prefetch
        from tsp_gnn_tpu.utils.profiling import maybe_trace
        for i, stacked in enumerate(prefetch(chunk_gen(), depth=2)):
            # profile exactly one steady-state chunk of the first epoch
            do_trace = (profile_dir and epoch == start_epoch and i == 1)
            with maybe_trace(profile_dir if do_trace else None):
                if accum > 1:
                    params, opt_state, m = train_accum_step(
                        params, opt_state, device_batch(stacked), cfg)
                elif chunk == 1:
                    params, opt_state, m = train_step(
                        params, opt_state, device_batch(stacked), cfg)
                else:
                    params, opt_state, m = train_chunk(
                        params, opt_state, device_batch(stacked), cfg)
                if do_trace:
                    jax.block_until_ready(m["loss"])
            loss_f, gnorm_f = float(m["loss"]), float(m["grad_norm"])
            if not (np.isfinite(loss_f) and np.isfinite(gnorm_f)):
                # NaN/overflow sanitizer [SURVEY §5 "Race detection /
                # sanitizers"]: fail-stop with an explicit event instead of
                # silently burning epochs on poisoned params — the latest
                # checkpoint is the recovery point (same philosophy as the
                # multi-host fail-stop in parallel/launcher.py).
                logger.log(event="nan_halt", epoch=epoch, step=step,
                           loss=loss_f, grad_norm=gnorm_f)
                logger.close()
                raise FloatingPointError(
                    f"non-finite training state at epoch {epoch} step {step}"
                    f" (loss={loss_f}, grad_norm={gnorm_f}); resume from the"
                    f" last checkpoint in {ckpt_dir}")
            losses.append(loss_f)
            accs.append(float(m["accuracy"]))
            step += 1 if accum > 1 else chunk
        dt = time.time() - t_epoch
        em = eval_step(params, eval_batch, cfg)
        final = logger.log(
            event="epoch", epoch=epoch, step=step,
            train_loss=float(np.mean(losses)), train_acc=float(np.mean(accs)),
            eval_loss=float(em["loss"]), eval_acc=float(em["accuracy"]),
            edges_per_s=edge_updates / dt, epoch_s=dt,
            **cur.state(epoch))
        if (epoch + 1) % cfg.train.checkpoint_every == 0:
            if float(em["accuracy"]) >= best_eval_acc:
                best_eval_acc, best_epoch = float(em["accuracy"]), epoch
            ckpt.save_checkpoint(
                os.path.join(ckpt_dir, f"ckpt_{epoch}.npz"),
                {"params": params, "opt_state": opt_state, "epoch": epoch,
                 "step": step, "seed": seed,
                 "curriculum": cur.state(epoch)})
            keep = (best_epoch,) if best_epoch is not None else ()
            ckpt.prune_checkpoints(ckpt_dir, cfg.train.keep_checkpoints,
                                   keep_epochs=keep)
    logger.close()
    return {"params": params, "opt_state": opt_state, "metrics": final}


def main(argv=None):
    p = argparse.ArgumentParser(description="Train decision-TSP typed-GNN")
    p.add_argument("--preset", default="pr1", help="config preset name")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log-dir", default=None)
    p.add_argument("--curriculum-ramp", type=int, default=0)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--lr", type=float, default=None,
                   help="Adam learning rate (default: preset value 2e-5)")
    p.add_argument("--tmax", type=int, default=None)
    p.add_argument("--deviation", type=float, default=None,
                   help="override the preset's cost deviation (lift-off "
                        "recipe: train at a larger deviation first, then "
                        "fine-tune down — see train_spmd --deviation)")
    p.add_argument("--data-path", default=None,
                   help="directory of npz shards / .graph files; "
                        "default: generate instances on the fly")
    p.add_argument("--dev-start", type=float, default=None,
                   help="curriculum: initial deviation, annealed to the "
                        "config deviation over --curriculum-ramp epochs")
    p.add_argument("--chunk", type=int, default=1,
                   help="optimizer steps per device dispatch (amortises "
                        "the per-call tunnel latency)")
    p.add_argument("--accum", type=int, default=None,
                   help="micro-batches accumulated per optimizer step "
                        "(effective batch = batch-size x accum; excludes "
                        "--chunk > 1)")
    p.add_argument("--profile-dir", default=None,
                   help="capture a jax.profiler trace of one steady-state "
                        "chunk into this directory")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 compute with f32 master params [B:L10]")
    p.add_argument("--f32", action="store_true",
                   help="force full f32 compute (overrides a preset's "
                        "bf16 default, e.g. n40)")
    p.add_argument("--layout", choices=["dense", "sparse"], default=None,
                   help="batch layout: dense padded or block-diagonal "
                        "sparse (Pallas kernels / fused rollout)")
    p.add_argument("--fused-bwd", action="store_true",
                   help="sparse layout: train through the fused Pallas "
                        "backward kernel (trajectory forward + VMEM "
                        "reverse sweep, no scan recompute)")
    p.add_argument("--edge-gating", action="store_true",
                   help="model variant: feed the SDDMM edge gate "
                        "<h_src, h_tgt> to the E cell each iteration")
    p.add_argument("--eval-instances", type=int, default=64,
                   help="held-out eval-set size (per-epoch eval_acc; "
                        "64 is noisy — checkpoint selection benefits from "
                        "more)")
    p.add_argument("--buckets", default=None,
                   help="size-bucketed batching: comma-separated pad sizes "
                        "(e.g. 28,34,40); each batch holds instances padded "
                        "to the smallest bucket >= n, cutting the dense "
                        "path's padding compute")
    p.add_argument("--stream-workers", type=int, default=None,
                   help="label the on-the-fly training stream in a process "
                        "pool of this size (keeps the ILS solver off the "
                        "dispatch critical path; ignored with --data-path)")
    p.add_argument("--keep-checkpoints", type=int, default=None,
                   help="prune to the k newest checkpoints, always keeping "
                        "the best-eval epoch (default: keep all)")
    args = p.parse_args(argv)
    import dataclasses

    from tsp_gnn_tpu.utils.system import enable_compilation_cache
    enable_compilation_cache()
    cfg = get_config(args.preset)
    if args.batch_size:
        cfg = cfg.replace(data=dataclasses.replace(cfg.data,
                                                   batch_size=args.batch_size))
    if args.stream_workers is not None:
        cfg = cfg.replace(data=dataclasses.replace(
            cfg.data, stream_workers=args.stream_workers))
    if args.buckets is not None:
        pads = tuple(int(x) for x in args.buckets.split(","))
        assert max(pads) >= cfg.data.n_max, (
            f"largest bucket {max(pads)} < n_max {cfg.data.n_max}")
        cfg = cfg.replace(data=dataclasses.replace(cfg.data,
                                                   bucket_pads=pads))
    if args.keep_checkpoints is not None:
        cfg = cfg.replace(train=dataclasses.replace(
            cfg.train, keep_checkpoints=args.keep_checkpoints))
    if args.accum is not None:
        cfg = cfg.replace(train=dataclasses.replace(cfg.train,
                                                    accum=args.accum))
    if args.lr is not None:
        cfg = cfg.replace(train=dataclasses.replace(cfg.train, lr=args.lr))
    if args.deviation is not None:
        cfg = cfg.replace(data=dataclasses.replace(cfg.data,
                                                   deviation=args.deviation))
    if args.tmax:
        cfg = cfg.replace(model=dataclasses.replace(cfg.model, tmax=args.tmax))
    if args.edge_gating:
        cfg = cfg.replace(model=dataclasses.replace(cfg.model,
                                                    edge_gating=True))
    assert not (args.bf16 and args.f32), "--bf16 and --f32 are exclusive"
    if args.bf16:
        cfg = cfg.replace(train=dataclasses.replace(cfg.train, bf16=True))
    if args.f32:
        cfg = cfg.replace(train=dataclasses.replace(cfg.train, bf16=False))
    if args.layout:
        cfg = cfg.replace(train=dataclasses.replace(cfg.train,
                                                    layout=args.layout))
    if args.fused_bwd:
        assert cfg.train.layout == "sparse", "--fused-bwd needs --layout sparse"
        cfg = cfg.replace(kernel=dataclasses.replace(cfg.kernel,
                                                     fused_bwd=True))
    train(cfg, epochs=args.epochs, seed=args.seed, log_dir=args.log_dir,
          curriculum_ramp=args.curriculum_ramp, data_path=args.data_path,
          dev_start=args.dev_start, chunk=args.chunk,
          profile_dir=args.profile_dir, eval_instances=args.eval_instances)


if __name__ == "__main__":
    main()
