"""Config tree for the framework.

The reference (TSP-GNN train.py / dataset.py) used per-script argparse with
hyperparameters as literals [SURVEY §5 "Config"].  Here every BASELINE.json
config row is a named preset over one dataclass tree.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Tuple


@dataclass(frozen=True)
class ModelConfig:
    """Decision-TSP typed-GNN hyperparameters (paper defaults).

    Parity notes (SURVEY §2.3/§2.4): d=64, tmax=32 at train time, MLP depth 3,
    LayerNorm-LSTM cells with relu cell activation (TGN-library default;
    tanh selectable for the ambiguity flagged in SURVEY §2.3), readout =
    per-edge vote MLP + per-instance mean logit.
    """
    d: int = 64                      # embedding dim for both V and E types
    tmax: int = 32                   # message-passing iterations (train)
    mlp_depth: int = 3               # dense layers per message/readout MLP
    cell_activation: str = "relu"    # "relu" | "tanh"  (SURVEY §2.3 ambiguity)
    msg_activation: str = "relu"     # hidden activation of message MLPs
    forget_bias: float = 1.0         # TF LayerNormBasicLSTMCell default
    ln_eps: float = 1e-12            # tf.contrib.layers.layer_norm epsilon
    feed_wc_each_step: bool = False  # also feed raw [w,c] to the E cell input
                                     # every iteration (reference-variant flag,
                                     # SURVEY §2.4 [K-med])
    edge_gating: bool = False        # feed <h_src, h_tgt> (the SDDMM kernel)
                                     # to the E cell input each iteration —
                                     # model variant giving sddmm a production
                                     # consumer incl. gradients [VERDICT r2 #10]
    remat: bool = True               # rematerialize the MP scan for backprop
    remat_policy: str = "full"       # "full" (recompute everything) | "dots"
                                     # (save MXU dot outputs, recompute the
                                     # elementwise rest) — middle ground:
                                     # the no-remat program crashes the
                                     # tunnel compile helper (r3 sweep)
    scan_unroll: int = 1             # lax.scan unroll factor of the tmax loop
                                     # (XLA pipelines unrolled iterations;
                                     # must divide tmax when > 1)


@dataclass(frozen=True)
class DataConfig:
    """Instance generation + labeling (SURVEY §2.5)."""
    n_min: int = 20
    n_max: int = 40
    test_n_min: Optional[int] = None  # eval range when != train range
    test_n_max: Optional[int] = None  # (size-generalization protocol)
    deviation: float = 0.02          # +/- dev cost-threshold dual labeling
    solver: str = "auto"             # "auto" | "held_karp" | "two_opt" | "cpp"
    two_opt_restarts: int = 4
    seed: int = 0
    stream_workers: int = 0          # >0: label the on-the-fly training
                                     # stream in a process pool (the ILS
                                     # solver must stay off the dispatch
                                     # critical path)
    # batching
    batch_size: int = 16             # instances per batch (paper: 16)
    # padded dense layout: instances padded to pad_n vertices
    pad_n: Optional[int] = None      # default: n_max
    bucket_pads: Optional[Tuple[int, ...]] = None
    # size-bucketed batching: each batch holds instances padded to the
    # smallest listed size >= n (e.g. (28, 34, 40)) instead of a single
    # pad_n.  Cuts the dense path's padding compute (~42% of the flagship's
    # edge slots are padding at pad_n=40, E[n]=30) at the cost of one
    # compiled program per bucket.  Model logits are pad-invariant
    # (tests/test_oracle_allclose.py::test_pad_invariance), so this changes
    # throughput, not semantics.


@dataclass(frozen=True)
class TrainConfig:
    lr: float = 2e-5                 # Adam, paper value
    grad_clip: float = 0.65          # global-norm clip (NeuroSAT lineage)
    epochs: int = 100
    batches_per_epoch: int = 128     # paper: epoch = 128 batches
    eval_batches: int = 16
    checkpoint_every: int = 1        # epochs
    keep_checkpoints: int = 0        # >0: prune to the k newest epochs
                                     # (the best-eval epoch always survives);
                                     # 0 = keep all (reference Saver behavior)
    log_path: str = "runs/default"
    resume: bool = True
    bf16: bool = False               # bfloat16 embeddings (large-batch preset)
    layout: str = "dense"            # "dense" (padded batch) | "sparse"
                                     # (block-diagonal + Pallas kernels)
    accum: int = 1                   # micro-batches accumulated per optimizer
                                     # step (effective batch = batch_size *
                                     # accum; the compile-safe route to the
                                     # 4k-instance configs[3] batch)


@dataclass(frozen=True)
class MeshConfig:
    """Device mesh: (data, graph).  data = instance-level DP; graph =
    edge-partition of large instances with halo exchange (SURVEY §2.2)."""
    data: int = 1
    graph: int = 1
    axis_names: Tuple[str, str] = ("data", "graph")


@dataclass(frozen=True)
class KernelConfig:
    """Pallas kernel knobs (consumed by train.py --layout sparse)."""
    use_pallas: bool = True          # Pallas SpMM kernels on the sparse path
    fused: bool = False              # fused VMEM rollout as training forward
                                     # (backward = scan recompute)
    fused_bwd: bool = False          # fused rollout with the fused Pallas
                                     # BACKWARD kernel (ops/rollout_grad):
                                     # trajectory-saving forward + one
                                     # VMEM-resident reverse sweep, no scan
                                     # recompute [VERDICT r3 #1]
    batch_tile: int = 8              # problems per fused-kernel grid step
    bwd_tile: int = 2                # problems per grid step on the
                                     # fused-backward path (trajectory
                                     # blocks are double-buffered: VMEM
                                     # holds 2x the per-group trajectory)
    bwd_f32: bool = False            # run the fused backward kernel in f32
                                     # even for bf16 training (Mosaic bf16
                                     # lowering escape hatch)
    tile_e: int = 1024               # edge-tile size of the SpMM kernels
    agg_group: int = 1               # >1: grouped-problem SpMM kernels
                                     # (spmm.*_grouped) — `agg_group` whole
                                     # problems per grid step; default 1 =
                                     # the hardware-validated per-problem
                                     # kernels until the grouped variants
                                     # are measured on a TPU window


@dataclass(frozen=True)
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    kernel: KernelConfig = field(default_factory=KernelConfig)

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


def _preset_pr1() -> Config:
    """BASELINE.json configs[0]: decision-TSP n=20, batch 32, tmax=25, CPU-runnable."""
    return Config(
        model=ModelConfig(tmax=25),
        data=DataConfig(n_min=20, n_max=20, batch_size=32, pad_n=20),
        train=TrainConfig(batches_per_epoch=32),
    )


def _preset_n40() -> Config:
    """BASELINE.json configs[1]: n=40, batch 128, curriculum over deviation 2%.

    Precision: bf16 mixed compute (f32 masters).  Round 3 validated the
    accuracy contract AT bf16: a 50-epoch bf16 continuation from the f32
    flagship reached 0.8604 +/- 0.0021 on the robust 4-set protocol
    (results/eval_bf16_r3.jsonl) — above both the >80% contract and the
    round-2 f32 headline (0.8179) — and the bf16 step is never slower
    (PERF.md; forward is ~1.5x faster).  `--bf16` off is one flag away.

    Batching: size-bucketed (round 4).  Padding every batch to n=40 wastes
    (40/E[n])^2-ish compute on the preset's n ~ U{20..40}; four pad
    buckets recover it — 47.9M vs 29.3M edge-updates/s mixed steady state
    on hardware (PERF.md round 4, results/bucket_sweep.jsonl).  Logits are
    pad-invariant (tests/test_oracle_allclose.py::test_pad_invariance) so
    only batch COMPOSITION changes (same-size-range instances share a
    batch, standard length-bucketing); `--buckets`/pad_n override.
    """
    return Config(
        model=ModelConfig(tmax=32, scan_unroll=32),
        data=DataConfig(n_min=20, n_max=40, batch_size=128, pad_n=40,
                        bucket_pads=(24, 28, 34, 40)),
        train=TrainConfig(bf16=True),
    )


def _preset_size_gen() -> Config:
    """BASELINE.json configs[2]: TRAIN on n=20-40, TEST on n=60-80 at
    tmax=50 (evaluate.size_generalization_sweep reads the test range)."""
    return Config(
        model=ModelConfig(tmax=32),
        data=DataConfig(n_min=20, n_max=40, pad_n=40,
                        test_n_min=60, test_n_max=80, batch_size=64),
    )


def _preset_large_batch() -> Config:
    """BASELINE.json configs[3]: 4k instances/batch, bf16, block-diagonal
    sparse layout.

    Delivered as 16 accumulated micro-batches of 256 instances per
    optimizer step: the tunnel's remote compile service cannot build
    512+-instance programs (PERF.md "Big-shape compile limits"), and
    equal-size micro-batch grad accumulation is mathematically identical
    to the monolithic 4096 batch (tests/test_train_smoke.py).  fused=False
    by MEASUREMENT: the fused rollout kernel compiles and runs on hardware
    (round-2 Mosaic fixes) but the fused-fwd train step does not beat
    scan + Pallas SpMM at these shapes (PERF.md "Fused rollout")."""
    return Config(
        model=ModelConfig(tmax=32),
        data=DataConfig(n_min=20, n_max=40, batch_size=256, pad_n=40),
        train=TrainConfig(bf16=True, layout="sparse", accum=16),
        kernel=KernelConfig(use_pallas=True, fused=False, batch_tile=16),
    )


def _preset_multihost() -> Config:
    """BASELINE.json configs[4]: edge-partitioned mega-batch, n up to 200."""
    return Config(
        model=ModelConfig(tmax=32),
        data=DataConfig(n_min=100, n_max=200, batch_size=256, pad_n=200),
        mesh=MeshConfig(data=1, graph=4),
    )


def _preset_p200() -> Config:
    """configs[4] workload on ONE chip, dense layout: the single-chip
    training path for n in [100,200].

    Measured (results/r4_perf.jsonl crossover): the dense einsum step is
    3.1x faster than the sparse halo step at this shape on one chip
    (233 vs 735 ms at batch 8), so single-chip p200 training runs dense;
    the halo path (preset `multihost`, train_spmd) carries the same
    params across chips — checkpoints are interchangeable.  Batch 8
    instances (16 problems) fits HBM with the tmax=32 scan carry."""
    return Config(
        model=ModelConfig(tmax=32),
        data=DataConfig(n_min=100, n_max=200, batch_size=8, pad_n=200),
        train=TrainConfig(bf16=True, batches_per_epoch=64),
    )


PRESETS = {
    "pr1": _preset_pr1,
    "n40": _preset_n40,
    "size_gen": _preset_size_gen,
    "large_batch": _preset_large_batch,
    "multihost": _preset_multihost,
    "p200": _preset_p200,
}


def get_config(name: str = "pr1", **overrides) -> Config:
    cfg = PRESETS[name]()
    if overrides:
        cfg = dataclasses.replace(cfg, **overrides)
    return cfg
