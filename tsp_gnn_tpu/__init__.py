"""tsp_gnn_tpu — a TPU-native typed graph network framework for decision-TSP.

A from-scratch JAX/XLA/Pallas rebuild of the capability surface of
machine-reasoning-ufrgs/TSP-GNN (AAAI-19, arXiv:1809.02721).

NOTE ON PROVENANCE: the reference mount at /root/reference was empty at build
time (see SURVEY.md §0).  Behavioural parity targets are therefore (a) the
published paper, (b) BASELINE.json, and (c) an in-repo NumPy oracle
(`tsp_gnn_tpu.models.oracle`) that re-derives the reference equations and acts
as the "allclose vs reference" stand-in mandated by BASELINE.json.

Layout (TPU-first, not a port):
  models/   MLP, LayerNorm-LSTM cell, generic typed-GNN engine, decision-TSP
            model, NumPy oracle.
  ops/      Pallas TPU kernels: fused message-passing step, ELL segment
            reduce, incidence SpMM; plus jnp fallbacks.
  parallel/ mesh construction, edge partitioner, halo exchange (shard_map +
            collectives), distributed init.
  data/     instance generator, TSP solvers (Held-Karp exact / 2-opt+Or-opt),
            file IO, batching (dense padded + block-diagonal sparse).
  utils/    checkpointing (orbax), JSONL metrics, fd redirector.
"""

__version__ = "0.1.0"
