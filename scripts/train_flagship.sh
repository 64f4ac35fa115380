#!/bin/bash
# Flagship n40 training run (BASELINE configs[1]) on the attached TPU.
#
# - consumes the pre-generated dataset (lazy shard streaming picks up shards
#   the generator is still writing)
# - deviation curriculum: anneal 10% -> 2% over the ramp (the 2%-deviation
#   loss sits at ln2 for a long time from cold start; the anneal shortens it)
# - size curriculum over the same ramp (n cap 20 -> 40)
# - chunked dispatch amortises the ~35ms tunnel latency
# - single-tenant chip: NEVER run this while another TPU process is alive
set -euo pipefail
cd "$(dirname "$0")/.."

LOG_DIR=${LOG_DIR:-runs/n40_flagship}
EPOCHS=${EPOCHS:-4000}
EXTRA=${EXTRA:-}

# 256-instance held-out eval: 64 was +/-6% noise on checkpoint selection
# [VERDICT r2 Weak #6].  Precision: the preset defaults to bf16 (validated
# at 0.8604 +/- 0.0021, results/eval_bf16_r3.jsonl).
exec python -m tsp_gnn_tpu.train \
  --preset n40 \
  --data-path datasets/train_n20_40 \
  --epochs "$EPOCHS" \
  --log-dir "$LOG_DIR" \
  --chunk 16 \
  --eval-instances 256 \
  --keep-checkpoints 8 \
  --curriculum-ramp 60 \
  --dev-start 0.10 \
  $EXTRA
