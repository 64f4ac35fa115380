#!/bin/bash
# Continue the flagship run from the round's best checkpoint (f32 — measured
# to tie bf16 on the full step, PERF.md; --bf16 via EXTRA if wanted).
#
# Seeds LOG_DIR with the source checkpoint so train.py's resume picks it up
# (params are f32 masters either way — precision switch is free), then
# trains on the full (still-growing) dataset with the measured-fastest
# config (dense bf16, chunked dispatch).  Single-tenant chip: never run
# concurrently with another TPU process.
set -euo pipefail
cd "$(dirname "$0")/.."

SRC=${SRC:-/root/runs/n40_a}
LOG_DIR=${LOG_DIR:-runs/n40_cont}
EPOCHS=${EPOCHS:-4000}

if [ ! -d "$LOG_DIR/checkpoints" ]; then
  mkdir -p "$LOG_DIR/checkpoints"
  BEST=$(env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python - "$SRC" <<'EOF'
import sys
from tsp_gnn_tpu.utils.checkpoint import find_best_checkpoint
print(find_best_checkpoint(sys.argv[1]))
EOF
)
  cp "$BEST" "$LOG_DIR/checkpoints/"
  echo "seeded $LOG_DIR with $BEST"
fi

exec python -m tsp_gnn_tpu.train \
  --preset n40 \
  --batch-size 64 \
  --data-path datasets/train_n20_40 \
  --epochs "$EPOCHS" \
  --log-dir "$LOG_DIR" \
  --chunk 16 \
  --eval-instances 256 \
  --keep-checkpoints 8
