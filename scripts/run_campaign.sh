#!/bin/bash
# Sequential quality-campaign launcher (one TPU process at a time).
# Usage: bash scripts/run_campaign.sh [root]
set -u
ROOT="${1:-runs/quality}"
EPOCHS="${EPOCHS:-10}"
BPE="${BPE:-2500}"
mkdir -p "$ROOT"
for RUN in c3 pm pi bugstyle c4m; do
  echo "=== campaign run: $RUN ($(date)) ===" | tee -a "$ROOT/campaign.log"
  python scripts/quality_campaign.py --run "$RUN" --root "$ROOT" \
      --epochs "$EPOCHS" --batches-per-epoch "$BPE" \
      >> "$ROOT/campaign.log" 2>&1
  echo "=== $RUN exit=$? ($(date)) ===" | tee -a "$ROOT/campaign.log"
done
echo "campaign done" | tee -a "$ROOT/campaign.log"
