#!/usr/bin/env bash
# Canonical ACDC runs (preset hyperparameters mirror the reference scripts/acdc.sh).
set -e
MODE=${1:-TRAIN}
ROOT=${ROOT:-./data/ACDC}
LISTS=${LISTS:-./lists/lists_ACDC}
OUT=${OUT:-./model_out}
if [ "$MODE" = TRAIN ]; then
  python -m cenet_tpu.cli.main train --preset acdc --root_path "$ROOT" --list_dir "$LISTS" --output_dir "$OUT" ${PRETRAINED:+--pretrained_pth "$PRETRAINED"}
else
  python -m cenet_tpu.cli.main eval --preset acdc --root_path "$ROOT" --list_dir "$LISTS" --output_dir "$OUT" ${CKPT:+--checkpoint "$CKPT"}
fi
