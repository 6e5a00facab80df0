#!/usr/bin/env bash
# Canonical HAM10000/PH2 runs (preset hyperparameters mirror scripts/skin.sh).
set -e
DATASET=${1:-HAM}  # HAM | PH2
MODE=${2:-TRAIN}
OUT=${OUT:-./model_out}
case "$DATASET" in
  HAM) PRESET=ham10000; ROOT=${ROOT:-./data/HAM10000} ;;
  PH2) PRESET=ph2; ROOT=${ROOT:-./data/PH2} ;;
  *) echo "usage: $0 HAM|PH2 TRAIN|TEST"; exit 1 ;;
esac
if [ "$MODE" = TRAIN ]; then
  python -m cenet_tpu.cli.main train --preset $PRESET --root_path "$ROOT" --output_dir "$OUT" ${PRETRAINED:+--pretrained_pth "$PRETRAINED"}
else
  python -m cenet_tpu.cli.main eval --preset $PRESET --root_path "$ROOT" --output_dir "$OUT" ${CKPT:+--checkpoint "$CKPT"}
fi
