#!/usr/bin/env bash
# Canonical Synapse runs (hyperparameters baked into the 'synapse' preset,
# mirroring the reference scripts/synapse.sh TRAIN/TEST modes).
set -e
MODE=${1:-TRAIN}
ROOT=${ROOT:-./data/Synapse/train_npz}
TEST_ROOT=${TEST_ROOT:-./data/Synapse/test_vol_h5}
LISTS=${LISTS:-./lists/lists_Synapse}
OUT=${OUT:-./model_out}
case "$MODE" in
  TRAIN)
    python -m cenet_tpu.cli.main train --preset synapse \
      --root_path "$ROOT" --list_dir "$LISTS" --output_dir "$OUT" \
      ${PRETRAINED:+--pretrained_pth "$PRETRAINED"} "$@" ;;
  TEST)
    python -m cenet_tpu.cli.main eval --preset synapse \
      --root_path "$TEST_ROOT" --list_dir "$LISTS" --output_dir "$OUT" \
      ${CKPT:+--checkpoint "$CKPT"} ;;
  TEST_ORG)
    python -m cenet_tpu.cli.main eval --preset synapse --model_version cenet_org \
      --root_path "$TEST_ROOT" --list_dir "$LISTS" --output_dir "$OUT" \
      ${CKPT:+--checkpoint "$CKPT"} ;;
  *) echo "usage: $0 TRAIN|TEST|TEST_ORG"; exit 1 ;;
esac
