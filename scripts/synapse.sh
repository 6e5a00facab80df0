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
    # reference TEST protocol (scripts/synapse.sh:90-117): eval-time scale_factors
    # 1.0,0.75,0.5 (vs 0.8,0.4 at train), heads 16,8,8, cat skips, eucb/upcn blocks
    python -m cenet_tpu.cli.main eval --preset synapse \
      --root_path "$TEST_ROOT" --list_dir "$LISTS" --output_dir "$OUT" \
      --scale_factors '1.0,0.75,0.5' --diffatt_num_heads '16,8,8' --skip_mode cat \
      ${SAVENII:+--is_savenii} ${CKPT:+--checkpoint "$CKPT"} "${@:2}" ;;
  TEST_ORG)
    python -m cenet_tpu.cli.main eval --preset synapse --model_version cenet_org \
      --root_path "$TEST_ROOT" --list_dir "$LISTS" --output_dir "$OUT" \
      --scale_factors '1.0,0.75,0.5' --diffatt_num_heads '16,8,8' --skip_mode cat \
      ${SAVENII:+--is_savenii} ${CKPT:+--checkpoint "$CKPT"} "${@:2}" ;;
  *) echo "usage: $0 TRAIN|TEST|TEST_ORG"; exit 1 ;;
esac
