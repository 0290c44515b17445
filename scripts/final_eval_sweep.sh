#!/usr/bin/env bash
# Post-training evaluation sweep for a checkpoint directory (real TPU):
# full-epoch metrics at K=20 and K=50 with per-scene, paper-protocol
# horizons, calibration, and speed-class breakdowns, plus the
# constant-velocity context baseline. Writes JSON files next to the ckpt.
#
#   bash scripts/final_eval_sweep.sh save/r2_flagship /root/reference/data
set -euo pipefail
CKPT=${1:?ckpt dir}
DATA=${2:-/root/reference/data}

common=(--save_dir "$CKPT" --data_dir "$DATA" --batch_size 64
        --per_scene 1 --horizons 1,2,3,4 --speed_bins 2,8,20)

python evaluate.py "${common[@]}" --num_samples 20 --calibration 1 \
    > "$CKPT/eval_k20.json"
tail -1 "$CKPT/eval_k20.json"

python evaluate.py "${common[@]}" --num_samples 50 \
    > "$CKPT/eval_k50.json"
tail -1 "$CKPT/eval_k50.json"

python scripts/baseline_cv.py --data_dir "$DATA" --batch_size 64 \
    --speed_bins 2,8,20 > "$CKPT/baseline_cv.json"
tail -1 "$CKPT/baseline_cv.json"
