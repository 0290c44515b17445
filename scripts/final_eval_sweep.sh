#!/usr/bin/env bash
# Post-training evaluation sweep for a checkpoint directory (real TPU).
# Round 3: all headline metrics are HELD-OUT (the holdout='video' split —
# one unseen video per scene); an in-sample (train-split) pass is kept for
# the appendix comparison. Writes JSON files next to the ckpt.
#
#   PYTHONPATH=/root/repo:/root/.axon_site \
#       bash scripts/final_eval_sweep.sh save/r3_flagship /root/reference/data
set -euo pipefail
CKPT=${1:?ckpt dir}
DATA=${2:-/root/reference/data}

common=(--save_dir "$CKPT" --data_dir "$DATA" --batch_size 64
        --per_scene 1 --horizons 1,2,3,4 --speed_bins 2,8,20)

# held-out (default split): the headline numbers
python evaluate.py "${common[@]}" --num_samples 20 --calibration 1 \
    > "$CKPT/eval_heldout_k20.json"
tail -1 "$CKPT/eval_heldout_k20.json"

python evaluate.py "${common[@]}" --num_samples 50 \
    > "$CKPT/eval_heldout_k50.json"
tail -1 "$CKPT/eval_heldout_k50.json"

# constant-velocity context baseline on the SAME split
python scripts/baseline_cv.py --data_dir "$DATA" --batch_size 64 \
    --speed_bins 2,8,20 > "$CKPT/baseline_cv_heldout.json"
tail -1 "$CKPT/baseline_cv_heldout.json"

# in-sample appendix (train split, capped)
python evaluate.py "${common[@]}" --num_samples 20 --split train \
    --max_eval_batches 60 > "$CKPT/eval_train_k20.json"
tail -1 "$CKPT/eval_train_k20.json"
