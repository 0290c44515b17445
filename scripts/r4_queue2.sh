#!/bin/bash
# Round-4 queue 2: flagship retrain under the SHIPPED defaults (VERDICT
# r3 item 1 — the round-3 headline ckpt predates the input_norm /
# speed_loss_alpha defaults). Zero-flag recipe, 100 epochs, B=64, all
# scenes; then the full held-out eval sweep (K=20 w/ calibration, K=50,
# CV baseline, train-split appendix). The A/B winner's kernel knobs are
# numerically exact re-tilings, so training under them is safe.
set -x -o pipefail
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
D=/root/reference/data
SAVE=save/r4_flagship

[ -f /tmp/r4_winner.env ] && source /tmp/r4_winner.env

bash scripts/r4_probe_wait.sh
timeout 14400 python train.py --data_dir "$D" --num_epochs 100 \
    --batch_size 64 --save_dir "$SAVE" 2>&1 | tail -5
rc=$?
if [ $rc -ne 0 ]; then
  # tunnel died mid-run: wait for it, resume from the last checkpoint
  bash scripts/r4_probe_wait.sh
  timeout 14400 python train.py --data_dir "$D" --num_epochs 100 \
      --batch_size 64 --save_dir "$SAVE" --resume 1 2>&1 | tail -5
fi

bash scripts/r4_probe_wait.sh
bash scripts/final_eval_sweep.sh "$SAVE" "$D" || true
echo R4_Q2_DONE
