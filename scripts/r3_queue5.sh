#!/bin/bash
# Triage queue (after r3_queue4.sh): 40-epoch speed_aug run, held-out eval
# with speed bins — comparable row for the RESULTS fast-agent triage table.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
D=/root/reference/data

python train.py --data_dir "$D" --num_epochs 40 --batch_size 64 \
    --speed_aug 0.3 --save_dir save/t_zoom 2>&1 | tail -3
python evaluate.py --save_dir save/t_zoom --data_dir "$D" --batch_size 64 \
    --num_samples 20 --speed_bins 2,8,20 --per_scene 1 \
    > save/t_zoom/eval_heldout_k20.json 2>>/tmp/q5_err.log

# freeze-trained triage: train AND eval with frozen social attention
# (XLA path; fused-train is guarded off under the flag) — the accuracy
# evidence needed before social_freeze can become a default / get a fused
# backward
python train.py --data_dir "$D" --num_epochs 40 --batch_size 64 \
    --social_freeze 1 --save_dir save/t_freeze 2>&1 | tail -3
python evaluate.py --save_dir save/t_freeze --data_dir "$D" --batch_size 64 \
    --num_samples 20 --speed_bins 2,8,20 --social_freeze 1 \
    > save/t_freeze/eval_heldout_k20.json 2>>/tmp/q5_err.log

echo QUEUE5_DONE
