#!/bin/bash
# Round-4 queue 3: social_freeze decision triage (VERDICT r3 item 6 —
# the flag changes inference semantics and needs held-out accuracy
# evidence before it can default or die). 40-epoch freeze-trained run +
# held-out eval, comparable row for the RESULTS fast-agent triage table.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
D=/root/reference/data
[ -f /tmp/r4_winner.env ] && source /tmp/r4_winner.env

bash scripts/r4_probe_wait.sh
timeout 7200 python train.py --data_dir "$D" --num_epochs 40 \
    --batch_size 64 --social_freeze 1 --save_dir save/r4_freeze \
    2>&1 | tail -3
bash scripts/r4_probe_wait.sh
python evaluate.py --save_dir save/r4_freeze --data_dir "$D" \
    --batch_size 64 --num_samples 20 --speed_bins 2,8,20 --per_scene 1 \
    --social_freeze 1 > save/r4_freeze/eval_heldout_k20.json \
    2>>/tmp/r4_q3_err.log
tail -1 save/r4_freeze/eval_heldout_k20.json
echo R4_Q3_DONE
