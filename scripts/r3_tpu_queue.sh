#!/bin/bash
# Round-3 TPU work queue (serial: one chip, one host core).
# 1. in-sample generalization-gap eval of the round-3 flagship checkpoint
# 2. bench.py (fills RESULTS throughput row)
# 3. fast-agent triage: 40-epoch control + input_norm / speed_loss_alpha /
#    both, each followed by a held-out speed-class eval
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
D=/root/reference/data

python evaluate.py --save_dir save/r3_flagship --data_dir "$D" \
    --batch_size 64 --num_samples 20 --split train --max_eval_batches 60 \
    --speed_bins 2,8,20 > save/r3_flagship/eval_insample_k20.json 2>/tmp/q_err1.log

python bench.py > /tmp/bench_r3.json 2>/tmp/q_err2.log

for spec in "t_ctrl:" \
            "t_innorm:--input_norm 1" \
            "t_alpha1:--speed_loss_alpha 1.0" \
            "t_both:--input_norm 1 --speed_loss_alpha 0.5"; do
  name="${spec%%:*}"; flags="${spec#*:}"
  python train.py --data_dir "$D" --num_epochs 40 --batch_size 64 \
      --save_dir "save/$name" $flags 2>&1 | tail -2
  python evaluate.py --save_dir "save/$name" --data_dir "$D" \
      --batch_size 64 --num_samples 20 --speed_bins 2,8,20 --per_scene 1 \
      > "save/$name/eval_heldout_k20.json" 2>>/tmp/q_err3.log
done
echo QUEUE_DONE
