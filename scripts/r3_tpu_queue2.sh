#!/bin/bash
# Round-3 TPU follow-up queue (run after r3_tpu_queue.sh finishes):
# 1. prior_lane_frac triage (ranking-quality attack)
# 2. bench with fixed cost counting + forward stage breakdown
# 3. train-step timing ladder
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
D=/root/reference/data

for spec in "t_prior:--prior_lane_frac 0.25" \
            "t_pace:--input_norm 1 --pace_range 0.5"; do
  name="${spec%%:*}"; flags="${spec#*:}"
  python train.py --data_dir "$D" --num_epochs 40 --batch_size 64 \
      --save_dir "save/$name" $flags 2>&1 | tail -2
  python evaluate.py --save_dir "save/$name" --data_dir "$D" \
      --batch_size 64 --num_samples 20 --speed_bins 2,8,20 --per_scene 1 \
      > "save/$name/eval_heldout_k20.json" 2>>/tmp/q2_err.log
done

python bench.py > /tmp/bench_r3b.json 2>/tmp/q2_bench_err.log
python bench.py --breakdown 2>/tmp/bench_r3_breakdown.jsonl >/dev/null
python scripts/train_breakdown.py > /tmp/train_breakdown.jsonl 2>/tmp/q2_tb_err.log
echo QUEUE2_DONE
