#!/bin/bash
# Reordered final queue: flagship FIRST (critical path), then the eval
# sweep, the bench line, and the IOC row-cap sweep last (nice-to-have).
# Replaces r3_tpu_queue3.sh step order after a tunnel hang blocked the
# row-cap sweep ahead of the flagship.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
D=/root/reference/data
: "${FLAGS:=}"
: "${SAVE:=save/r3_final}"
mkdir -p "$SAVE"

# 1. flagship (new defaults: input_norm on, speed_loss_alpha 0.5), staged
# as 40 epochs -> quick held-out eval -> resume to 100: if the tunnel dies
# (or the round ends) mid-run, the 40-epoch zero-flag numbers exist.
python train.py --data_dir "$D" --num_epochs 40 --batch_size 64 \
    --save_dir "$SAVE" $FLAGS 2>&1 | tail -3
python evaluate.py --save_dir "$SAVE" --data_dir "$D" --batch_size 64 \
    --num_samples 20 --speed_bins 2,8,20 --per_scene 1 \
    > "$SAVE/eval_heldout_k20_e40.json" 2>>/tmp/q3_err.log
python train.py --data_dir "$D" --num_epochs 100 --batch_size 64 \
    --save_dir "$SAVE" --resume 1 $FLAGS 2>&1 | tail -3

# 2. full eval sweep (K=20 with everything, K=50, in-sample gap, blend)
python evaluate.py --save_dir "$SAVE" --data_dir "$D" --batch_size 64 \
    --num_samples 20 --per_scene 1 --horizons 1,2,3,4 --calibration 1 \
    --speed_bins 2,8,20 > "$SAVE/eval_heldout_k20.json" 2>>/tmp/q3_err.log
python evaluate.py --save_dir "$SAVE" --data_dir "$D" --batch_size 64 \
    --num_samples 50 --per_scene 1 --horizons 1,2,3,4 \
    --speed_bins 2,8,20 > "$SAVE/eval_heldout_k50.json" 2>>/tmp/q3_err.log
python evaluate.py --save_dir "$SAVE" --data_dir "$D" --batch_size 64 \
    --num_samples 20 --split train --max_eval_batches 60 \
    --speed_bins 2,8,20 > "$SAVE/eval_insample_k20.json" 2>>/tmp/q3_err.log
python evaluate.py --save_dir "$SAVE" --data_dir "$D" --batch_size 64 \
    --num_samples 20 --rank_blend 0.5 \
    > "$SAVE/eval_heldout_k20_blend.json" 2>>/tmp/q3_err.log

# 3. final bench line
python bench.py > /tmp/bench_r3_final.json 2>>/tmp/q3_err.log

# 4. IOC lane-chunk row-cap sweep (optional perf datapoint)
for mr in 64 640 1280; do
  DESIRE_IOC_MAX_ROWS=$mr python - <<'EOF' 2>>/tmp/q3_sweep_err.log
import json, os, sys
sys.path.insert(0, '/root/repo')
import bench
tps, dt, mfu, hbm = bench.bench(iters=8, warmup=2)
print(json.dumps({"max_rows": os.environ["DESIRE_IOC_MAX_ROWS"],
                  "fwd_ms": round(dt*1e3, 2), "traj_per_sec": round(tps)}),
      flush=True)
EOF
done > /tmp/ioc_rows_sweep.jsonl
echo QUEUE3B_DONE

# 5. chain the post-flagship measurement queue (tent A/B, social_freeze
# A/B, z-temp sweep) and the triage queue (speed_aug, freeze-trained) —
# the tunnel watcher launches only this script, so the whole remaining
# TPU plan must hang off it.
bash scripts/r3_queue4.sh > /tmp/r3_queue4.log 2>&1
bash scripts/r3_queue5.sh > /tmp/r3_queue5.log 2>&1
bash scripts/r3_queue6.sh > /tmp/r3_queue6.log 2>&1
echo CHAIN_ALL_DONE
