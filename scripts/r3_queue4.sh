#!/bin/bash
# Post-flagship measurement queue (launched after r3_queue3b.sh prints
# QUEUE3B_DONE): A/B the factorized scene-tent build (DESIRE_TENT_MM) on
# both the inference bench and the train step, then sweep the eval-time
# fast-agent z-temperature on the r3_final checkpoint.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
D=/root/reference/data
S=save/r3_final

# 1. tent-factorization A/B — inference bench + train ladder
DESIRE_TENT_MM=1 python bench.py > /tmp/bench_tent_mm.json 2>>/tmp/q4_err.log
DESIRE_TENT_MM=1 python scripts/train_breakdown.py --iters 8 \
    > /tmp/train_ladder_tent_mm.jsonl 2>>/tmp/q4_err.log
DESIRE_TENT_MM=1 python bench.py --breakdown \
    > /tmp/bench_tent_mm_breakdown.json 2>>/tmp/q4_err.log

# 1b. social_freeze A/B: speed (bench fwd + train step) + held-out accuracy
DESIRE_TENT_MM=1 DESIRE_SOCIAL_FREEZE=1 python bench.py \
    > /tmp/bench_tent_freeze.json 2>>/tmp/q4_err.log
DESIRE_TENT_MM=1 DESIRE_SOCIAL_FREEZE=1 python - <<'EOF' \
    > /tmp/train_step_freeze.json 2>>/tmp/q4_err.log
import json, sys
sys.path.insert(0, '/root/repo')
import bench
sps, dt, mfu, hbm = bench.bench_train(iters=8, warmup=3)
print(json.dumps({"variant": "tent_mm+social_freeze fused train",
                  "ms_per_step": round(dt * 1e3, 1),
                  "steps_per_sec": round(sps, 2)}), flush=True)
EOF
python evaluate.py --save_dir "$S" --data_dir "$D" --batch_size 64 \
    --num_samples 20 --speed_bins 2,8,20 --social_freeze 1 \
    > "$S/eval_heldout_k20_socfreeze.json" 2>>/tmp/q4_err.log

# 1c. serving-path latency at flagship shapes (full host->device->host)
python scripts/bench_serve.py --save_dir "$S" \
    > /tmp/bench_serve.json 2>>/tmp/q4_err.log

# 2. z-temperature sweep (fast agents only; heldout, K=20)
for zt in 1.5 2.0 3.0; do
  python evaluate.py --save_dir "$S" --data_dir "$D" --batch_size 64 \
      --num_samples 20 --speed_bins 2,8,20 --per_scene 1 \
      --z_temp_fast "$zt" \
      > "$S/eval_heldout_k20_ztemp${zt}.json" 2>>/tmp/q4_err.log
done

echo QUEUE4_DONE
