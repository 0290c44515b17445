#!/bin/bash
# Round-5 queue 1 (critical first): re-baseline bench at the new defaults,
# the held-out two-parameter calibration numbers on the flagship best ckpt,
# the rank_blend row, and a small-iteration train-step device trace retry.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
D=/root/reference/data
T=2400

# 0) bench sanity at round-5 defaults (WGRAD=0): records fwd/train ms
bash scripts/r5_probe_wait.sh
timeout $T python bench.py > /tmp/r5_bench1.json 2>/tmp/r5_bench1.err || true
tail -1 /tmp/r5_bench1.json

# 1) flagship3 best-ckpt K20 with two-param calibration (VERDICT item 6:
#    held-out coverage within +-0.05 at BOTH 50% and 90%)
bash scripts/r5_probe_wait.sh
timeout $T python evaluate.py --save_dir save/r4_flagship3 --data_dir "$D" \
    --batch_size 64 --num_samples 20 --best 1 --per_scene 1 \
    --speed_bins 2,8,20 --horizons 1,2,3,4 \
    --calibration 1 --calib_two_param 1 \
    > save/r4_flagship3/eval_best_k20_cal2.json 2>>/tmp/r5_q1_err.log || true
tail -1 save/r4_flagship3/eval_best_k20_cal2.json | head -c 600

# 1b) scalar-fit control on the same ckpt (the A/B for RESULTS)
bash scripts/r5_probe_wait.sh
timeout $T python evaluate.py --save_dir save/r4_flagship3 --data_dir "$D" \
    --batch_size 64 --num_samples 20 --best 1 --calibration 1 \
    --calib_two_param 0 \
    > save/r4_flagship3/eval_best_k20_cal1.json 2>>/tmp/r5_q1_err.log || true

# 2) rank_blend row on the flagship best ckpt
bash scripts/r5_probe_wait.sh
timeout $T python evaluate.py --save_dir save/r4_flagship3 --data_dir "$D" \
    --batch_size 64 --num_samples 20 --best 1 --rank_blend 0.6 \
    > save/r4_flagship3/eval_best_k20_rb0.6.json 2>>/tmp/r5_q1_err.log || true
tail -1 save/r4_flagship3/eval_best_k20_rb0.6.json | head -c 400

# 3) train-step device trace retry (small iters: the r4 attempt may have
#    overflowed the trace buffer and kept only host events)
bash scripts/r5_probe_wait.sh
timeout $T python - <<'PYEOF' 2>>/tmp/r5_q1_err.log || true
import sys, json
sys.path.insert(0, '/root/repo')
import jax, jax.profiler
import bench
bench._algo_cost = lambda *a: (0.0, 0.0)
with jax.profiler.trace('/tmp/r5_train_profile'):
    sps, dt, mfu, hbm = bench.bench_train(iters=3, warmup=1)
print(json.dumps({'train_ms': round(dt*1e3, 1)}))
PYEOF
timeout 600 python scripts/trace_report.py /tmp/r5_train_profile 30 \
    > /tmp/r5_train_trace_report.txt 2>&1 || true
head -40 /tmp/r5_train_trace_report.txt

echo R5_Q1_DONE
