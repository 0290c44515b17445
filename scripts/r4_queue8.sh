#!/bin/bash
# Round-4 queue 8 (chained after R4_Q7_DONE): three cheap eval rows.
#   1. calibration re-fit on the 0.1-floor temperature grid (the 0.3 grid
#      clamped again; fit-slice coverage flattens toward a discrete-
#      mixture floor near 0.51)
#   2. rank_blend 1.0 (0.6 already recovered top-1 32.2 -> 27.3 px at
#      identical oracle — map the rest of the blend curve)
#   3. social_freeze fwd bench at the newly-relaxed 320-row chunk (the
#      probed fused freeze forward; was clamped to 256 rows = 61.6 ms)
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
D=/root/reference/data
T=1500

bash scripts/r4_probe_wait.sh
timeout $T python evaluate.py --save_dir save/r4_flagship --data_dir "$D" \
    --batch_size 64 --num_samples 20 --best 1 --calibration 1 \
    > save/r4_flagship/eval_best_k20_cal3.json 2>>/tmp/r4_q8_err.log || true
tail -1 save/r4_flagship/eval_best_k20_cal3.json

timeout $T python evaluate.py --save_dir save/r4_flagship --data_dir "$D" \
    --batch_size 64 --num_samples 20 --best 1 --rank_blend 1.0 \
    > save/r4_flagship/eval_best_k20_rb1.0.json 2>>/tmp/r4_q8_err.log || true
tail -1 save/r4_flagship/eval_best_k20_rb1.0.json

FWD='import sys, json; sys.path.insert(0, "/root/repo")
import bench
bench._algo_cost = lambda *a: (0.0, 0.0)
tps, dt, mfu, hbm = bench.bench(iters=8, warmup=3)
print(json.dumps({"fwd_ms": round(dt*1e3, 2), "traj_per_sec": round(tps)}))'
bash scripts/r4_probe_wait.sh
timeout $T env DESIRE_SOCIAL_FREEZE=1 python -c "$FWD" \
    | tee /tmp/r4_freeze320_fwd.json || true
echo R4_Q8_DONE
