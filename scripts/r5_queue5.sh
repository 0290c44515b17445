#!/bin/bash
# Round-5 queue 5: (a) three-parameter (tc, tt, w) calibration refit on the
# flagship best ckpt; (b) train-step bench at the 640-row chunk (the bwd
# kernel is 44% of the 242 ms step; its 100M vmem limit was never the
# blocker, only _pick_chunk's 320-row env default).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
D=/root/reference/data
T=2400

bash scripts/r5_probe_wait.sh
timeout $T python evaluate.py --save_dir save/r4_flagship3 --data_dir "$D" \
    --batch_size 64 --num_samples 20 --best 1 --calibration 1 \
    --calib_two_param 1 \
    > save/r4_flagship3/eval_best_k20_cal3.json 2>>/tmp/r5_q5_err.log || true
python - <<'PYEOF'
import json
for r in [json.loads(l) for l in open('save/r4_flagship3/eval_best_k20_cal3.json')]:
    c = r.get('calibration')
    if c:
        print(json.dumps({k: c[k] for k in ('sigma_temp','coverage_50_cal',
              'coverage_90_cal','pit_ks_cal','coverage_50','coverage_90')
              if k in c}))
PYEOF

for rows in 640 1280; do
  bash scripts/r5_probe_wait.sh
  timeout 2400 env DESIRE_IOC_MAX_ROWS=$rows python - <<'PYEOF' 2>/tmp/r5_q5t_err.log || echo "{\"train_rows\": \"$rows\", \"rc\": 1, \"err\": \"$(tail -c 300 /tmp/r5_q5t_err.log | tr '\n\"' '  ')\"}"
import sys, json, os
sys.path.insert(0, '/root/repo')
import bench
bench._algo_cost = lambda *a: (0.0, 0.0)
sps, dt, mfu, hbm = bench.bench_train(iters=6, warmup=2)
print(json.dumps({"train_rows": int(os.environ["DESIRE_IOC_MAX_ROWS"]),
                  "train_ms": round(dt*1e3, 1)}))
PYEOF
done | tee /tmp/r5_train_rows.jsonl

echo R5_Q5_DONE
