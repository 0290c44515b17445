#!/bin/bash
# Round-5 queue 10: retry the big-row TRAIN probes with the Mosaic-safe
# batched-adjoint reductions (q8's t_kc1_r640/1280 ran the crashing forms).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
for rows in 640 1280; do
  bash scripts/r5_probe_wait.sh
  timeout 2400 env DESIRE_SOCIAL_KC=1 DESIRE_IOC_MAX_ROWS=$rows python - <<'PYEOF' 2>/tmp/r5_q10_err_$rows.log || echo "{\"tag\": \"t2_kc1_r$rows\", \"rc\": 1, \"err\": \"$(tail -c 250 /tmp/r5_q10_err_$rows.log | tr '\n\"' '  ')\"}"
import sys, json, os
sys.path.insert(0, '/root/repo')
import bench
bench._algo_cost = lambda *a: (0.0, 0.0)
sps, dt, mfu, hbm = bench.bench_train(iters=6, warmup=2)
print(json.dumps({"tag": "t2_kc1_r" + os.environ["DESIRE_IOC_MAX_ROWS"],
                  "train_ms": round(dt*1e3, 1)}))
PYEOF
done | tee /tmp/r5_train_retry.jsonl
echo R5_Q10_DONE
