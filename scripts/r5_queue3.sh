#!/bin/bash
# Round-5 queue 3: the row-chunk frontier at the raised fwd scoped-VMEM
# limit (the r4 640/1280 probes OOMed only because the fwd pallas_call kept
# the ~16M default; bwd/SGM kernels have run at ~100M all along).
# Sweep fwd + train; flip DESIRE_IOC_MAX_ROWS default on a measured win.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

for rows in 320 640 1280; do
  bash scripts/r5_probe_wait.sh
  timeout 2400 env DESIRE_IOC_MAX_ROWS=$rows python - <<'PYEOF' 2>/tmp/r5_q3_err_$rows.log || echo "{\"rows\": $rows, \"rc\": 1, \"err\": \"$(tail -c 300 /tmp/r5_q3_err_$rows.log | tr '\n\"' '  ')\"}"
import sys, json, os
sys.path.insert(0, '/root/repo')
import bench
bench._algo_cost = lambda *a: (0.0, 0.0)
tps, dt, mfu, hbm = bench.bench(iters=8, warmup=3)
print(json.dumps({"rows": int(os.environ["DESIRE_IOC_MAX_ROWS"]),
                  "fwd_ms": round(dt*1e3, 2), "traj_per_sec": round(tps)}))
PYEOF
done | tee /tmp/r5_rows_sweep.jsonl

# freeze variant at the best plain rows (ranking-first serving pick)
bash scripts/r5_probe_wait.sh
timeout 2400 env DESIRE_IOC_MAX_ROWS=640 DESIRE_SOCIAL_FREEZE=1 python - <<'PYEOF' 2>>/tmp/r5_q3_err.log || true
import sys, json
sys.path.insert(0, '/root/repo')
import bench
bench._algo_cost = lambda *a: (0.0, 0.0)
tps, dt, mfu, hbm = bench.bench(iters=8, warmup=3)
print(json.dumps({"rows": 640, "freeze": 1, "fwd_ms": round(dt*1e3, 2)}))
PYEOF

# K=50 at 640 rows (the eval config; rows sweep may differ at bigger K)
bash scripts/r5_probe_wait.sh
timeout 2400 env DESIRE_IOC_MAX_ROWS=640 python - <<'PYEOF' 2>>/tmp/r5_q3_err.log || true
import sys, json
sys.path.insert(0, '/root/repo')
import bench
bench._algo_cost = lambda *a: (0.0, 0.0)
cfg = bench.flagship_cfg().replace(num_samples=50)
tps, dt, mfu, hbm = bench.bench(cfg=cfg, iters=6, warmup=2)
print(json.dumps({"rows": 640, "k": 50, "fwd_ms": round(dt*1e3, 2)}))
PYEOF

echo R5_Q3_DONE
