#!/bin/bash
# Round-5 queue 7: SOCIAL_KC on the TRAIN step (the bwd kernel is 66% of
# the 242 ms step; its social adjoint carries 3-4 dense-(rows,rows)-sized
# stages per step that the kc-batched form shrinks kc-fold).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

for kcflag in 0 1; do
  bash scripts/r5_probe_wait.sh
  timeout 2400 env DESIRE_SOCIAL_KC=$kcflag python - <<'PYEOF' 2>/tmp/r5_q7_err_$kcflag.log || echo "{\"kc_train\": $kcflag, \"rc\": 1, \"err\": \"$(tail -c 300 /tmp/r5_q7_err_$kcflag.log | tr '\n\"' '  ')\"}"
import sys, json, os
sys.path.insert(0, '/root/repo')
import bench
bench._algo_cost = lambda *a: (0.0, 0.0)
sps, dt, mfu, hbm = bench.bench_train(iters=6, warmup=2)
print(json.dumps({"kc_train": int(os.environ["DESIRE_SOCIAL_KC"]),
                  "train_ms": round(dt*1e3, 1)}))
PYEOF
done | tee /tmp/r5_kc_train.jsonl
echo R5_Q7_DONE
