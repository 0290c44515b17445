#!/bin/bash
# Round-5 queue 8: the rows x SOCIAL_KC matrix. 1280-row chunks already
# win the fwd 59.2 -> 53.1 ms; KC shrinks the dense social's rows^2 waste
# 20x at kc=20, so the combination is the fwd candidate. Training at 1280
# rows needs KC (the dense (T,rows,rows) attention scratch alone is 78 MB).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
D=/root/reference/data

fwd_probe () {  # args: tag env...
  local tag=$1; shift
  bash scripts/r5_probe_wait.sh
  timeout 2400 env "$@" python - <<PYEOF 2>/tmp/r5_q8_err_$tag.log || echo "{\"tag\": \"$tag\", \"rc\": 1, \"err\": \"$(tail -c 250 /tmp/r5_q8_err_$tag.log | tr '\n\"' '  ')\"}"
import sys, json
sys.path.insert(0, '/root/repo')
import bench
bench._algo_cost = lambda *a: (0.0, 0.0)
tps, dt, mfu, hbm = bench.bench(iters=8, warmup=3)
print(json.dumps({"tag": "$tag", "fwd_ms": round(dt*1e3, 2),
                  "traj_per_sec": round(tps)}))
PYEOF
}
train_probe () {
  local tag=$1; shift
  bash scripts/r5_probe_wait.sh
  timeout 2400 env "$@" python - <<PYEOF 2>/tmp/r5_q8t_err_$tag.log || echo "{\"tag\": \"$tag\", \"rc\": 1, \"err\": \"$(tail -c 250 /tmp/r5_q8t_err_$tag.log | tr '\n\"' '  ')\"}"
import sys, json
sys.path.insert(0, '/root/repo')
import bench
bench._algo_cost = lambda *a: (0.0, 0.0)
sps, dt, mfu, hbm = bench.bench_train(iters=6, warmup=2)
print(json.dumps({"tag": "$tag", "train_ms": round(dt*1e3, 1)}))
PYEOF
}

{
fwd_probe kc1_r320  DESIRE_SOCIAL_KC=1 DESIRE_IOC_MAX_ROWS=320
fwd_probe kc1_r1280 DESIRE_SOCIAL_KC=1 DESIRE_IOC_MAX_ROWS=1280
fwd_probe kc1_r1280_freeze DESIRE_SOCIAL_KC=1 DESIRE_IOC_MAX_ROWS=1280 DESIRE_SOCIAL_FREEZE=1
bash scripts/r5_probe_wait.sh
timeout 2400 env DESIRE_SOCIAL_KC=1 DESIRE_IOC_MAX_ROWS=1600 python - <<'PYEOF' 2>/tmp/r5_q8_err_k50.log || echo "{\"tag\": \"k50_kc1_r1600\", \"rc\": 1, \"err\": \"$(tail -c 250 /tmp/r5_q8_err_k50.log | tr "\n\"" "  ")\"}"
import sys, json
sys.path.insert(0, '/root/repo')
import bench
bench._algo_cost = lambda *a: (0.0, 0.0)
tps, dt, mfu, hbm = bench.bench(cfg=bench.flagship_cfg(K=50), iters=6, warmup=2)
print(json.dumps({"tag": "k50_kc1_r1600", "fwd_ms": round(dt*1e3, 2),
                  "traj_per_sec": round(tps)}))
PYEOF
train_probe t_kc0_r320  DESIRE_SOCIAL_KC=0 DESIRE_IOC_MAX_ROWS=320
train_probe t_kc1_r320  DESIRE_SOCIAL_KC=1 DESIRE_IOC_MAX_ROWS=320
train_probe t_kc1_r640  DESIRE_SOCIAL_KC=1 DESIRE_IOC_MAX_ROWS=640
train_probe t_kc1_r1280 DESIRE_SOCIAL_KC=1 DESIRE_IOC_MAX_ROWS=1280
} | tee /tmp/r5_matrix.jsonl

# numerics spot checks: 4-batch held-out eval at the fwd candidate
for envset in "DESIRE_SOCIAL_KC=1 DESIRE_IOC_MAX_ROWS=1280" \
              "DESIRE_SOCIAL_KC=0 DESIRE_IOC_MAX_ROWS=320"; do
  bash scripts/r5_probe_wait.sh
  timeout 1800 env $envset python evaluate.py \
      --save_dir save/r4_flagship3 --data_dir "$D" \
      --batch_size 64 --num_samples 20 --best 1 --max_eval_batches 4 \
      2>>/tmp/r5_q8_err.log | tail -1 | head -c 200
  echo " [$envset]"
done
echo R5_Q8_DONE
