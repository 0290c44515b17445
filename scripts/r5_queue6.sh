#!/bin/bash
# Round-5 queue 6: lane-block-batched social attention A/B
# (DESIRE_SOCIAL_KC; the dense (rows,rows) social stage wastes kc x VPU
# elements on all-zero lane blocks — ablation prices the stage at ~12 ms
# of the 59 ms fwd). Parity-tested in interpret mode; this is the Mosaic
# compile + speed verdict.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

for kcflag in 0 1; do
  bash scripts/r5_probe_wait.sh
  timeout 2400 env DESIRE_SOCIAL_KC=$kcflag python - <<'PYEOF' 2>/tmp/r5_q6_err_$kcflag.log || echo "{\"kc\": $kcflag, \"rc\": 1, \"err\": \"$(tail -c 300 /tmp/r5_q6_err_$kcflag.log | tr '\n\"' '  ')\"}"
import sys, json, os
sys.path.insert(0, '/root/repo')
import bench
bench._algo_cost = lambda *a: (0.0, 0.0)
tps, dt, mfu, hbm = bench.bench(iters=8, warmup=3)
print(json.dumps({"kc": int(os.environ["DESIRE_SOCIAL_KC"]),
                  "fwd_ms": round(dt*1e3, 2), "traj_per_sec": round(tps)}))
PYEOF
done | tee /tmp/r5_kc_sweep.jsonl

# numerics spot check on-chip (parity is interpret-tested; this guards the
# Mosaic lowering): tiny held-out eval slice with/without the knob
for kcflag in 0 1; do
  bash scripts/r5_probe_wait.sh
  timeout 1800 env DESIRE_SOCIAL_KC=$kcflag python evaluate.py \
      --save_dir save/r4_flagship3 --data_dir /root/reference/data \
      --batch_size 64 --num_samples 20 --best 1 --max_eval_batches 4 \
      2>>/tmp/r5_q6_err.log | tail -1 | head -c 200
  echo " kc=$kcflag"
done
echo R5_Q6_DONE
