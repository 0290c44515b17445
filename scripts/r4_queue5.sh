#!/bin/bash
# Round-4 queue 5 (chained after R4_Q4_DONE): social_freeze, post-VMEM-fix.
# The r4_queue3 freeze triage died in an AOT VMEM OOM (rows=320 freeze
# kernel needs 16.30M scoped VMEM vs the v5e 16M limit); ops/ioc_fused.py
# now clamps the freeze row chunk to 256. Re-land:
#   1. freeze fwd bench bound (the r4b A/B row that recorded {"failed"})
#   2. 40-epoch freeze-trained triage + held-out eval (the VERDICT item-6
#      decision input: default the flag or delete it)
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
D=/root/reference/data
T=1500

bash scripts/r4_probe_wait.sh

FWD='import sys, json; sys.path.insert(0, "/root/repo")
import bench
bench._algo_cost = lambda *a: (0.0, 0.0)
tps, dt, mfu, hbm = bench.bench(iters=8, warmup=3)
print(json.dumps({"fwd_ms": round(dt*1e3, 2), "traj_per_sec": round(tps)}))'

: > /tmp/r4_freeze_ab.jsonl
for v in "DESIRE_SOCIAL_FREEZE=1" "DESIRE_SOCIAL_FREEZE=0"; do
  echo "{\"variant\": \"$v\"}" >> /tmp/r4_freeze_ab.jsonl
  timeout $T env $v python -c "$FWD" >> /tmp/r4_freeze_ab.jsonl \
      2>>/tmp/r4_freeze_err.log || echo '{"failed": true}' >> /tmp/r4_freeze_ab.jsonl
done
cat /tmp/r4_freeze_ab.jsonl

# Full sweep on the flagship BEST ckpt (early stopping on held-out
# minADE): the r4 headline table. The r4_queue2 sweep ran the final
# epoch (16.60 px); the best ckpt is 16.18 px and all the z_temp/refine
# frontier evals already used it — make the headline coherent.
CK=save/r4_flagship
common=(--save_dir "$CK" --data_dir "$D" --batch_size 64 --best 1
        --per_scene 1 --horizons 1,2,3,4 --speed_bins 2,8,20)
timeout $T python evaluate.py "${common[@]}" --num_samples 20 \
    --calibration 1 > "$CK/eval_best_k20.json" 2>>/tmp/r4_freeze_err.log || true
tail -1 "$CK/eval_best_k20.json"
timeout $T python evaluate.py "${common[@]}" --num_samples 50 \
    > "$CK/eval_best_k50.json" 2>>/tmp/r4_freeze_err.log || true
tail -1 "$CK/eval_best_k50.json"
timeout $T python evaluate.py "${common[@]}" --num_samples 20 \
    --z_temp_fast 1.6 > "$CK/eval_best_k20_zt16.json" \
    2>>/tmp/r4_freeze_err.log || true
tail -1 "$CK/eval_best_k20_zt16.json"
timeout $T python evaluate.py "${common[@]}" --num_samples 50 \
    --z_temp_fast 1.6 > "$CK/eval_best_k50_zt16.json" \
    2>>/tmp/r4_freeze_err.log || true
tail -1 "$CK/eval_best_k50_zt16.json"

# freeze-trained triage (same recipe as r4_queue3, minus the OOM)
bash scripts/r4_probe_wait.sh
rm -rf save/r4_freeze
timeout 7200 python train.py --data_dir "$D" --num_epochs 40 \
    --batch_size 64 --social_freeze 1 \
    --save_dir save/r4_freeze 2>&1 | tail -3
bash scripts/r4_probe_wait.sh
timeout $T python evaluate.py --save_dir save/r4_freeze --data_dir "$D" \
    --batch_size 64 --num_samples 20 --speed_bins 2,8,20 --per_scene 1 \
    > save/r4_freeze/eval_heldout_k20.json 2>>/tmp/r4_freeze_err.log || true
tail -1 save/r4_freeze/eval_heldout_k20.json
echo R4_Q5_DONE
