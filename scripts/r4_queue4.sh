#!/bin/bash
# Round-4 queue 4 (chained after R4_ALL_DONE): the IOC per-pass levers +
# the fast-agent levers, now that the r4 flagship checkpoint exists.
#   1. in-kernel stage decomposition (DESIRE_IOC_ABLATE bench-only knob):
#      what a trace cannot see inside the opaque fused call
#   2. DESIRE_TENT_BF16 + plain DESIRE_SOCIAL_FREEZE fwd bounds
#   3. z_temp_fast sweep on the flagship ckpt (eval-only fast-agent
#      spread: applies ONLY above 20 px/step, walkers untouched)
#   4. tent_bf16 numerics check (same ckpt eval under the env knob)
#   5. 40-epoch pace_lanes subset triage (train + speed-bin eval)
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
D=/root/reference/data
CK=save/r4_flagship
T=1500

bash scripts/r4_probe_wait.sh

FWD='import sys, json; sys.path.insert(0, "/root/repo")
import bench
bench._algo_cost = lambda *a: (0.0, 0.0)
tps, dt, mfu, hbm = bench.bench(iters=8, warmup=3)
print(json.dumps({"fwd_ms": round(dt*1e3, 2), "traj_per_sec": round(tps)}))'

: > /tmp/r4b_ab.jsonl
for v in "DESIRE_IOC_ABLATE=scene" "DESIRE_IOC_ABLATE=social" \
         "DESIRE_TENT_BF16=1" "DESIRE_SOCIAL_FREEZE=1" \
         "DESIRE_TENT_BF16=1 DESIRE_SOCIAL_FREEZE=1"; do
  echo "{\"variant\": \"$v\"}" >> /tmp/r4b_ab.jsonl
  timeout $T env $v python -c "$FWD" >> /tmp/r4b_ab.jsonl \
      2>>/tmp/r4b_ab_err.log || echo '{"failed": true}' >> /tmp/r4b_ab.jsonl
done

# TRAIN-step trace (the r4 fwd trace landed; the backward's ~140 ms has
# never been profiled — is it the bwd kernel or XLA glue?)
timeout 900 python - > /tmp/r4b_train_profile.json 2>>/tmp/r4b_err.log <<'EOF' || true
import json, sys
sys.path.insert(0, '/root/repo')
import jax, jax.profiler
import bench
bench._algo_cost = lambda *a: (0.0, 0.0)
with jax.profiler.trace('/tmp/r4_profile_train'):
    sps, dt, mfu, hbm = bench.bench_train(iters=6, warmup=2)
print(json.dumps({"profiled_train_ms": round(dt*1e3, 1),
                  "trace_dir": "/tmp/r4_profile_train"}))
EOF

# z_temp_fast sweep on the flagship best ckpt (eval-only; bikes-only knob)
for zt in 1.0 1.3 1.6 2.0; do
  timeout $T python evaluate.py --save_dir "$CK" --data_dir "$D" \
      --batch_size 64 --num_samples 20 --best 1 --speed_bins 2,8,20 \
      --z_temp_fast $zt > "$CK/eval_ztemp_${zt}.json" \
      2>>/tmp/r4b_err.log || true
  tail -1 "$CK/eval_ztemp_${zt}.json"
done

# refinement-depth frontier: the flagship trains at num_refine=4; if
# inference at 2-3 passes holds minADE, the fwd path sheds 2/5 - 1/5 of
# the IOC kernel cost (explicit --num_refine overrides ckpt geometry)
for nr in 2 3; do
  timeout $T python evaluate.py --save_dir "$CK" --data_dir "$D" \
      --batch_size 64 --num_samples 20 --best 1 --num_refine $nr \
      > "$CK/eval_refine${nr}.json" 2>>/tmp/r4b_err.log || true
  tail -1 "$CK/eval_refine${nr}.json"
done

# tent_bf16 numerics: same eval under the knob (diff vs eval_ztemp_1.0)
timeout $T env DESIRE_TENT_BF16=1 python evaluate.py --save_dir "$CK" \
    --data_dir "$D" --batch_size 64 --num_samples 20 --best 1 \
    --speed_bins 2,8,20 > "$CK/eval_tentbf16.json" 2>>/tmp/r4b_err.log || true
tail -1 "$CK/eval_tentbf16.json"

# pace_lanes subset triage (fast-agent trained lever, RESULTS table row)
bash scripts/r4_probe_wait.sh
timeout 7200 python train.py --data_dir "$D" --num_epochs 40 \
    --batch_size 64 --pace_range 0.5 --pace_lanes 6 \
    --save_dir save/r4_pacelanes 2>&1 | tail -3
timeout $T python evaluate.py --save_dir save/r4_pacelanes --data_dir "$D" \
    --batch_size 64 --num_samples 20 --speed_bins 2,8,20 --per_scene 1 \
    > save/r4_pacelanes/eval_heldout_k20.json 2>>/tmp/r4b_err.log || true
tail -1 save/r4_pacelanes/eval_heldout_k20.json

# final single-tenant bench under the shipped defaults (RESULTS r4 row)
bash scripts/r4_probe_wait.sh
timeout $T python bench.py > /tmp/r4_bench_final.json 2>>/tmp/r4b_err.log || true
cat /tmp/r4_bench_final.json
echo R4_Q4_DONE
