#!/bin/bash
# Round-4 queue 9 PRE-step (invoked by r4_queue9.sh before the flagship
# retrain): on-chip A/B of the banded social attention
# (DESIRE_SOCIAL_BAND — ops/ioc_fused.py _social_band_default). The band
# form shrinks the kernel's largest VPU stage (in-kernel ablation: ~12 ms
# of the 60 ms forward) kc-fold and the backward's attention scratch 5x.
# Numerics-neutral (~1 ULP, parity-tested), so the A/B is pure perf and
# the retrain that follows does not depend on its outcome.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
T=1500

FWD='import sys, json, os; sys.path.insert(0, "/root/repo")
import bench
bench._algo_cost = lambda *a: (0.0, 0.0)
tps, dt, mfu, hbm = bench.bench(iters=8, warmup=3)
print(json.dumps({"band": os.environ.get("DESIRE_SOCIAL_BAND", "0"),
                  "msg_ink": os.environ.get("DESIRE_MSG_INKERNEL", "0"),
                  "fwd_ms": round(dt*1e3, 2), "traj_per_sec": round(tps)}))'
TRAIN='import sys, json, os; sys.path.insert(0, "/root/repo")
import bench
bench._algo_cost = lambda *a: (0.0, 0.0)
sps, dt, mfu, hbm = bench.bench_train(iters=6, warmup=2)
print(json.dumps({"band": os.environ.get("DESIRE_SOCIAL_BAND", "0"),
                  "wgrad": os.environ.get("DESIRE_IOC_BATCH_WGRAD", "0"),
                  "train_step_ms": round(dt*1e3, 2)}))'

# forward matrix: banded attention x in-kernel msg (both numerics-neutral)
for combo in "0 0" "1 0" "0 1" "1 1"; do
  set -- $combo
  bash scripts/r4_probe_wait.sh
  timeout $T env DESIRE_SOCIAL_BAND=$1 DESIRE_MSG_INKERNEL=$2 \
      python -c "$FWD" | tee -a /tmp/r4_band_ab.json || true
done
# train step: banded attention x batched weight-grad contractions
# (msg stays explicit on the trainable path)
for combo in "0 0" "1 0" "0 1" "1 1"; do
  set -- $combo
  bash scripts/r4_probe_wait.sh
  timeout $T env DESIRE_SOCIAL_BAND=$1 DESIRE_IOC_BATCH_WGRAD=$2 \
      python -c "$TRAIN" | tee -a /tmp/r4_band_ab.json || true
done
echo R4_BAND_AB_DONE
