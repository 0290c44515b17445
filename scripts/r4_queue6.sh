#!/bin/bash
# Round-4 queue 6 (chained after R4_Q5_DONE): the fused-loop IOC kernel A/B.
# ops/ioc_fused.py now merges the per-step feature build and the GRU update
# into ONE T-loop (DESIRE_IOC_FUSED_LOOP, default on): ~31% fewer serial
# fori_loop step-iterations per grid cell — the kernel's measured dominant
# cost (r4 row-cap sweep: time tracks grid-cell count, not bytes/FLOPs).
# Measures:
#   1. fwd A/B: fused vs staged two-loop (numbers bitwise-identical,
#      tests/test_kernels.py::test_fused_ioc_single_loop_matches_two_loop)
#   2. train-step A/B (fwd kernel inside the custom_vjp train step)
#   3. VMEM compile probe: 320-row fused freeze kernel (est. 14.1M scoped
#      VMEM vs the 16M v5e limit — decides whether _pick_chunk's freeze
#      clamp can relax under the fused loop)
#   4. full bench.py snapshot (headline candidate for BENCH_r04)
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
T=1500

bash scripts/r4_probe_wait.sh

FWD='import sys, json; sys.path.insert(0, "/root/repo")
import bench
bench._algo_cost = lambda *a: (0.0, 0.0)
tps, dt, mfu, hbm = bench.bench(iters=8, warmup=3)
print(json.dumps({"fwd_ms": round(dt*1e3, 2), "traj_per_sec": round(tps)}))'

TRAIN='import sys, json; sys.path.insert(0, "/root/repo")
import bench
bench._algo_cost = lambda *a: (0.0, 0.0)
sps, dt, mfu, hbm = bench.bench_train(iters=8, warmup=3)
print(json.dumps({"train_ms": round(dt*1e3, 1), "steps_per_sec": round(sps, 2)}))'

PROBE='import sys, json; sys.path.insert(0, "/root/repo")
import jax
from desire_tpu.ops import ioc_fused
ioc_fused._pick_chunk = lambda k, a_pad, **kw: 5   # force rows = 5*64 = 320
import bench
cfg = bench.flagship_cfg().replace(social_freeze=True)
params = bench._jit_init(cfg)
xy, mask, ids = bench.make_batch(cfg)
from desire_tpu.models.desire import desire_forward
def fwd(params, xy, mask, ids, key):
    return desire_forward(params, cfg, xy, mask, ids, key=key,
                          train=False)["refined_traj"]
try:
    jax.jit(fwd).lower(params, xy, mask, ids,
                       jax.random.PRNGKey(0)).compile()
    print(json.dumps({"probe": "freeze_rows320_fused", "compiled": True}))
except Exception as e:
    print(json.dumps({"probe": "freeze_rows320_fused", "compiled": False,
                      "err": str(e)[-400:]}))'

: > /tmp/r4_fusedloop_ab.jsonl
for v in 1 0; do
  echo "{\"DESIRE_IOC_FUSED_LOOP\": \"$v\", \"snippet\": \"fwd\"}" \
      >> /tmp/r4_fusedloop_ab.jsonl
  timeout $T env DESIRE_IOC_FUSED_LOOP=$v python -c "$FWD" \
      >> /tmp/r4_fusedloop_ab.jsonl 2>>/tmp/r4_q6_err.log \
      || echo '{"failed": true}' >> /tmp/r4_fusedloop_ab.jsonl
done
for v in 1 0; do
  echo "{\"DESIRE_IOC_FUSED_LOOP\": \"$v\", \"snippet\": \"train\"}" \
      >> /tmp/r4_fusedloop_ab.jsonl
  timeout $T env DESIRE_IOC_FUSED_LOOP=$v python -c "$TRAIN" \
      >> /tmp/r4_fusedloop_ab.jsonl 2>>/tmp/r4_q6_err.log \
      || echo '{"failed": true}' >> /tmp/r4_fusedloop_ab.jsonl
done
# the fused loop freed the 2.2M gi scratch; the row-cap sweep showed time
# tracks GRID-CELL count (~90us/cell) — probe whether bigger chunks now
# fit: rows=640 (kc=10, 128 cells) and rows=1280 (kc=20, 64 cells)
for r in 640 1280; do
  echo "{\"DESIRE_IOC_MAX_ROWS\": \"$r\", \"snippet\": \"fwd\"}" \
      >> /tmp/r4_fusedloop_ab.jsonl
  timeout $T env DESIRE_IOC_MAX_ROWS=$r python -c "$FWD" \
      >> /tmp/r4_fusedloop_ab.jsonl 2>>/tmp/r4_q6_err.log \
      || echo '{"failed": true}' >> /tmp/r4_fusedloop_ab.jsonl
done
cat /tmp/r4_fusedloop_ab.jsonl

bash scripts/r4_probe_wait.sh
timeout $T env DESIRE_SOCIAL_FREEZE=1 python -c "$PROBE" \
    | tee /tmp/r4_freeze320_probe.json || true

bash scripts/r4_probe_wait.sh
timeout 2400 python bench.py | tee /tmp/r4_bench_snapshot.json || true
echo R4_Q6_DONE
