#!/bin/bash
# Round-3b perf A/B queue (no checkpoint dependencies — runs on a fresh VM
# where save/ was lost): measure the staged-but-never-measured knobs from
# RESULTS.md's round-4 lever list on the real chip.
#   1. DESIRE_TENT_MM (factorized bf16 scene-tent build) fwd + train A/B
#   2. combined tent_mm + social_freeze inference bound
#   3. jax.profiler retry (the tunnel's profiler was down last session)
# Each step is timeout-bounded: the tunnel's compile service intermittently
# hangs and a hung step must not wedge the queue.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

T=1500

timeout $T python bench.py > /tmp/r3b_base.json 2>/tmp/r3b_err.log
timeout $T env DESIRE_TENT_MM=1 python bench.py \
    > /tmp/r3b_tent.json 2>>/tmp/r3b_err.log
timeout $T env DESIRE_TENT_MM=1 python bench.py --breakdown \
    > /tmp/r3b_tent_breakdown.json 2>>/tmp/r3b_err.log

# train-step A/B: bench_train directly (full ladder is too slow for this
# window), base vs tent_mm
for v in base tent; do
  [ "$v" = tent ] && export DESIRE_TENT_MM=1 || unset DESIRE_TENT_MM
  timeout $T python - > /tmp/r3b_train_$v.json 2>>/tmp/r3b_err.log <<'EOF'
import json, sys, os
sys.path.insert(0, '/root/repo')
import bench
sps, dt, mfu, hbm = bench.bench_train(iters=8, warmup=3)
print(json.dumps({"variant": os.environ.get("DESIRE_TENT_MM", "0"),
                  "ms_per_step": round(dt * 1e3, 1),
                  "steps_per_sec": round(sps, 2)}), flush=True)
EOF
done
unset DESIRE_TENT_MM

# combined inference bound (bench-only semantics change, documented)
timeout $T env DESIRE_TENT_MM=1 DESIRE_SOCIAL_FREEZE=1 python bench.py \
    > /tmp/r3b_tent_freeze.json 2>>/tmp/r3b_err.log

# row-cap sweep (RESULTS round-4 lever 4): kc=1 (max_rows=64) removes the
# 5x block-diagonal attention waste; crossed with tent_mm. Numerically
# exact (attention is per-lane block-diagonal regardless of chunking).
for mr in 64 128 320; do
  timeout $T env DESIRE_IOC_MAX_ROWS=$mr python bench.py \
      > /tmp/r3b_rows_${mr}.json 2>>/tmp/r3b_err.log
  timeout $T env DESIRE_IOC_MAX_ROWS=$mr DESIRE_TENT_MM=1 python bench.py \
      > /tmp/r3b_rows_${mr}_tent.json 2>>/tmp/r3b_err.log
done

# winner train-step: pick the fastest fwd combo from the sweep above and
# measure its train step (the env knobs feed _pick_chunk/tent_mm in the
# backward too)
timeout $T python - > /tmp/r3b_train_best.json 2>>/tmp/r3b_err.log <<'EOF'
import glob, json, os, re, subprocess, sys
best, best_ms = None, 1e9
for p in glob.glob("/tmp/r3b_*.json"):
    try:
        d = json.loads(open(p).read().strip().splitlines()[-1])
    except Exception:
        continue
    ms = d.get("fwd_ms")
    if ms and "freeze" not in p and ms < best_ms:
        best, best_ms = p, ms
env = dict(os.environ)
if best and "tent" in best:
    env["DESIRE_TENT_MM"] = "1"
m = re.search(r"rows_(\d+)", best or "")
if m:
    env["DESIRE_IOC_MAX_ROWS"] = m.group(1)
print(json.dumps({"best_fwd_combo": best, "fwd_ms": best_ms}), flush=True)
r = subprocess.run([sys.executable, "-c", (
    "import sys, json; sys.path.insert(0, '/root/repo');\n"
    "import bench\n"
    "sps, dt, mfu, hbm = bench.bench_train(iters=8, warmup=3)\n"
    "print(json.dumps({'ms_per_step': round(dt*1e3,1),"
    " 'steps_per_sec': round(sps,2)}))")], env=env,
    capture_output=True, text=True, timeout=1400)
print(r.stdout.strip(), flush=True)
EOF

# profiler retry: trace a few forward iterations
timeout 900 python - > /tmp/r3b_profiled.json 2>>/tmp/r3b_err.log <<'EOF' || true
import json, sys
sys.path.insert(0, '/root/repo')
import jax, jax.profiler
import bench
with jax.profiler.trace("/tmp/r3b_profile"):
    tps, dt, mfu, hbm = bench.bench(iters=6, warmup=2)
print(json.dumps({"profiled_fwd_ms": round(dt * 1e3, 2),
                  "trace_dir": "/tmp/r3b_profile"}))
EOF

echo R3B_AB_DONE
