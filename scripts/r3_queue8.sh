#!/bin/bash
# Final decision queue (after r3_queue7.sh): if the aniso-bound triage
# beats the new-defaults 40-epoch reference (t_both, RESULTS triage table:
# minADE 16.18 / bikes+ 38.1) on minADE + 0.1*bikes, run the 100-epoch
# aniso flagship + eval sweep; the existing save/r3_final already covers
# the new-defaults 100-epoch recipe, so nothing extra runs otherwise.
# Also retries the jax.profiler path (RESULTS round-4 lever 1: the tunnel's
# profiler was down when the VPU-bound hypothesis was formed).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
D=/root/reference/data

WIN=$(python3 - <<'EOF'
import json

def stats(path):
    out = {}
    for line in open(path):
        if not line.strip():
            continue
        r = json.loads(line)
        if "minADE_px" in r:
            out["minADE"] = r["minADE_px"]
        for k, v in r.get("speed_classes", {}).items():
            if "20,inf" in k or "20.0,inf" in k:
                out["bikes"] = v["minADE_px"]
    return out

try:
    a = stats("save/t_aniso/eval_heldout_k20.json")
    score_aniso = a["minADE"] + 0.1 * a["bikes"]
    score_ref = 16.18 + 0.1 * 38.1      # t_both 40-epoch triage row
    print("aniso" if score_aniso < score_ref else "defaults")
except Exception:
    print("defaults")
EOF
)
echo "QUEUE8 decision: $WIN" >> /tmp/r3_chain_decision.log

if [ "$WIN" = "aniso" ]; then
  python train.py --data_dir "$D" --num_epochs 100 --batch_size 64 \
      --aniso_bound 1 --save_dir save/r3_final_aniso 2>&1 | tail -3
  for k in 20 50; do
    python evaluate.py --save_dir save/r3_final_aniso --data_dir "$D" \
        --batch_size 64 --num_samples $k --per_scene 1 --horizons 1,2,3,4 \
        --calibration 1 --speed_bins 2,8,20 \
        > save/r3_final_aniso/eval_heldout_k${k}.json 2>>/tmp/q8_err.log
  done
fi

# profiler retry: trace a few bench forward iterations (harmless if the
# tunnel's profiler service is still down)
timeout 900 python - > /tmp/bench_profiled.json 2>>/tmp/q8_err.log <<'EOF' || true
import json, sys
sys.path.insert(0, '/root/repo')
import jax
import jax.profiler
import bench
with jax.profiler.trace("/tmp/r3_profile"):
    tps, dt, mfu, hbm = bench.bench(iters=6, warmup=2)
print(json.dumps({"profiled_fwd_ms": round(dt * 1e3, 2),
                  "trace_dir": "/tmp/r3_profile"}))
EOF

echo QUEUE8_DONE
