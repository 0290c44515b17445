#!/bin/bash
# Round-5 queue 9: re-run the fitted-blend headline rows (the first run
# hit the best/-config resolution bug fixed in evaluate.py) + the final
# bench at whatever defaults won the matrix.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
D=/root/reference/data
T=2400

for row in "k20_rbfit --num_samples 20 --per_scene 1 --speed_bins 2,8,20" \
           "k50_rbfit --num_samples 50"; do
  name=${row%% *}; args=${row#* }
  bash scripts/r5_probe_wait.sh
  timeout $T python evaluate.py --save_dir save/r4_flagship3 --data_dir "$D" \
      --batch_size 64 --best 1 $args \
      > "save/r4_flagship3/eval_best_$name.json" 2>>/tmp/r5_q9_err.log || true
  tail -1 "save/r4_flagship3/eval_best_$name.json" | head -c 300; echo
done

bash scripts/r5_probe_wait.sh
timeout $T python scripts/bench_serve.py --save_dir save/r4_flagship3 \
    --iters 32 2>>/tmp/r5_q9_err.log | tail -1

# fwd device trace at the round-5 defaults (1280-row chunk): where do the
# remaining ~53 ms go?
bash scripts/r5_probe_wait.sh
timeout $T python - <<'PYEOF' 2>>/tmp/r5_q9_err.log || true
import sys, json
sys.path.insert(0, '/root/repo')
import jax, jax.profiler
import bench
bench._algo_cost = lambda *a: (0.0, 0.0)
with jax.profiler.trace('/tmp/r5_fwd_profile'):
    tps, dt, mfu, hbm = bench.bench(iters=6, warmup=2)
print(json.dumps({'profiled_fwd_ms': round(dt*1e3, 2)}))
PYEOF
timeout 600 python scripts/trace_report.py /tmp/r5_fwd_profile 20 \
    > /tmp/r5_fwd_trace_report.txt 2>&1 || true
head -24 /tmp/r5_fwd_trace_report.txt

bash scripts/r5_probe_wait.sh
timeout $T python bench.py 2>/dev/null | tail -1
echo R5_Q9_DONE
