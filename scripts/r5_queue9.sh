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

bash scripts/r5_probe_wait.sh
timeout $T python bench.py 2>/dev/null | tail -1
echo R5_Q9_DONE
