#!/bin/bash
# Round-5 queue 11 (opportunistic tail): 40-epoch training-numerics A/B for
# the 640-row chunk (train 214.9 vs 241.6 ms; flips the default only if
# held-out accuracy is neutral — the batch-wgrad lesson).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
D=/root/reference/data
rm -rf save/r5_rows640
for attempt in 1 2 3 4 5 6; do
  bash scripts/r5_probe_wait.sh
  RES=$([ -f save/r5_rows640/config.json ] && echo "--resume 1" || echo "")
  timeout 5400 env DESIRE_IOC_MAX_ROWS=640 python train.py --data_dir "$D" \
      --num_epochs 40 --batch_size 64 $RES \
      --save_dir save/r5_rows640 2>&1 | tail -2
  grep -q '"event": "final_select"' save/r5_rows640/metrics.jsonl 2>/dev/null && break
done
bash scripts/r5_probe_wait.sh
timeout 2400 python evaluate.py --save_dir save/r5_rows640 --data_dir "$D" \
    --batch_size 64 --num_samples 20 --best 1 --per_scene 1 \
    > save/r5_rows640/eval_best_k20.json 2>>/tmp/r5_q11_err.log || true
tail -1 save/r5_rows640/eval_best_k20.json | head -c 300
python scripts/r5_img_report.py save/r4_ztemp_a save/r5_rows640 || true
echo R5_Q11_DONE
