#!/bin/bash
# Round-5 queue 2: scene-imagery A/B (VERDICT item 7). Train the 40-epoch
# triage recipe with the occupancy-prior scene raster and compare held-out
# numbers (overall + deathCircle/little, the static-layout scenes) against
# the imagery-less 40-epoch control save/r4_ztemp_a (identical recipe/seed,
# trained WGRAD=0-era like the round-5 defaults).
set -x
cd /root/repo
# idempotence: an earlier chain already completed this queue
if [ -s save/r5_img/eval_best_k50.json ]; then
  echo "r5_img already trained+evaled; skipping"
  echo R5_Q2_DONE
  exit 0
fi
export PYTHONPATH=/root/repo:/root/.axon_site
D=/root/reference/data
T=2400

rm -rf save/r5_img
# tunnel-drop-robust: resume-retry until the run reaches 40 epochs (the
# relay flaps every ~10 min some hours; checkpoints + --resume make the
# train loop re-entrant)
for attempt in 1 2 3 4 5 6 7 8; do
  bash scripts/r5_probe_wait.sh
  RES=$([ -f save/r5_img/config.json ] && echo "--resume 1" || echo "")
  timeout 5400 python train.py --data_dir "$D" \
      --num_epochs 40 --batch_size 64 --scene_image_channels 1 \
      $RES --save_dir save/r5_img 2>&1 | tail -2
  if python - <<'CHK'
import json, sys
done = False
try:
    for line in open('save/r5_img/metrics.jsonl'):
        r = json.loads(line)
        if r.get('event') == 'final_select':
            done = True
except FileNotFoundError:
    pass
sys.exit(0 if done else 1)
CHK
  then break; fi
done

for row in "k20 --num_samples 20 --per_scene 1 --speed_bins 2,8,20" \
           "k50 --num_samples 50 --per_scene 1"; do
  name=${row%% *}; args=${row#* }
  bash scripts/r5_probe_wait.sh
  timeout $T python evaluate.py --save_dir save/r5_img --data_dir "$D" \
      --batch_size 64 --best 1 $args \
      > "save/r5_img/eval_best_$name.json" 2>>/tmp/r5_q2_err.log || true
  tail -1 "save/r5_img/eval_best_$name.json" | head -c 400
done
echo R5_Q2_DONE
