#!/bin/bash
# Round-5 queue 2: scene-imagery A/B (VERDICT item 7). Train the 40-epoch
# triage recipe with the occupancy-prior scene raster and compare held-out
# numbers (overall + deathCircle/little, the static-layout scenes) against
# the imagery-less 40-epoch control save/r4_ztemp_a (identical recipe/seed,
# trained WGRAD=0-era like the round-5 defaults).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
D=/root/reference/data
T=2400

bash scripts/r5_probe_wait.sh
rm -rf save/r5_img
timeout 10800 python train.py --data_dir "$D" \
    --num_epochs 40 --batch_size 64 --scene_image_channels 1 \
    --save_dir save/r5_img 2>&1 | tail -3

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
