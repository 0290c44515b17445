#!/bin/bash
# Round-4 queue 10 (chained after R4_Q9_DONE): resolve the flagship2
# regression + promote the best model to the headline.
#
# Finding (r4, this session): ztemp_a (queue7, 40 ep, trained BEFORE
# DESIRE_IOC_BATCH_WGRAD existed) reached held-out minADE@20 14.45-14.75
# by epochs 32-39; flagship2 (queue9, identical config.json except
# num_epochs, trained with WGRAD=1) sat at ~16.4 over the same epochs.
# WGRAD is the only knowingly numerics-changing default flipped between
# the runs (f32 accumulation, different order). Hypothesis test:
# flagship3 = the identical 100-epoch recipe with WGRAD=0. If its curve
# tracks ztemp_a (~14.7 by ep40) the knob degrades training and its
# default flips to 0; if it tracks flagship2 (~16.4) the gap was
# run-to-run chaos and the default stays 1.
#
# Meanwhile ztemp_a is the best model in the repo — give it the full
# best-ckpt headline rows so RESULTS can cite it either way.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
D=/root/reference/data
T=1500

# 0) on-chip perf A/B: T-blocked social attention (bitwise-neutral knob,
#    parity-tested this session) — quick, and its default flip is safe
bash scripts/r4_probe_wait.sh
timeout 7200 python scripts/r4_tb_ab.py | tee /tmp/r4_tb_ab.jsonl || true

# 1) ztemp_a best-ckpt headline rows (best == final: ep39 of 40)
for row in "k20 --num_samples 20 --calibration 1" \
           "k50 --num_samples 50" \
           "k20_zt1.6 --num_samples 20 --z_temp_fast 1.6" \
           "k50_zt1.6 --num_samples 50 --z_temp_fast 1.6"; do
  name=${row%% *}; args=${row#* }
  bash scripts/r4_probe_wait.sh
  timeout $T python evaluate.py --save_dir save/r4_ztemp_a --data_dir "$D" \
      --batch_size 64 --best 1 --per_scene 1 --speed_bins 2,8,20 \
      --horizons 1,2,3,4 $args \
      > "save/r4_ztemp_a/eval_best_$name.json" 2>>/tmp/r4_q10_err.log || true
  tail -1 "save/r4_ztemp_a/eval_best_$name.json"
done

# 2) flagship3: the WGRAD=0 100-epoch control (identical recipe otherwise)
bash scripts/r4_probe_wait.sh
rm -rf save/r4_flagship3
timeout 10800 env DESIRE_SOCIAL_BAND=0 DESIRE_IOC_BATCH_WGRAD=0 \
    python train.py --data_dir "$D" \
    --num_epochs 100 --batch_size 64 \
    --z_temp_learn 1 --prior_lane_frac 0.3 --w_prior_nll 0.5 \
    --save_dir save/r4_flagship3 2>&1 | tail -3

# 3) full sweep + best-ckpt rows on flagship3
bash scripts/r4_probe_wait.sh
timeout 7200 bash scripts/final_eval_sweep.sh save/r4_flagship3 "$D" \
    2>>/tmp/r4_q10_err.log || true
for row in "k20 --num_samples 20 --calibration 1" \
           "k50 --num_samples 50" \
           "k20_zt1.6 --num_samples 20 --z_temp_fast 1.6" \
           "k50_zt1.6 --num_samples 50 --z_temp_fast 1.6"; do
  name=${row%% *}; args=${row#* }
  bash scripts/r4_probe_wait.sh
  timeout $T python evaluate.py --save_dir save/r4_flagship3 --data_dir "$D" \
      --batch_size 64 --best 1 --per_scene 1 --speed_bins 2,8,20 \
      --horizons 1,2,3,4 $args \
      > "save/r4_flagship3/eval_best_$name.json" 2>>/tmp/r4_q10_err.log || true
  tail -1 "save/r4_flagship3/eval_best_$name.json"
done

echo R4_Q10_DONE
