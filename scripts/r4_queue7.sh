#!/bin/bash
# Round-4 queue 7 (chained after R4_Q6_DONE): fast-agent coverage triage
# (VERDICT r3 item 5). Two 40-epoch runs on the zero-flag recipe plus:
#   A. z_temp_learn + prior lanes + the new prior-predictive coverage term
#      (w_prior_nll): the learned speed->latent-temperature head, trained
#      through best-of-prior-lanes NLL (the inference-time objective).
#   B. control: same prior lanes + coverage term, NO temperature head —
#      attributes any delta to the head vs the coverage term itself.
# Success bar (VERDICT): bikes+ (speed>=20) minADE@20 <= 33 px with
# walkers <= 11 px and overall <= the flagship-best 16.18 px.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
D=/root/reference/data
T=1500

# calibration re-fit on the extended temperature grid (the first fit hit
# the old 0.5 lower edge and clamped; VERDICT item 9 wants held-out
# coverage@50 within +-0.05)
bash scripts/r4_probe_wait.sh
timeout $T python evaluate.py --save_dir save/r4_flagship --data_dir "$D" \
    --batch_size 64 --num_samples 20 --best 1 --calibration 1 \
    > save/r4_flagship/eval_best_k20_cal2.json 2>>/tmp/r4_q7_err.log || true
tail -1 save/r4_flagship/eval_best_k20_cal2.json

# eval-time rank_blend sweep on the flagship best ckpt: the defaults
# retrain improved the oracle but top-1 regressed 29.5 -> 32.2 px;
# blending the IOC score rank with lane likelihood is the cheap lever
for rb in 0.3 0.6; do
  bash scripts/r4_probe_wait.sh
  timeout $T python evaluate.py --save_dir save/r4_flagship --data_dir "$D" \
      --batch_size 64 --num_samples 20 --best 1 --rank_blend $rb \
      > "save/r4_flagship/eval_best_k20_rb$rb.json" \
      2>>/tmp/r4_q7_err.log || true
  tail -1 "save/r4_flagship/eval_best_k20_rb$rb.json"
done

for v in a b; do
  if [ "$v" = a ]; then
    FLAGS="--z_temp_learn 1 --prior_lane_frac 0.3 --w_prior_nll 0.5"
  else
    FLAGS="--prior_lane_frac 0.3 --w_prior_nll 0.5"
  fi
  SAVE=save/r4_ztemp_$v
  bash scripts/r4_probe_wait.sh
  rm -rf "$SAVE"
  timeout 7200 python train.py --data_dir "$D" --num_epochs 40 \
      --batch_size 64 $FLAGS --save_dir "$SAVE" 2>&1 | tail -3
  bash scripts/r4_probe_wait.sh
  timeout $T python evaluate.py --save_dir "$SAVE" --data_dir "$D" \
      --batch_size 64 --num_samples 20 --best 1 --speed_bins 2,8,20 \
      --per_scene 1 > "$SAVE/eval_heldout_k20.json" \
      2>>/tmp/r4_q7_err.log || true
  tail -1 "$SAVE/eval_heldout_k20.json"
done
echo R4_Q7_DONE
