#!/bin/bash
# Round-5 queue 4: retrofit the train-split-fitted rank blend onto the
# flagship best checkpoint (it predates rank_blend_fit), then re-run the
# zero-flag headline rows — top-1 then needs no eval flag.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
D=/root/reference/data
T=2400

bash scripts/r5_probe_wait.sh
timeout $T python - <<'PYEOF' 2>>/tmp/r5_q4_err.log || true
import sys, os, json
sys.path.insert(0, '/root/repo')
from desire_tpu.config import DesireConfig
from desire_tpu.data.loader import SDDLoader
from desire_tpu.eval.sampler import fit_rank_blend
from desire_tpu.serve import Predictor
from desire_tpu.train import checkpoint as ckpt_mod

save = 'save/r4_flagship3'
pred = Predictor(save, best=True)
cfg = pred.cfg.replace(data_dir='/root/reference/data')
fit_loader = SDDLoader(cfg.replace(window_hop=cfg.eval_hop), split='train',
                       drop_remainder=False)
bl, diag = fit_rank_blend(pred.params, cfg, fit_loader)
print(json.dumps(dict(diag, blend=bl)))
cfg_out = ckpt_mod.load_config(os.path.join(save, 'best')).replace(
    rank_blend_fit=float(bl))
with open(os.path.join(save, 'best', 'config.json'), 'w') as f:
    f.write(cfg_out.to_json())
print('wrote', os.path.join(save, 'best', 'config.json'))
PYEOF

# zero-flag headline rows with the fitted blend active by default
for row in "k20_rbfit --num_samples 20 --per_scene 1 --speed_bins 2,8,20" \
           "k50_rbfit --num_samples 50"; do
  name=${row%% *}; args=${row#* }
  bash scripts/r5_probe_wait.sh
  timeout $T python evaluate.py --save_dir save/r4_flagship3 --data_dir "$D" \
      --batch_size 64 --best 1 $args \
      > "save/r4_flagship3/eval_best_$name.json" 2>>/tmp/r5_q4_err.log || true
  tail -1 "save/r4_flagship3/eval_best_$name.json" | head -c 400
done
echo R5_Q4_DONE
