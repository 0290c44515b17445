#!/bin/bash
# Aniso-bound triage (after the queue3b->4->5->6 chain): 40-epoch run with
# the heading-frame along/cross residual envelope (config.py aniso_bound)
# vs the isotropic default — the round-3 track decomposition localized bike
# error 2-4x ALONG-track, so the envelope should widen along the direction
# of motion without adding lateral spread. Comparable row for the RESULTS
# fast-agent triage table (same epochs/eval as t_zoom/t_freeze).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
D=/root/reference/data

python train.py --data_dir "$D" --num_epochs 40 --batch_size 64 \
    --aniso_bound 1 --save_dir save/t_aniso 2>&1 | tail -3
python evaluate.py --save_dir save/t_aniso --data_dir "$D" --batch_size 64 \
    --num_samples 20 --speed_bins 2,8,20 --per_scene 1 \
    > save/t_aniso/eval_heldout_k20.json 2>>/tmp/q7_err.log

echo QUEUE7_DONE
