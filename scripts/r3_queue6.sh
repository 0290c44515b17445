#!/bin/bash
# Refinement-pass frontier (after r3_queue5.sh): the train ladder shows
# each IOC refine pass costs ~41 ms/step (fwd+bwd) and inference ~10.6 ms
# — num_refine is the single biggest perf lever left. This measures what
# accuracy it buys: a 40-epoch num_refine=2 run (train ~1.6x faster than
# the default 4), plus a train-4/eval-2 mismatch eval on the flagship
# checkpoint (cheap: does inference need all 4 passes at all?).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
D=/root/reference/data

python train.py --data_dir "$D" --num_epochs 40 --batch_size 64 \
    --num_refine 2 --save_dir save/t_refine2 2>&1 | tail -3
python evaluate.py --save_dir save/t_refine2 --data_dir "$D" \
    --batch_size 64 --num_samples 20 --speed_bins 2,8,20 --per_scene 1 \
    > save/t_refine2/eval_heldout_k20.json 2>>/tmp/q6_err.log

# flagship checkpoint, eval-time pass-count override (geometry override
# via explicit flag — evaluate.py sentinel semantics)
for nr in 2 1; do
  python evaluate.py --save_dir save/r3_final --data_dir "$D" \
      --batch_size 64 --num_samples 20 --num_refine $nr \
      > save/r3_final/eval_heldout_k20_nr${nr}.json 2>>/tmp/q6_err.log
done

echo QUEUE6_DONE
