#!/usr/bin/env bash
# Endgame automation for the config-5 (K=50) run: wait for the training
# PID to exit, then on the freed chip run the full evaluation sweep for
# the K=50 checkpoint, the clean single-tenant benchmark, and the
# stage-by-stage breakdown. All outputs land next to the checkpoint.
#
#   bash scripts/post_k50.sh <train_pid> <ckpt_dir> [data_dir]
set -uo pipefail
PID=${1:?train pid}
CKPT=${2:?ckpt dir}
DATA=${3:-/root/reference/data}

while kill -0 "$PID" 2>/dev/null; do sleep 30; done
sleep 10

bash scripts/final_eval_sweep.sh "$CKPT" "$DATA" > "$CKPT/sweep.out" 2>&1

python bench.py > "$CKPT/bench_clean.json" 2> "$CKPT/bench_clean.err"
python bench.py --breakdown 2> "$CKPT/breakdown.jsonl" || true
echo done > "$CKPT/post_k50.done"
