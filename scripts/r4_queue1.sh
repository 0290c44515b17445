#!/bin/bash
# Round-4 queue 1: perf A/B sweep (re-lands the r3b queue that died in
# the relay outage). Output: /tmp/r4_ab.jsonl (one JSON line per
# measurement) + /tmp/r4_winner.env (fastest train combo, sourced by the
# flagship retrain in r4_queue2.sh).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
bash scripts/r4_probe_wait.sh
python scripts/r4_ab.py > /tmp/r4_ab.jsonl 2>/tmp/r4_ab_err.log
echo R4_Q1_DONE
