#!/bin/bash
# Wait for the running queue3b->4->5->6 chain (cannot append to a running
# bash script — bash reads it incrementally), then run the follow-on
# queues given as arguments. Usage:
#   nohup bash scripts/r3_after_chain.sh /tmp/q3b.log scripts/r3_queue7.sh &
set -x
cd /root/repo
LOG=${1:?usage: r3_after_chain.sh <chain_log> <queue.sh>...}
shift

while ! grep -q CHAIN_ALL_DONE "$LOG" 2>/dev/null; do sleep 60; done
for q in "$@"; do
  bash "$q" > "/tmp/$(basename "$q" .sh).log" 2>&1
done
echo AFTER_CHAIN_DONE
