#!/bin/bash
# Wait for a done-marker line to appear in a log (cannot append to a
# running bash script — bash reads it incrementally), then run the
# follow-on queues given as arguments. Usage:
#   nohup bash scripts/r3_after_chain.sh CHAIN_ALL_DONE /tmp/q3b.log \
#       scripts/r3_queue7.sh &
# Each queue's output goes to /tmp/<queue-name>.log (which the NEXT
# waiter can watch for that queue's own done marker).
set -x
cd /root/repo
MARKER=${1:?usage: r3_after_chain.sh <marker> <log> <queue.sh>...}
LOG=${2:?usage: r3_after_chain.sh <marker> <log> <queue.sh>...}
shift 2

while ! grep -q "$MARKER" "$LOG" 2>/dev/null; do sleep 60; done
for q in "$@"; do
  bash "$q" > "/tmp/$(basename "$q" .sh).log" 2>&1
done
echo AFTER_CHAIN_DONE
