#!/bin/bash
# Round-4 master chain: A/B sweep -> flagship retrain + eval ->
# social_freeze triage. Each queue logs to /tmp/r4_qN.log and ends with
# its own marker; later work is appended with scripts/r3_after_chain.sh
# watching for R4_ALL_DONE (a running bash script cannot be edited).
cd /root/repo
bash scripts/r4_queue1.sh > /tmp/r4_q1.log 2>&1
bash scripts/r4_queue2.sh > /tmp/r4_q2.log 2>&1
bash scripts/r4_queue3.sh > /tmp/r4_q3.log 2>&1
echo R4_ALL_DONE
