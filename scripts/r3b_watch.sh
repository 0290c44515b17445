#!/bin/bash
# Tunnel watcher for the round-3b session: probe the axon TPU every 2
# minutes; when a tiny jit round-trips, run the perf A/B queue
# (scripts/r3b_ab.sh). Exits after the queue completes so the launcher
# is re-invoked.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

while true; do
  if timeout 90 python3 -c "
import jax, jax.numpy as jnp
x = jax.jit(lambda x: x * 2 + 1)(jnp.ones((8, 128)))
assert float(x.sum()) == 3072.0
print('tpu ok')" 2>/dev/null | grep -q "tpu ok"; then
    echo "TPU BACK $(date)" >> /tmp/r3b_watch.log
    break
  fi
  echo "probe failed $(date)" >> /tmp/r3b_watch.log
  sleep 120
done

bash scripts/r3b_ab.sh > /tmp/r3b_ab.log 2>&1
