#!/bin/bash
# Tunnel watcher: probe the axon TPU every 2 minutes; when a tiny jit
# round-trips, launch the final queue (r3_queue3b.sh). The relay that
# tunnels the TPU dies/recovers outside our control — train jobs that
# start while it is down fail with "Unable to initialize backend 'axon'".
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

while true; do
  if timeout 90 python3 -c "
import jax, jax.numpy as jnp
x = jax.jit(lambda x: x * 2 + 1)(jnp.ones((8, 128)))
assert float(x.sum()) == 3072.0
print('tpu ok')" 2>/dev/null | grep -q "tpu ok"; then
    echo "TPU BACK $(date)" >> /tmp/r3_watch.log
    break
  fi
  echo "probe failed $(date)" >> /tmp/r3_watch.log
  sleep 120
done

FLAGS="" SAVE=save/r3_final bash scripts/r3_queue3b.sh
