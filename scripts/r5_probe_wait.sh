#!/bin/bash
# Block until the tunneled TPU answers a tiny jit (relay outages last
# hours and probes HANG rather than error — every probe is timeout-bound).
# Source of the pattern: scripts/r3_tpu_watch.sh.
export PYTHONPATH=/root/repo:/root/.axon_site
while true; do
  if timeout 120 python3 -c "
import jax, jax.numpy as jnp
x = jax.jit(lambda x: x * 2 + 1)(jnp.ones((8, 128)))
assert float(x.sum()) == 3072.0
print('tpu ok')" 2>/dev/null | grep -q "tpu ok"; then
    echo "TPU OK $(date)" >> /tmp/r5_probe.log
    break
  fi
  echo "probe failed $(date)" >> /tmp/r5_probe.log
  sleep 120
done
