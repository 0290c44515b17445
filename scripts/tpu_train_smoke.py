#!/usr/bin/env python
"""10-step TPU training smoke: honest per-step timing + loss trace for the
current recipe, with the fused-IOC training path on or off.

Timing uses scalar fetches (not block_until_ready — see bench._sync_fetch):
each step's loss is pulled to the host, so the printed times include real
device execution through the tunnel.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_train_smoke.py \
      [fused:0|1] [steps] [K]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    from desire_tpu.utils.logging import enable_compile_cache
    enable_compile_cache()
    fused = (sys.argv[1] == "1") if len(sys.argv) > 1 else True
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    K = int(sys.argv[3]) if len(sys.argv) > 3 else 20

    from bench import flagship_cfg, make_batch
    from desire_tpu.models.desire import init_desire
    from desire_tpu.train import trainer
    from desire_tpu.train.state import create_train_state

    cfg = flagship_cfg(K=K).replace(fused_train=fused)
    t0 = time.time()
    state = jax.jit(lambda k: create_train_state(
        cfg, init_desire(k, cfg), 190))(jax.random.PRNGKey(0))
    xy, mask, ids = make_batch(cfg)
    print(f"setup {time.time()-t0:.1f}s", flush=True)

    step_fn = trainer.make_train_step(cfg, 190)
    t0 = time.time()
    state, metrics = step_fn(state, xy, mask, ids)
    first = float(metrics["loss"])
    print(f"first step (compile) {time.time()-t0:.1f}s loss={first:.4f}",
          flush=True)

    losses = []
    t0 = time.time()
    for _ in range(steps):
        state, metrics = step_fn(state, xy, mask, ids)
        losses.append(float(metrics["loss"]))  # scalar fetch = hard sync
    dt = (time.time() - t0) / steps
    print(f"fused_train={fused} K={K}: {dt*1e3:.1f} ms/step (sync-fetched), "
          f"losses {losses[0]:.4f} -> {losses[-1]:.4f}", flush=True)
    assert all(jnp.isfinite(jnp.asarray(losses))), losses
    assert losses[-1] < first, "smoke training did not reduce the loss"


if __name__ == "__main__":
    main()
