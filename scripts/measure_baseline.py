#!/usr/bin/env python
"""Measure the TF1-CPU-equivalent baseline for bench.py.

The reference cannot run (SURVEY §8), so per BASELINE.md the stand-in is this
framework's own model driven the way the reference drove TF1: one sequence
per session.run on CPU (train.py:146-181 fed batch elements one at a time).
We are *generous* to the baseline: the per-sequence step is jit-compiled
(TF1 graphs were compiled too), only the batching discipline matches the
reference. Writes bench_baseline.json consumed by bench.py.
"""

import json
import os
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402

from bench import flagship_cfg, make_batch  # noqa: E402
from desire_tpu.models.desire import desire_forward, init_desire  # noqa: E402


def main():
    cfg = flagship_cfg().replace(batch_size=1, compute_dtype="float32")
    params = init_desire(jax.random.PRNGKey(0), cfg)
    xy, mask, ids = make_batch(cfg)

    @jax.jit
    def fwd(params, xy, mask, ids, key):
        out = desire_forward(params, cfg, xy, mask, ids, key=key, train=False)
        return out["refined_traj"], out["scores"]

    key = jax.random.PRNGKey(0)
    jax.block_until_ready(fwd(params, xy, mask, ids, key))  # compile
    iters = 8
    t0 = time.perf_counter()
    for i in range(iters):
        out = fwd(params, xy, mask, ids, jax.random.PRNGKey(i))
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    traj_per_sec = cfg.max_num_obj * cfg.num_samples / dt  # batch_size == 1

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench_baseline.json")
    with open(path, "w") as f:
        json.dump({
            "traj_per_sec": round(traj_per_sec, 2),
            "sec_per_sequence": round(dt, 4),
            "description": "TF1-CPU-equivalent: jitted per-sequence (batch=1)"
                           " full-DESIRE inference on host CPU, K=20",
            "measured_on": "container host CPU",
        }, f, indent=2)
    print(f"baseline: {traj_per_sec:.1f} traj/s ({dt*1e3:.1f} ms/sequence)"
          f" -> {path}")


if __name__ == "__main__":
    main()
