#!/usr/bin/env python
"""Headline benchmark: sampled trajectories/sec/chip at K=20 (BASELINE.json).

Runs the flagship full-DESIRE inference path (SGM prior sampling -> SCF ->
IOC 4-iteration rank/refine) on the default jax backend (the real TPU chip
under the driver; CPU elsewhere) and prints ONE JSON line:

  {"metric": ..., "value": N, "unit": "traj/s", "vs_baseline": R}

vs_baseline compares against the TF1-CPU-equivalent throughput recorded in
bench_baseline.json (a jitted batch-1 per-sequence CPU loop standing in for
the reference's per-sequence sess.run pipeline, train.py:146-181 — the
reference itself cannot run, SURVEY §6; regenerate with
``python scripts/measure_baseline.py``).

A trajectory = one K-lane hypothesis for one agent slot: value =
B * A * K / sec. Shapes follow the paper protocol (8 obs / 12 pred steps).
"""

import json
import os
import time

import jax
import jax.numpy as jnp


def flagship_cfg(K=20):
    from desire_tpu.config import DesireConfig
    return DesireConfig(batch_size=64, max_num_obj=60, obs_len=8, pred_len=12,
                        num_samples=K, d_dim=48, latent_size=128,
                        compute_dtype="bfloat16", num_refine=4,
                        use_ioc=True, use_scf=True)


def make_batch(cfg, key=0):
    k = jax.random.PRNGKey(key)
    b, a, t = cfg.batch_size, cfg.max_num_obj, cfg.total_len
    xy = jax.random.uniform(k, (b, t, a, 2)) * 0.6 + 0.2
    mask = jnp.ones((b, t, a), jnp.float32)
    ids = jnp.arange(1, a + 1, dtype=jnp.float32)[None].repeat(b, 0)
    return xy, mask, ids


def bench(cfg=None, iters=10, warmup=3):
    from desire_tpu.models.desire import desire_forward, init_desire
    cfg = cfg or flagship_cfg()
    params = init_desire(jax.random.PRNGKey(0), cfg)
    xy, mask, ids = make_batch(cfg)

    @jax.jit
    def fwd(params, xy, mask, ids, key):
        out = desire_forward(params, cfg, xy, mask, ids, key=key, train=False)
        return out["refined_traj"], out["scores"]

    keys = [jax.random.PRNGKey(i) for i in range(warmup + iters)]
    for i in range(warmup):
        jax.block_until_ready(fwd(params, xy, mask, ids, keys[i]))
    t0 = time.perf_counter()
    for i in range(iters):
        out = fwd(params, xy, mask, ids, keys[warmup + i])
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    traj_per_sec = cfg.batch_size * cfg.max_num_obj * cfg.num_samples / dt
    return traj_per_sec, dt


def main():
    cfg = flagship_cfg()
    traj_per_sec, dt = bench(cfg)

    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "bench_baseline.json")
    vs = None
    if os.path.exists(base_path):
        with open(base_path) as f:
            base = json.load(f)
        if base.get("traj_per_sec"):
            vs = traj_per_sec / base["traj_per_sec"]

    print(json.dumps({
        "metric": "sampled_trajectories_per_sec_per_chip_K20",
        "value": round(traj_per_sec, 1),
        "unit": "traj/s",
        "vs_baseline": round(vs, 2) if vs is not None else None,
    }))


if __name__ == "__main__":
    main()
