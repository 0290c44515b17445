#!/usr/bin/env python
"""Headline benchmark: sampled trajectories/sec/chip at K=20 (BASELINE.json).

Runs the flagship full-DESIRE inference path (SGM prior sampling -> SCF ->
IOC 4-iteration rank/refine) on the default jax backend (the real TPU chip
under the driver; CPU elsewhere) and prints ONE JSON line:

  {"metric": ..., "value": N, "unit": "traj/s", "vs_baseline": R, ...}

vs_baseline compares against the TF1-CPU-equivalent throughput recorded in
bench_baseline.json (a jitted batch-1 per-sequence CPU loop standing in for
the reference's per-sequence sess.run pipeline, train.py:146-181 — the
reference itself cannot run, SURVEY §6; regenerate with
``python scripts/measure_baseline.py``).

A trajectory = one K-lane hypothesis for one agent slot: value =
B * A * K / sec. Shapes follow the paper protocol (8 obs / 12 pred steps).

Extra keys on the same line (round-2 additions): training-step throughput,
and MFU/roofline utilisation — model FLOPs vs the chip's matmul peak AND
bytes-accessed vs HBM bandwidth, because a model this small (params fit in
VMEM; activations dominated by (B*A*K, d) GRU chains) is expected to be
bandwidth-, not FLOP-, limited.

Cost counting (round-3 fix): XLA's cost analysis sees a Pallas kernel as an
opaque zero-FLOP custom call, so with the fused forward the compiled
executable under-counts by ~100x (measured: mfu 0.060 -> 0.0007 when the
fused sampler landed). FLOPs/bytes are therefore counted on the UNFUSED
(use_pallas=False) lowering of the same math and divided by the measured
time of the path actually benchmarked. mfu is thus standard algorithmic
MFU; hbm_frac is effective bandwidth relative to the unfused program's
traffic — the fused path physically moves fewer bytes, so values near or
above 1.0 mean the kernels beat the unfused roofline, not that HBM is
saturated.

``python bench.py --breakdown`` prints an additional stage-by-stage timing
table (SGM / +SCF / +IOC, and K/A sweeps) to stderr for the roofline story.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

# Peak specs of the bench chip (TPU v5e; override via env for other chips):
# 197 TFLOP/s bf16 matmul peak, 819 GB/s HBM bandwidth.
PEAK_FLOPS = float(os.environ.get("BENCH_PEAK_FLOPS", 197e12))
PEAK_HBM_BPS = float(os.environ.get("BENCH_PEAK_HBM_BPS", 819e9))


def flagship_cfg(K=20):
    import os

    from desire_tpu.config import DesireConfig
    return DesireConfig(batch_size=64, max_num_obj=60, obs_len=8, pred_len=12,
                        num_samples=K, d_dim=48, latent_size=128,
                        compute_dtype="bfloat16", num_refine=4,
                        use_ioc=True, use_scf=True,
                        # perf-variant A/B hook for on-chip sweeps
                        social_freeze=os.environ.get(
                            "DESIRE_SOCIAL_FREEZE", "0") == "1")


def make_batch(cfg, key=0):
    k = jax.random.PRNGKey(key)
    b, a, t = cfg.batch_size, cfg.max_num_obj, cfg.total_len
    xy = jax.random.uniform(k, (b, t, a, 2)) * 0.6 + 0.2
    mask = jnp.ones((b, t, a), jnp.float32)
    ids = jnp.arange(1, a + 1, dtype=jnp.float32)[None].repeat(b, 0)
    return xy, mask, ids


def _cost_analysis(compiled):
    """XLA cost analysis -> (flops, bytes_accessed), best-effort."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return (float(ca.get("flops", 0.0)),
                float(ca.get("bytes accessed", 0.0)))
    except Exception:
        return 0.0, 0.0


def _algo_cost(jit_fn, *args):
    """Algorithmic (flops, bytes) of a jitted fn, counted on its own
    lowering. Callers pass a function built with use_pallas=False so the
    count covers the real math (see module docstring)."""
    try:
        return _cost_analysis(jax.jit(jit_fn).lower(*args).compile())
    except Exception:
        return 0.0, 0.0


def _sync_fetch(out):
    """Force completion of everything dispatched so far by fetching a scalar
    derived from `out`. Device executions serialize in stream order, so when
    this scalar is on the host every earlier dispatch has finished.
    (Plain block_until_ready has been observed to return without waiting
    through the remote-TPU tunnel — it produced physically impossible
    sub-roofline timings; a host value transfer cannot lie.)"""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def _time_compiled(run, iters, warmup):
    for _ in range(warmup):
        out = run()
    _sync_fetch(out)
    # overhead of the sync fetch itself (dispatch + tunnel round trip),
    # measured with no work queued, subtracted from the timed loop
    t0 = time.perf_counter()
    _sync_fetch(out)
    overhead = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run()
    _sync_fetch(out)
    return max(time.perf_counter() - t0 - overhead, 1e-9) / iters


def _jit_init(cfg):
    """Param init as ONE jitted dispatch: eager init is ~40 tiny ops, and on
    the tunneled TPU every eager op pays a network round trip (measured:
    minutes of pure latency; the jitted form is seconds)."""
    from desire_tpu.models.desire import init_desire
    return jax.jit(lambda k: init_desire(k, cfg))(jax.random.PRNGKey(0))


def bench(cfg=None, iters=10, warmup=3):
    """Inference path. Returns (traj_per_sec, dt, mfu, hbm_frac)."""
    from desire_tpu.models.desire import desire_forward
    cfg = cfg or flagship_cfg()
    params = _jit_init(cfg)
    xy, mask, ids = make_batch(cfg)

    def fwd(params, xy, mask, ids, key):
        out = desire_forward(params, cfg, xy, mask, ids, key=key, train=False)
        return out["refined_traj"], out["scores"]

    keys = [jax.random.PRNGKey(i) for i in range(warmup + iters)]
    compiled = jax.jit(fwd).lower(params, xy, mask, ids, keys[0]).compile()

    cfg_x = cfg.replace(use_pallas=False)

    def fwd_xla(params, xy, mask, ids, key):
        out = desire_forward(params, cfg_x, xy, mask, ids, key=key,
                             train=False)
        return out["refined_traj"], out["scores"]

    flops, nbytes = _algo_cost(fwd_xla, params, xy, mask, ids, keys[0])

    it = iter(list(keys) * 2)
    dt = _time_compiled(lambda: compiled(params, xy, mask, ids, next(it)),
                        iters, warmup)
    traj_per_sec = cfg.batch_size * cfg.max_num_obj * cfg.num_samples / dt
    mfu = flops / dt / PEAK_FLOPS if flops else None
    hbm = nbytes / dt / PEAK_HBM_BPS if nbytes else None
    return traj_per_sec, dt, mfu, hbm


def bench_train(cfg=None, iters=10, warmup=3):
    """Full training step (fwd+bwd+Adam). Returns (steps/s, dt, mfu, hbm)."""
    from desire_tpu.models.desire import init_desire
    from desire_tpu.train import trainer
    from desire_tpu.train.state import create_train_state
    cfg = cfg or flagship_cfg(K=20)   # the round-3 training recipe's K
    state = jax.jit(lambda k: create_train_state(
        cfg, init_desire(k, cfg), steps_per_epoch=190))(jax.random.PRNGKey(0))
    xy, mask, ids = make_batch(cfg)
    step_fn = trainer.make_train_step(cfg, 190)

    # return the FULL (state, metrics) so nothing (e.g. the whole param
    # update) is dead-code-eliminated out of the count
    step_fn_xla = trainer.make_train_step(cfg.replace(use_pallas=False), 190)
    flops, nbytes = _algo_cost(step_fn_xla, state, xy, mask, ids)

    # step_fn donates state; thread it through the timing loop
    holder = {"state": state}

    def run():
        holder["state"], metrics = step_fn(holder["state"], xy, mask, ids)
        return metrics["loss"]

    dt = _time_compiled(run, iters, warmup)
    mfu = flops / dt / PEAK_FLOPS if flops else None
    hbm = nbytes / dt / PEAK_HBM_BPS if nbytes else None
    return 1.0 / dt, dt, mfu, hbm


def breakdown(iters=10, warmup=3):
    """Stage/shape sweep for the roofline story (stderr, not the driver line).

    Which stage eats the time: SGM alone, SGM+SCF, full (+IOC x4)? And how
    does the SGM scan region scale with K (VMEM-resident lanes) vs A?
    """
    from desire_tpu.models.desire import desire_forward, init_desire

    rows = []
    variants = [
        ("sgm_only", dict(use_ioc=False, use_scf=False)),
        ("sgm_scf", dict(use_ioc=True, use_scf=True, num_refine=1)),
        ("full_refine4", dict()),
        ("full_refine4_unfused_ioc", dict(use_pallas=False)),  # XLA IOC loop
        ("full_K50", dict(num_samples=50)),
        ("full_K12", dict(num_samples=12)),
    ]
    for name, kw in variants:
        cfg = flagship_cfg().replace(**kw)
        params = _jit_init(cfg)
        xy, mask, ids = make_batch(cfg)

        def fwd(params, xy, mask, ids, key, cfg=cfg):
            out = desire_forward(params, cfg, xy, mask, ids, key=key,
                                 train=False)
            return out["refined_traj"]

        key = jax.random.PRNGKey(0)
        compiled = jax.jit(fwd).lower(params, xy, mask, ids, key).compile()
        cfg_x = cfg.replace(use_pallas=False)

        def fwd_xla(params, xy, mask, ids, key, cfg_x=cfg_x):
            return desire_forward(params, cfg_x, xy, mask, ids, key=key,
                                  train=False)["refined_traj"]

        flops, nbytes = _algo_cost(fwd_xla, params, xy, mask, ids, key)
        dt = _time_compiled(lambda: compiled(params, xy, mask, ids, key),
                            iters, warmup)
        rows.append({
            "variant": name, "ms": round(dt * 1e3, 2),
            "traj_per_sec": round(
                cfg.batch_size * cfg.max_num_obj * cfg.num_samples / dt),
            "gflops": round(flops / 1e9, 2),
            "gbytes": round(nbytes / 1e9, 3),
            "intensity_flops_per_byte": round(flops / max(nbytes, 1), 1),
            "mfu": round(flops / dt / PEAK_FLOPS, 4),
            "hbm_frac": round(nbytes / dt / PEAK_HBM_BPS, 3),
        })
        print(json.dumps(rows[-1]), file=sys.stderr)
    return rows


def main():
    from desire_tpu.utils.logging import enable_compile_cache
    enable_compile_cache()
    cfg = flagship_cfg()
    traj_per_sec, dt, mfu, hbm = bench(cfg)
    steps_per_sec, train_dt, train_mfu, train_hbm = bench_train()

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
        "fwd_ms": round(dt * 1e3, 2),
        "train_steps_per_sec_K20": round(steps_per_sec, 2),
        "train_step_ms": round(train_dt * 1e3, 2),
        "mfu_fwd": round(mfu, 4) if mfu is not None else None,
        "mfu_train": round(train_mfu, 4) if train_mfu is not None else None,
        "hbm_frac_fwd": round(hbm, 3) if hbm is not None else None,
        "hbm_frac_train": round(train_hbm, 3) if train_hbm is not None else None,
    }))


if __name__ == "__main__":
    if "--breakdown" in sys.argv:
        from desire_tpu.utils.logging import enable_compile_cache
        enable_compile_cache()
        breakdown()
    else:
        main()
