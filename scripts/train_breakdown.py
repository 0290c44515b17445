#!/usr/bin/env python
"""Train-step timing ladder: where do the ~234 ms (B=64 A=60 K=20) go?

Times the full jitted train step under config variants that each remove or
swap one stage, on the default backend (real TPU under the driver). Uses
bench.py's sync-fetched timing (block_until_ready can lie through the
remote-TPU tunnel). Prints one JSON line per variant to stdout.

Usage: python scripts/train_breakdown.py [--iters 10]
"""

import argparse
import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax  # noqa: E402

import bench  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--micro", action="store_true",
                    help="tiny shapes (CPU smoke of the harness itself)")
    args = ap.parse_args()

    micro = dict(batch_size=2, max_num_obj=4, d_dim=16, latent_size=8,
                 embedding_size=8, channel_multiplier=10, scene_grid=8,
                 scene_channels=4, compute_dtype="float32") \
        if args.micro else {}

    from desire_tpu.utils.logging import enable_compile_cache
    enable_compile_cache()

    variants = [
        # name, config overrides
        ("full_fused", {}),                        # the default recipe
        ("full_xla", {"fused_train": False}),      # unfused IOC bwd path
        ("full_xla_remat", {"fused_train": False, "remat": True}),
        ("no_ioc", {"use_ioc": False, "use_scf": False}),  # SGM+losses only
        ("no_social", {"use_social": False}),      # IOC minus social attn
        ("refine1", {"num_refine": 1}),            # 1 vs 4 IOC iterations
        ("K50_remat", {"num_samples": 50, "remat": True}),
    ]
    for name, kw in variants:
        try:
            cfg = bench.flagship_cfg(K=20).replace(**micro).replace(**kw)
            steps_per_sec, dt, mfu, hbm = bench.bench_train(
                cfg, iters=args.iters, warmup=args.warmup)
            print(json.dumps({
                "variant": name, "train_step_ms": round(dt * 1e3, 2),
                "steps_per_sec": round(steps_per_sec, 2),
                "mfu": round(mfu, 4) if mfu else None,
                "hbm_frac": round(hbm, 3) if hbm else None,
            }), flush=True)
        except Exception as e:  # keep the ladder going past one bad variant
            print(json.dumps({"variant": name,
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)


if __name__ == "__main__":
    main()
