#!/usr/bin/env python
"""Round-4 perf A/B sweep — re-lands the round-3b queue that died in the
relay outage (VERDICT r3 "Next round" item 2; ADVICE r3 fixes applied:
every measurement is a timeout-bounded subprocess whose result is emitted
as one JSON line on STDOUT, so nothing lands stderr-only and a hung
compile cannot wedge the queue).

Measures, on the real chip:
  1. fwd sweep: DESIRE_TENT_MM {0,1} x DESIRE_IOC_MAX_ROWS {64,128,320}
     (both knobs are numerically exact kernel re-tilings — see
     desire_tpu/ops/ioc_fused.py:97-101,326-331)
  2. train-step A/B: base vs tent_mm vs the fwd winner's combo
  3. writes /tmp/r4_winner.env exporting the fastest TRAIN combo, which
     the flagship retrain queue (r4_queue2.sh) sources
  4. combined tent+social_freeze inference bound (bench-only semantics)
  5. jax.profiler retry -> /tmp/r4_profile (tunnel profiler was down all
     of round 3; RESULTS.md roofline rests on op-count estimates)

Each subprocess monkeypatches bench._algo_cost to skip the unfused-path
costing compile (~1 min of pure compile per variant that the sweep does
not need — mfu is not a sweep axis).
"""
import json
import os
import subprocess
import sys
import time

REPO = "/root/repo"
PY = sys.executable

FWD = (
    "import sys, json; sys.path.insert(0, '/root/repo')\n"
    "import bench\n"
    "bench._algo_cost = lambda *a: (0.0, 0.0)\n"
    "tps, dt, mfu, hbm = bench.bench(iters=8, warmup=3)\n"
    "print(json.dumps({'fwd_ms': round(dt*1e3, 2),"
    " 'traj_per_sec': round(tps)}))\n")

TRAIN = (
    "import sys, json; sys.path.insert(0, '/root/repo')\n"
    "import bench\n"
    "bench._algo_cost = lambda *a: (0.0, 0.0)\n"
    "sps, dt, mfu, hbm = bench.bench_train(iters=8, warmup=3)\n"
    "print(json.dumps({'train_ms': round(dt*1e3, 1),"
    " 'steps_per_sec': round(sps, 2)}))\n")

PROFILE = (
    "import sys, json; sys.path.insert(0, '/root/repo')\n"
    "import jax, jax.profiler\n"
    "import bench\n"
    "bench._algo_cost = lambda *a: (0.0, 0.0)\n"
    "with jax.profiler.trace('/tmp/r4_profile'):\n"
    "    tps, dt, mfu, hbm = bench.bench(iters=6, warmup=2)\n"
    "print(json.dumps({'profiled_fwd_ms': round(dt*1e3, 2),"
    " 'trace_dir': '/tmp/r4_profile'}))\n")


def run(tag, snippet, env_extra, timeout=1500):
    env = dict(os.environ)
    env.update(env_extra)
    rec = {"tag": tag}
    rec.update(env_extra)
    t0 = time.time()
    try:
        r = subprocess.run([PY, "-c", snippet], env=env, capture_output=True,
                           text=True, timeout=timeout, cwd=REPO)
        lines = [ln for ln in r.stdout.strip().splitlines() if ln]
        try:
            rec.update(json.loads(lines[-1]))
        except Exception:
            rec.update({"rc": r.returncode, "stderr_tail": r.stderr[-400:]})
    except subprocess.TimeoutExpired:
        rec["timed_out"] = True
    rec["wall_s"] = round(time.time() - t0, 1)
    print(json.dumps(rec), flush=True)
    return rec


def main():
    fwd_rows = []
    for tent in ("0", "1"):
        for rows in ("320", "128", "64"):
            fwd_rows.append(run(
                "fwd", FWD,
                {"DESIRE_TENT_MM": tent, "DESIRE_IOC_MAX_ROWS": rows}))

    ok = [r for r in fwd_rows if "fwd_ms" in r]
    best_fwd = min(ok, key=lambda r: r["fwd_ms"]) if ok else None
    print(json.dumps({"tag": "best_fwd", "combo": best_fwd}), flush=True)

    # train A/B: base, tent (both at default rows), plus the fwd winner's
    # combo if it differs from both
    train_combos = [("0", "320"), ("1", "320")]
    if best_fwd:
        c = (best_fwd["DESIRE_TENT_MM"], best_fwd["DESIRE_IOC_MAX_ROWS"])
        if c not in train_combos:
            train_combos.append(c)
    train_rows = []
    for tent, rows in train_combos:
        train_rows.append(run(
            "train", TRAIN,
            {"DESIRE_TENT_MM": tent, "DESIRE_IOC_MAX_ROWS": rows}))

    ok_t = [r for r in train_rows if "train_ms" in r]
    if ok_t:
        best_t = min(ok_t, key=lambda r: r["train_ms"])
        with open("/tmp/r4_winner.env", "w") as f:
            f.write("export DESIRE_TENT_MM=%s\n" % best_t["DESIRE_TENT_MM"])
            f.write("export DESIRE_IOC_MAX_ROWS=%s\n"
                    % best_t["DESIRE_IOC_MAX_ROWS"])
        print(json.dumps({"tag": "winner_env", "combo": best_t}), flush=True)

    # combined inference bound (bench-only semantics change, documented)
    run("fwd_tent_freeze", FWD,
        {"DESIRE_TENT_MM": "1", "DESIRE_SOCIAL_FREEZE": "1"})

    # profiler retry
    run("profile", PROFILE, {}, timeout=900)


if __name__ == "__main__":
    main()
