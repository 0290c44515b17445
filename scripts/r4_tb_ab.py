#!/usr/bin/env python
"""On-chip A/B for DESIRE_SOCIAL_TB (T-blocked social attention in the
fused IOC inference forward — ops/ioc_fused.py _social_tb_default).
Bitwise-neutral by construction (parity-tested), so this is a pure perf
sweep: fwd bench at TB in {1,2,3,4,6,12}, then the winner combined with
social_freeze. Same subprocess/timeout/JSON-line discipline as r4_ab.py
(ADVICE r3: nothing stderr-only, a hung compile cannot wedge the queue).
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


def run(tag, env_extra, timeout=1200):
    env = dict(os.environ)
    env.update(env_extra)
    rec = {"tag": tag}
    rec.update(env_extra)
    t0 = time.time()
    try:
        r = subprocess.run([PY, "-c", FWD], env=env, capture_output=True,
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
    rows = []
    for tb in ("1", "2", "3", "4", "6", "12"):
        rows.append(run("fwd_tb", {"DESIRE_SOCIAL_TB": tb}))
    ok = [r for r in rows if "fwd_ms" in r]
    if ok:
        best = min(ok, key=lambda r: r["fwd_ms"])
        print(json.dumps({"tag": "best_tb", "combo": best}), flush=True)
        # winner x social_freeze (the ranking-first serving pick)
        if best["DESIRE_SOCIAL_TB"] != "1":
            run("fwd_tb_freeze", {"DESIRE_SOCIAL_TB": best["DESIRE_SOCIAL_TB"],
                                  "DESIRE_SOCIAL_FREEZE": "1"})


if __name__ == "__main__":
    main()
