#!/usr/bin/env python
"""Summarize a jax.profiler Chrome trace (vm.trace.json.gz): total device
time per XLA op, sorted. This is how the round-4 forward trace was read
(docs/traces/r4_fwd_trace.json.gz -> fused IOC kernel = 82% of the step).

  python scripts/trace_report.py /tmp/r4_profile [n_top]

The TPU device track shows one opaque custom call per Pallas kernel; use
the DESIRE_IOC_ABLATE bench knob for the in-kernel stage decomposition.
"""

import collections
import glob
import gzip
import json
import sys


def load(path):
    if not path.endswith(".json.gz"):
        hits = sorted(glob.glob(path + "/**/*.trace.json.gz", recursive=True))
        assert hits, f"no trace under {path}"
        path = hits[-1]
    with gzip.open(path) as f:
        return json.load(f)["traceEvents"], path


def main():
    ev, path = load(sys.argv[1] if len(sys.argv) > 1 else "/tmp/r4_profile")
    n_top = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    pids, tids = {}, {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tids[(e["pid"], e["tid"])] = e["args"].get("name", "")
    dev = [p for p, name in pids.items() if "TPU" in (name or "")]
    assert dev, f"no TPU process in {path}: {pids}"
    cnt, dur = collections.Counter(), collections.Counter()
    for e in ev:
        if e.get("ph") == "X" and e.get("pid") in dev:
            key = (tids.get((e["pid"], e["tid"]), ""), e.get("name"))
            cnt[key] += 1
            dur[key] += e.get("dur", 0)
    print(f"# {path}")
    mod_total = sum(d for (tn, _), d in dur.items() if "Modules" in tn)
    for (tn, name), d in dur.most_common(n_top):
        frac = f" {d / mod_total:5.1%}" if "Ops" in tn and mod_total else ""
        print(f"{d / 1e3:10.2f} ms  n={cnt[(tn, name)]:6d}{frac}  "
              f"[{tn}] {name[:80]}")


if __name__ == "__main__":
    main()
