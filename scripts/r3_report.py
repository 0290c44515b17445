#!/usr/bin/env python3
"""Print the RESULTS.md tables for a finished flagship eval sweep.

Usage: python scripts/r3_report.py [save_dir]   (default save/r3_final)

Reads the eval JSONL files queue3 writes (held-out K=20/K=50, in-sample,
rank-blend diagnostic), the CV baseline, metrics.jsonl, the IOC row-cap
sweep, and the final bench line — and emits ready-to-paste markdown so the
final RESULTS rewrite is mechanical (and numbers can't be mistyped).
"""
import json
import os
import sys

SAVE = sys.argv[1] if len(sys.argv) > 1 else "save/r3_final"


def evalrows(path):
    """-> (meta_row, metrics_row) from an evaluate.py JSONL dump."""
    rows = [json.loads(l) for l in open(path) if l.strip()]
    meta = next((r for r in rows if "split" in r), {})
    met = next((r for r in rows if "minADE_px" in r), {})
    return meta, met


def f1(x):
    return f"{x:.1f}"


def f2(x):
    return f"{x:.2f}"


def main():
    k20m, k20 = evalrows(os.path.join(SAVE, "eval_heldout_k20.json"))
    _, k50 = evalrows(os.path.join(SAVE, "eval_heldout_k50.json"))
    ins = blend = None
    p = os.path.join(SAVE, "eval_insample_k20.json")
    if os.path.exists(p):
        ins = evalrows(p)[1]
    p = os.path.join(SAVE, "eval_heldout_k20_blend.json")
    if os.path.exists(p):
        blend = evalrows(p)[1]
    cv = None
    for c in (os.path.join(SAVE, "baseline_cv_heldout.json"),
              "save/r3_flagship/baseline_cv_heldout.json"):
        if os.path.exists(c):
            cv = json.load(open(c))
            break

    print(f"## eval meta: {k20m}\n")
    print("### Headline (held-out)\n")
    print("| Metric @4.8 s (held-out) | K=20 | K=50 (same ckpt) | CV |")
    print("|---|---|---|---|")
    print(f"| minADE | **{f2(k20['minADE_px'])} px** | **{f2(k50['minADE_px'])} px** |"
          f" {f2(cv['ADE_px']) if cv else '—'} px |")
    print(f"| minFDE | **{f2(k20['minFDE_px'])} px** | **{f2(k50['minFDE_px'])} px** |"
          f" {f2(cv['FDE_px']) if cv else '—'} px |")
    print(f"| top-1 ADE (IOC-ranked) | **{f2(k20['top1ADE_px'])} px** |"
          f" {f2(k50['top1ADE_px'])} px | {f2(cv['ADE_px']) if cv else '—'} px |")
    print(f"| SGM-only oracle minADE | {f2(k20['sgm_minADE_px'])} px |"
          f" {f2(k50['sgm_minADE_px'])} px | — |")
    print(f"\nn = {k20['num_agents']:.0f} agent-windows;"
          f" rank pctile {k20['rank_top1_pctile']:.3f},"
          f" score-error corr {k20['rank_score_corr']:.3f}")
    if blend is not None:
        print(f"rank_blend 0.5 diagnostic: top-1 {f2(blend['top1ADE_px'])} px")
    if ins is not None:
        print(f"in-sample (same ckpt, train videos): minADE {f2(ins['minADE_px'])}"
              f" / FDE {f2(ins['minFDE_px'])} / top-1 {f2(ins['top1ADE_px'])}")

    if "horizons" in k20:
        print("\n### Horizons (held-out, K=20 | K=50)\n")
        print("| Horizon | minADE (1/5 px) | minFDE (1/5 px) | minADE (full px) | minFDE (full px) |")
        print("|---|---|---|---|---|")
        for h in sorted(k20["horizons"]):
            a = k20["horizons"][h]
            b = k50.get("horizons", {}).get(h, {})
            print(f"| {h} | {f2(a['minADE_px_fifth'])}"
                  + (f" / {f2(b['minADE_px_fifth'])}" if b else "")
                  + f" | {f2(a['minFDE_px_fifth'])}"
                  + (f" / {f2(b['minFDE_px_fifth'])}" if b else "")
                  + f" | {f1(a['minADE_px'])} | {f1(a['minFDE_px'])} |")

    if "calibration" in k20:
        c = k20["calibration"]
        ks = c.get("pit_ks")
        if ks is None and "pit_hist" in c:  # Kolmogorov distance from the histogram
            acc = 0.0
            ksd = 0.0
            n = len(c["pit_hist"])
            for i, v in enumerate(c["pit_hist"]):
                acc += v
                ksd = max(ksd, abs(acc - (i + 1) / n))
            ks = ksd
        print(f"\n### Calibration: coverage {c['coverage_50']:.3f} @50% /"
              f" {c['coverage_90']:.3f} @90%, PIT KS {ks:.3f}")

    print("\n### Per-scene (held-out video of each scene)\n")
    print("| scene | minADE@20 | minADE@50 | top-1@20 | n |")
    print("|---|---|---|---|---|")
    order = sorted(k20["per_scene"], key=lambda s: k20["per_scene"][s]["minADE_px"])
    for s in order:
        a, b = k20["per_scene"][s], k50["per_scene"][s]
        print(f"| {s} | {f1(a['minADE_px'])} | {f1(b['minADE_px'])} |"
              f" {f1(a['top1ADE_px'])} | {a['num_agents']:.0f} |")

    print("\n### Speed classes (held-out)\n")
    print("| class | n | minADE@20 | minADE@50 | CV ADE | along/cross @20 |")
    print("|---|---|---|---|---|---|")
    for cls in ("speed[0,2)px/step", "speed[2,8)px/step",
                "speed[8,20)px/step", "speed[20,inf)px/step"):
        a = k20["speed_classes"][cls]
        b = k50["speed_classes"][cls]
        cvc = (cv or {}).get("speed_classes", {}).get(cls, {})
        ac = (f"{f1(a['alongADE_px'])}/{f1(a['crossADE_px'])}"
              if "alongADE_px" in a else "—")
        print(f"| {cls[5:]} | {a['num_agents']:.0f} | {f1(a['minADE_px'])} |"
              f" {f1(b['minADE_px'])} |"
              f" {f1(cvc['ADE_px']) if cvc else '—'} | {ac} |")

    # training wall / final train-eval row
    mpath = os.path.join(SAVE, "metrics.jsonl")
    if os.path.exists(mpath):
        rows = [json.loads(l) for l in open(mpath) if l.strip()]
        evs = [r for r in rows if r.get("event") == "eval"]
        if evs:
            last = evs[-1]
            print(f"\ntrain wall: {last['t']:.0f} s to epoch {last['epoch']};"
                  f" final per-epoch eval minADE {f2(last['minADE_px'])}")
        best = [r for r in rows if r.get("event") == "best"]
        if best:
            print(f"best-by-held-out: epoch {best[-1]['epoch']}"
                  f" minADE {f2(best[-1]['minADE_px'])}")

    for aux, label in (("/tmp/ioc_rows_sweep.jsonl", "IOC row-cap sweep"),
                       ("/tmp/bench_r3_final.json", "final bench")):
        if os.path.exists(aux):
            print(f"\n### {label}")
            print(open(aux).read().strip())


if __name__ == "__main__":
    main()
