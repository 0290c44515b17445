#!/usr/bin/env python
"""Imagery A/B report (VERDICT r4 item 7): compare the 40-epoch
occupancy-prior run (save/r5_img) against the imagery-less 40-epoch
control (save/r4_ztemp_a, identical recipe/seed) — overall held-out
numbers plus deathCircle/little (the static-layout scenes)."""
import json
import sys


def best_eval(save):
    rows = [json.loads(l) for l in open(f"{save}/eval_best_k20.json")]
    for r in rows:
        if "minADE_px" in r:
            return r
    raise SystemExit(f"no eval row in {save}")


def subset_best(save):
    best = None
    for line in open(f"{save}/metrics.jsonl"):
        r = json.loads(line)
        if r.get("event") == "eval" and (best is None
                                         or r["minADE_px"] < best["minADE_px"]):
            best = r
    return best


def main():
    ctrl = sys.argv[1] if len(sys.argv) > 1 else "save/r4_ztemp_a"
    img = sys.argv[2] if len(sys.argv) > 2 else "save/r5_img"
    a, b = best_eval(ctrl), best_eval(img)
    sa, sb = subset_best(ctrl), subset_best(img)
    print(f"{'metric':28s} {'control':>10s} {'imagery':>10s} {'delta':>8s}")
    for key in ("minADE_px", "minFDE_px", "top1ADE_px"):
        print(f"{key:28s} {a[key]:10.2f} {b[key]:10.2f} "
              f"{b[key]-a[key]:+8.2f}")
    for sc in ("deathCircle", "little", "nexus", "gates"):
        va = a.get("per_scene", {}).get(sc, {}).get("minADE_px")
        vb = b.get("per_scene", {}).get(sc, {}).get("minADE_px")
        if va is not None and vb is not None:
            print(f"{'scene/'+sc:28s} {va:10.2f} {vb:10.2f} {vb-va:+8.2f}")
    print(f"{'subset best epoch':28s} {sa['epoch']:10d} {sb['epoch']:10d}")
    print(f"{'subset best minADE':28s} {sa['minADE_px']:10.2f} "
          f"{sb['minADE_px']:10.2f} {sb['minADE_px']-sa['minADE_px']:+8.2f}")


if __name__ == "__main__":
    main()
