#!/bin/bash
# Round-3 chain: wait for the queue2 triage (t_pace) to finish, decide the
# final flagship flags from the triage evals, then run queue3 (row-cap
# sweep + 100-epoch flagship + full eval sweep + bench).
# Decision rule: include --pace_range 0.5 iff t_pace beats t_both on
# minADE + 0.1*bikes+ADE (overall accuracy with a fast-agent tiebreak).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

Q2_PID=${1:?usage: r3_chain.sh <queue2_pid>}
while kill -0 "$Q2_PID" 2>/dev/null; do sleep 30; done

FLAGS=$(python3 - <<'EOF'
import json

def stats(d):
    rows = [json.loads(l) for l in open(d) if l.strip()]
    out = {}
    for r in rows:
        if "minADE_px" in r:
            out["minADE"] = r["minADE_px"]
        for k, v in r.get("speed_classes", {}).items():
            if "20,inf" in k:
                out["bikes"] = v["minADE_px"]
    return out

try:
    pace = stats("save/t_pace/eval_heldout_k20.json")
    both = stats("save/t_both/eval_heldout_k20.json")
    sp = pace["minADE"] + 0.1 * pace["bikes"]
    sb = both["minADE"] + 0.1 * both["bikes"]
    print("--pace_range 0.5" if sp < sb else "")
except Exception:
    print("")  # missing/failed eval -> plain defaults
EOF
)
echo "CHAIN: chosen FLAGS='$FLAGS'" >> /tmp/r3_chain_decision.log

FLAGS="$FLAGS" SAVE=save/r3_final bash scripts/r3_tpu_queue3.sh
