#!/usr/bin/env python
"""Render qualitative trajectory figures from an ``evaluate.py --dump`` .npz.

The DESIRE paper's qualitative results (CVPR'17 Figs. 1/6: past track, K
sampled hypotheses, IOC-ranked pick, ground truth on the scene) have no
counterpart in the reference repo — its ``DESIREModel.sample``
(/root/reference/model/model.py:613-688) returns arrays and nothing ever
plots them. This renders that figure family from the persisted dump:

  python evaluate.py --save_dir save/x --data_dir <sdd> --dump /tmp/d.npz
  python visualize.py /tmp/d.npz --out figs/ --windows 12

Per window: every live agent's observed past (solid), ground-truth future
(dashed), all K hypotheses as thin lines on a single-hue ramp (darker =
higher IOC score), and the ranked top-1 pick emphasized. Axes are scene
pixels (y down, image convention).
"""
import argparse
import os

import numpy as np

# identity colors (fixed assignment, see .claude docs: color follows the
# entity): past/context, ground truth, ranked pick; hypotheses use a
# single-hue sequential ramp keyed to IOC score (magnitude, not identity)
C_PAST = "#6b7280"      # gray: context
C_GT = "#2e7d32"        # green: ground truth
C_PICK = "#e65100"      # orange: IOC top-1
HYP_CMAP = "Blues"      # sequential, one hue, light->dark by score


def render_window(ax, d, w, k_max=None, score_softmax=True):
    obs, obs_m = d["obs_xy"][w], d["obs_mask"][w]        # (A, To, 2), (A, To)
    fut, fut_m = d["fut_xy"][w], d["fut_mask"][w]
    traj, scores = d["traj"][w], d["scores"][w]          # (A, K, Tf, 2), (A, K)
    best, live = d["best"][w], d["live"][w]
    scale = float(d["scale"][w]) if "scale" in d else 1.0

    import matplotlib
    cmap = matplotlib.colormaps[HYP_CMAP]
    K = traj.shape[1] if k_max is None else min(k_max, traj.shape[1])

    for a in np.nonzero(live > 0)[0]:
        o_m = obs_m[a] > 0
        f_m = fut_m[a] > 0
        if o_m.sum() < 2:
            continue
        o = obs[a][o_m] * scale
        # hypothesis shading: softmax over K makes the ramp comparable
        # across agents regardless of each agent's absolute reward scale
        s = scores[a][:K].astype(np.float64)
        if score_softmax:
            s = np.exp(s - s.max())
            s = s / max(s.sum(), 1e-9)
        rank = s.argsort()
        lo, hi = s.min(), s.max()
        norm = (s - lo) / max(hi - lo, 1e-9)
        for k in rank:                                   # draw best last (on top)
            h = traj[a, k] * scale
            h = np.concatenate([o[-1:], h], axis=0)      # attach to the past
            ax.plot(h[:, 0], h[:, 1], color=cmap(0.25 + 0.75 * norm[k]),
                    lw=0.8, alpha=0.8, zorder=2)
        ax.plot(o[:, 0], o[:, 1], color=C_PAST, lw=1.8, zorder=3)
        ax.plot(o[-1, 0], o[-1, 1], "o", color=C_PAST, ms=3.5, zorder=4)
        b = np.concatenate([o[-1:], best[a] * scale], axis=0)
        ax.plot(b[:, 0], b[:, 1], color=C_PICK, lw=1.8, zorder=4)
        if f_m.sum() >= 1:
            g = np.concatenate([o[-1:], fut[a][f_m] * scale], axis=0)
            ax.plot(g[:, 0], g[:, 1], color=C_GT, lw=1.6, ls="--", zorder=5)

    ax.set_aspect("equal")
    ax.invert_yaxis()                                    # image convention
    ax.tick_params(labelsize=7, colors="#6b7280")
    for sp in ax.spines.values():
        sp.set_color("#d1d5db")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dump", help="npz from evaluate.py --dump")
    ap.add_argument("--out", default="figs", help="output directory")
    ap.add_argument("--windows", type=int, default=8,
                    help="how many windows to render (densest first)")
    ap.add_argument("--k_max", type=int, default=None,
                    help="cap hypotheses drawn per agent")
    ap.add_argument("--dpi", type=int, default=160)
    args = ap.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.lines import Line2D

    d = np.load(args.dump)
    os.makedirs(args.out, exist_ok=True)
    # densest windows first: most live agents with some future to show
    density = (d["live"] > 0).sum(axis=1) * (d["fut_mask"].sum(axis=(1, 2)) > 0)
    order = np.argsort(-density)[: args.windows]

    legend = [Line2D([], [], color=C_PAST, lw=1.8, label="observed past"),
              Line2D([], [], color=C_GT, lw=1.6, ls="--", label="ground truth"),
              Line2D([], [], color=C_PICK, lw=1.8, label="IOC top-1"),
              Line2D([], [], color="#7fa8d9", lw=0.9,
                     label="K hypotheses (darker = higher score)")]
    for i, w in enumerate(order):
        fig, ax = plt.subplots(figsize=(6, 6))
        render_window(ax, d, int(w), k_max=args.k_max)
        vid = int(d["video"][w]) if "video" in d else -1
        ax.set_title(f"window {int(w)} (video idx {vid}, "
                     f"{int((d['live'][w] > 0).sum())} agents)", fontsize=9)
        ax.legend(handles=legend, fontsize=7, loc="best", framealpha=0.9)
        path = os.path.join(args.out, f"window_{i:02d}_w{int(w)}.png")
        fig.savefig(path, dpi=args.dpi, bbox_inches="tight")
        plt.close(fig)
        print(path)


if __name__ == "__main__":
    main()
