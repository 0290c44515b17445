"""Inference-time sampling + the evaluation harness.

TPU-native counterpart of the reference ``DESIREModel.sample``
(/root/reference/model/model.py:613-688): instead of a Python loop of
per-step session.runs with numpy multivariate draws (hot loop #4, SURVEY
§3.5), one jitted forward produces all K hypotheses for every agent at once;
stochastic rollouts draw from the per-step bivariate Gaussians with a
counter-based PRNG inside the same program.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from desire_tpu.config import DesireConfig
from desire_tpu.eval import metrics as M
from desire_tpu.models import desire, losses
from desire_tpu.train.trainer import batch_to_device


def make_sampler(cfg: DesireConfig, k_samples=None, stochastic=False):
    """Returns jitted fn(params, xy, mask, ids, key) ->
    dict(traj (B,A,K,T,2), scores, best (B,A,T,2))."""
    def fn(params, xy, mask, ids, key):
        k1, k2 = jax.random.split(key)
        out = desire.desire_forward(params, cfg, xy, mask, ids, key=k1,
                                    k_samples=k_samples, train=False)
        traj = out["refined_traj"]
        if stochastic:
            # draw positions from the SGM per-step gaussians, then re-apply
            # the IOC refinement deltas on top of the drawn means
            drawn = losses.sample_bivariate(out["raw5"].astype(jnp.float32), k2)
            traj = traj + (drawn - out["sgm_traj"])
        scores = out["scores"]
        if scores is None:
            scores = jnp.zeros(traj.shape[:3], traj.dtype)
        best = M.best_of_k_by_score(traj, scores)
        return {"traj": traj, "scores": scores, "best": best,
                "sgm_traj": out["sgm_traj"], "raw5": out["raw5"],
                "fut_mask": out["fut_mask"], "live": out["live"],
                "fut_xy": out["fut_xy"], "obs_xy": out["obs_xy"],
                "obs_mask": out["obs_mask"]}
    return jax.jit(fn)


def evaluate(params, cfg: DesireConfig, loader, *, k_samples=None,
             key=None, max_batches=None, epoch: int = 0,
             per_scene: bool = False, horizons=None,
             calibration: bool = False, speed_bins=None) -> dict:
    """minADE/minFDE (pixels) over a loader's epoch stream.

    per_scene=True adds a per-scene breakdown keyed by scene name.
    horizons: optional seconds tuple (e.g. (1,2,3,4)) — adds the DESIRE
    paper's SDD table protocol: errors at each horizon, both full-resolution
    pixels and the paper's 1/5-resolution pixels (BASELINE.md:26-29).
    calibration=True adds PIT/coverage statistics of the SGM gaussian heads
    (north-star "match in distribution" evidence).
    speed_bins: optional ascending px/step boundaries (e.g. (2, 8, 20)) —
    adds an error breakdown by observed-speed class (slow walkers vs bikes;
    the diagnostic axis for the bike-heavy deathCircle/little scenes)."""
    sampler = make_sampler(cfg, k_samples=k_samples)
    key = key if key is not None else jax.random.PRNGKey(cfg.seed + 1)
    acc: dict = {}
    # protocol rate: SDD annotations are ~30 fps; subsample strides to the
    # paper's 2.5 Hz (config.py subsample=12)
    hz = 30.0 / max(cfg.subsample, 1)
    hor_acc = {h: [0.0, 0.0, 0.0, 0.0, 0.0] for h in (horizons or ())}
    pit_bins = 20
    cal_acc = {"hist": np.zeros(pit_bins), "cov_n": 0.0,
               "cov": {0.5: 0.0, 0.9: 0.0}}

    def add(tag, a, f, b_ade, n):
        d = acc.setdefault(tag, [0.0, 0.0, 0.0, 0.0])
        d[0] += a * n
        d[1] += f * n
        d[2] += b_ade * n
        d[3] += n

    for bi, batch in enumerate(loader.epoch_batches(epoch)):
        if max_batches is not None and bi >= max_batches:
            break
        xy, mask, ids = batch_to_device(batch)
        key, sub = jax.random.split(key)
        out = sampler(params, xy, mask, ids, sub)
        scale = jnp.asarray(batch.scale)
        args = (out["fut_xy"].astype(jnp.float32),
                out["fut_mask"].astype(jnp.float32))
        # weight by the agents the metric actually averages over (live AND
        # has a valid future step) — weighting by bare live would bias the
        # batch aggregation whenever the ratio differs across batches
        live = (out["live"].astype(jnp.float32)
                * (jnp.sum(out["fut_mask"], axis=-1) > 0))
        traj = out["traj"].astype(jnp.float32)
        best = out["best"][:, :, None].astype(jnp.float32)
        if per_scene:
            for vid in np.unique(batch.video):
                sel = jnp.asarray(batch.video == vid, jnp.float32)
                live_v = live * sel[:, None]
                a, f = M.min_ade_fde(traj, *args, live_v, scale=scale)
                b_ade, _ = M.min_ade_fde(best, *args, live_v, scale=scale)
                scene = loader.videos[int(vid)].name.split("/")[0]
                add(scene, float(a), float(f), float(b_ade),
                    float(jnp.sum(live_v)))
        a, f = M.min_ade_fde(traj, *args, live, scale=scale)
        b_ade, _ = M.min_ade_fde(best, *args, live, scale=scale)
        add("__all__", float(a), float(f), float(b_ade),
            float(jnp.sum(live)))
        # SGM (pre-refinement) oracle — shows the IOC stage's value-add
        sa, sf = M.min_ade_fde(out["sgm_traj"].astype(jnp.float32), *args,
                               live, scale=scale)
        add("__sgm__", float(sa), float(sf), float(sa),
            float(jnp.sum(live)))
        # ranking quality: percentile of the chosen lane + score/-ADE corr
        rp, rc, rn = M.ranking_quality(out["scores"].astype(jnp.float32),
                                       traj, *args, live)
        add("__rank__", float(rp), float(rc), 0.0, float(rn))
        if speed_bins:
            # observed speed (px/step at the protocol rate) per agent
            om = out["obs_mask"].astype(jnp.float32)
            both = om[..., 1:] * om[..., :-1]
            dxy = jnp.diff(out["obs_xy"].astype(jnp.float32), axis=2)
            sp = (jnp.sum(jnp.linalg.norm(dxy, axis=-1) * both, -1)
                  / jnp.maximum(jnp.sum(both, -1), 1e-6))
            sp = sp * scale[:, None]                        # (B, A) px/step
            edges = [0.0] + list(speed_bins) + [float("inf")]
            for lo, hi in zip(edges[:-1], edges[1:]):
                sel = jnp.logical_and(sp >= lo, sp < hi).astype(jnp.float32)
                live_s = live * sel
                n_s = float(jnp.sum(live_s))
                if n_s == 0:
                    continue
                a_s, f_s = M.min_ade_fde(traj, *args, live_s, scale=scale)
                b_s, _ = M.min_ade_fde(best, *args, live_s, scale=scale)
                tag = f"speed[{lo:g},{hi:g})px/step"
                add(tag, float(a_s), float(f_s), float(b_s), n_s)
        for h in (horizons or ()):
            steps = h * hz
            if steps > traj.shape[-2] + 1e-6:
                continue
            ha, hf, n_h = M.horizon_ade_fde(traj, *args, live, steps,
                                            scale=scale)
            ba, bf, _ = M.horizon_ade_fde(best, *args, live, steps,
                                          scale=scale)
            d = hor_acc[h]
            n_h = float(n_h)
            d[0] += float(ha) * n_h
            d[1] += float(hf) * n_h
            d[2] += float(ba) * n_h
            d[3] += float(bf) * n_h
            d[4] += n_h
        if calibration:
            u, w = M.pit_values(out["raw5"], args[0], args[1], live)
            cal_acc["hist"] += np.asarray(M.pit_histogram(u, w, pit_bins))
            cov = M.coverage(u, w)
            n_c = float(jnp.sum(w)) * 2
            for lv in cov:
                cal_acc["cov"][lv] += cov[lv] * n_c
            cal_acc["cov_n"] += n_c

    def summarize(d):
        w = max(d[3], 1e-8)
        return {"minADE_px": d[0] / w, "minFDE_px": d[1] / w,
                "top1ADE_px": d[2] / w, "num_agents": d[3]}

    result = dict(summarize(acc.get("__all__", [0.0] * 4)),
                  K=k_samples or cfg.num_samples)
    sgm = summarize(acc.get("__sgm__", [0.0] * 4))
    result["sgm_minADE_px"] = sgm["minADE_px"]
    result["sgm_minFDE_px"] = sgm["minFDE_px"]
    rank = acc.get("__rank__")
    if rank and rank[3] > 0:
        # chance top1 percentile = 0.5 - 0.5/K; corr 0 = no ranking signal
        result["rank_top1_pctile"] = rank[0] / rank[3]
        result["rank_score_corr"] = rank[1] / rank[3]
    if speed_bins:
        result["speed_classes"] = {k: summarize(v) for k, v in acc.items()
                                   if k.startswith("speed[")}
    if per_scene:
        result["per_scene"] = {
            k: summarize(v) for k, v in acc.items()
            if k not in ("__all__", "__sgm__", "__rank__")
            and not k.startswith("speed[")}
    if horizons:
        result["horizons"] = {}
        for h, d in hor_acc.items():
            if d[4] <= 0:
                continue
            w = d[4]
            result["horizons"][f"{h:.1f}s"] = {
                "minADE_px": d[0] / w, "minFDE_px": d[1] / w,
                "top1ADE_px": d[2] / w, "top1FDE_px": d[3] / w,
                # the DESIRE paper's SDD table is in pixels at 1/5 resolution
                "minADE_px_fifth": d[0] / w / 5.0,
                "minFDE_px_fifth": d[1] / w / 5.0,
                "num_agents": w,
            }
    if calibration:
        hist = cal_acc["hist"]
        p = hist / max(hist.sum(), 1e-8)
        # Kolmogorov distance of the PIT empirical CDF from Uniform(0,1)
        ks = float(np.max(np.abs(np.cumsum(p) - np.linspace(
            1.0 / pit_bins, 1.0, pit_bins))))
        n = max(cal_acc["cov_n"], 1e-8)
        result["calibration"] = {
            "pit_ks": ks,
            "coverage_50": cal_acc["cov"][0.5] / n,
            "coverage_90": cal_acc["cov"][0.9] / n,
            "pit_hist": [float(x) for x in p],
        }
    return result


def make_rollout(cfg: DesireConfig, k_samples=None, stochastic=False):
    """Long-horizon autoregressive rollout — the capability analogue of the
    reference's ``DESIREModel.sample`` feed-back loop (model/model.py:643-685,
    which fed each predicted frame back as the next input): predict a
    ``pred_len`` chunk, append the top-ranked hypothesis to the observation
    window, slide, repeat.

    Returns jitted fn(params, obs_xy (B,A,To,2), obs_mask, ids, key,
    num_chunks) -> (B, A, To + num_chunks*pred_len, 2). num_chunks is static.
    """
    sampler_core = make_sampler(cfg, k_samples=k_samples,
                                stochastic=stochastic)

    def fn(params, obs_xy, obs_mask, ids, key, num_chunks=1):
        b, a, to, _ = obs_xy.shape
        tf_len = cfg.pred_len
        out = [obs_xy]
        cur_xy, cur_mask = obs_xy, obs_mask
        for _ in range(num_chunks):
            key, sub = jax.random.split(key)
            # assemble a (B, T, A, ·) batch with an empty future block
            xy = jnp.concatenate(
                [jnp.swapaxes(cur_xy, 1, 2),
                 jnp.zeros((b, tf_len, a), cur_xy.dtype)[..., None].repeat(2, -1)],
                axis=1)
            mask = jnp.concatenate(
                [jnp.swapaxes(cur_mask, 1, 2),
                 jnp.broadcast_to(cur_mask[:, :, -1:],
                                  (b, a, tf_len)).swapaxes(1, 2)], axis=1)
            res = sampler_core(params, xy, mask, ids, sub)
            best = res["best"].astype(cur_xy.dtype)        # (B, A, Tf, 2)
            out.append(best)
            # slide the window: keep the last To steps
            cur_xy = jnp.concatenate([cur_xy, best], axis=2)[:, :, -to:]
            cur_mask = jnp.concatenate(
                [cur_mask, jnp.broadcast_to(cur_mask[:, :, -1:],
                                            (b, a, tf_len))], axis=2)[:, :, -to:]
        return jnp.concatenate(out, axis=2)

    return jax.jit(fn, static_argnames=("num_chunks",))
