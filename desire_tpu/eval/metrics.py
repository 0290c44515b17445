"""Evaluation metrics: best-of-K minADE / minFDE (BASELINE.json headline).

The reference has no eval harness at all (SURVEY §6); protocol follows the
DESIRE paper: displacement errors over the 4.8 s horizon (12 steps at 2.5 Hz)
in *pixels* (de-normalized by the per-video scale), minimum over the K
hypotheses, masked-averaged over live agents.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from desire_tpu.models import losses


def displacement_errors(pred, gt, step_mask):
    """pred (..., K, T, 2), gt (..., T, 2), step_mask (..., T) ->
    (ade (..., K), fde (..., K))."""
    d = jnp.linalg.norm(pred - gt[..., None, :, :], axis=-1)   # (..., K, T)
    m = step_mask[..., None, :]
    ade = jnp.sum(d * m, axis=-1) / jnp.maximum(jnp.sum(m, axis=-1), 1e-8)
    # FDE at the last *valid* step of each agent
    t = step_mask.shape[-1]
    idx = jnp.argmax(
        step_mask * jnp.arange(1, t + 1, dtype=step_mask.dtype), axis=-1)
    fde = jnp.take_along_axis(d, idx[..., None, None], axis=-1)[..., 0]
    return ade, fde


def min_ade_fde(pred, gt, step_mask, agent_mask, scale=None):
    """Best-of-K metrics.

    pred (B, A, K, T, 2); gt (B, A, T, 2); step_mask (B, A, T);
    agent_mask (B, A); scale (B,) de-normalization (pixels per unit).
    Returns scalar (minADE, minFDE)."""
    if scale is not None:
        s = scale[:, None, None, None, None]
        pred = pred * s
        gt = gt * scale[:, None, None, None]
    ade, fde = displacement_errors(pred, gt, step_mask)
    # only agents with at least one valid future step count
    valid = agent_mask * (jnp.sum(step_mask, axis=-1) > 0)
    min_ade = losses.masked_mean(jnp.min(ade, axis=-1), valid)
    min_fde = losses.masked_mean(jnp.min(fde, axis=-1), valid)
    return min_ade, min_fde


def per_agent_min_ade_fde(pred, gt, step_mask, scale=None):
    """Per-agent best-of-K errors (no masked mean — callers aggregate).

    pred (B, A, K, T, 2); gt (B, A, T, 2); step_mask (B, A, T); scale (B,).
    Returns (min_ade (B, A), min_fde (B, A)) in pixels when scale is given.
    """
    if scale is not None:
        pred = pred * scale[:, None, None, None, None]
        gt = gt * scale[:, None, None, None]
    ade, fde = displacement_errors(pred, gt, step_mask)
    return jnp.min(ade, axis=-1), jnp.min(fde, axis=-1)


def track_decomposition(pred, gt, step_mask, scale=None, min_step_px=0.25):
    """Along-/cross-track decomposition of the best-of-K lane's error.

    The diagnostic behind the fast-agent gap (RESULTS speed tables): is the
    bike error speed misestimation (along the ground-truth tangent) or
    direction/turn error (perpendicular)? The reference frame is the GT
    path's unit tangent at each step (step 0 borrows step 1's tangent);
    steps where the GT moves less than min_step_px are excluded — SDD
    annotations are integer pixels, so sub-pixel steps carry quantization
    noise, not a direction.

    pred (B, A, K, T, 2); gt (B, A, T, 2); step_mask (B, A, T); scale (B,).
    Returns (along (B, A), cross (B, A), weight (B, A)): per-agent masked
    mean |error·tangent| and |error×tangent| of the min-ADE lane, and a 0/1
    weight (agent had >=1 decomposable step)."""
    if scale is not None:
        pred = pred * scale[:, None, None, None, None]
        gt = gt * scale[:, None, None, None]
    ade, _ = displacement_errors(pred, gt, step_mask)
    k_best = jnp.argmin(ade, axis=-1)                            # (B, A)
    best = jnp.take_along_axis(
        pred, k_best[..., None, None, None], axis=2)[:, :, 0]    # (B,A,T,2)
    tan = jnp.diff(gt, axis=-2, prepend=gt[..., :1, :])
    if gt.shape[-2] > 1:
        tan = tan.at[..., 0, :].set(tan[..., 1, :])
    tn = jnp.linalg.norm(tan, axis=-1, keepdims=True)
    ok = (tn[..., 0] > min_step_px).astype(gt.dtype) * step_mask  # (B,A,T)
    u = tan / jnp.maximum(tn, 1e-6)
    e = best - gt
    along = jnp.abs(jnp.sum(e * u, axis=-1))
    cross = jnp.abs(e[..., 0] * u[..., 1] - e[..., 1] * u[..., 0])
    denom = jnp.maximum(jnp.sum(ok, axis=-1), 1e-8)
    return (jnp.sum(along * ok, axis=-1) / denom,
            jnp.sum(cross * ok, axis=-1) / denom,
            (jnp.sum(ok, axis=-1) > 0).astype(gt.dtype))


def best_of_k_by_score(pred, scores, blend=0.0):
    """Pick each agent's top-scored hypothesis (IOC ranking output).
    pred (B, A, K, T, 2), scores (B, A, K) -> (B, A, T, 2).

    blend > 0 adds z-normalized lane TYPICALITY (negative endpoint distance
    to the K-lane mean endpoint — a cheap mixture-mode surrogate) to the
    z-normalized IOC score before the argmax. Measured on a held-out dump
    (t_innorm, 384 windows): pure score 31.7 px top-1, blend 0.5 -> 29.6 px
    — the IOC score knows WHICH basin, typicality centers within it."""
    if blend:
        ends = pred[..., -1, :]
        typ = -jnp.linalg.norm(
            ends - jnp.mean(ends, axis=2, keepdims=True), axis=-1)

        def z(x):
            mu = jnp.mean(x, axis=-1, keepdims=True)
            sd = jnp.std(x, axis=-1, keepdims=True)
            return (x - mu) / (sd + 1e-8)
        scores = z(scores) + blend * z(typ)
    idx = jnp.argmax(scores, axis=-1)
    return jnp.take_along_axis(
        pred, idx[..., None, None, None], axis=2)[:, :, 0]


def horizon_ade_fde(pred, gt, step_mask, agent_mask, horizon_steps,
                    scale=None):
    """Paper-protocol errors at a (possibly fractional) horizon.

    The DESIRE paper reports SDD errors at 1.0-4.0 s; at the 2.5 Hz protocol
    rate step t (1-based) sits at t/2.5 s, so 1.0 s falls BETWEEN steps 2 and
    3 (horizon_steps = 2.5). Trajectories are piecewise-linear between
    annotation samples, so the position at a fractional step is the lerp of
    the bracketing steps — FDE@h uses that interpolated point; ADE@h averages
    the displacement errors of the integer steps up to floor(h).

    pred (B, A, K, T, 2); gt (B, A, T, 2); step_mask (B, A, T);
    agent_mask (B, A); horizon_steps: float in (0, T].
    Returns (minADE@h, minFDE@h, count) — count = agents whose mask covers
    every step up to ceil(h) (partial futures are excluded: an interpolated
    endpoint across a masked gap would be fiction).
    """
    if scale is not None:
        pred = pred * scale[:, None, None, None, None]
        gt = gt * scale[:, None, None, None]
    t = gt.shape[-2]
    lo = max(int(math.floor(horizon_steps + 1e-6)), 1)      # 1-based
    hi = min(int(math.ceil(horizon_steps - 1e-6)), t)
    frac = float(horizon_steps) - lo
    d = jnp.linalg.norm(pred - gt[..., None, :, :], axis=-1)  # (B,A,K,T)
    ade = jnp.mean(d[..., :lo], axis=-1)                      # (B, A, K)
    if hi > lo:
        p_h = pred[..., lo - 1, :] * (1 - frac) + pred[..., hi - 1, :] * frac
        g_h = gt[..., lo - 1, :] * (1 - frac) + gt[..., hi - 1, :] * frac
        fde = jnp.linalg.norm(p_h - g_h[..., None, :], axis=-1)
    else:
        fde = d[..., lo - 1]
    covered = jnp.all(step_mask[..., :hi] > 0, axis=-1)       # (B, A)
    valid = agent_mask * covered
    min_ade = losses.masked_mean(jnp.min(ade, axis=-1), valid)
    min_fde = losses.masked_mean(jnp.min(fde, axis=-1), valid)
    return min_ade, min_fde, jnp.sum(valid)


def per_agent_horizon(pred, gt, step_mask, horizon_steps, scale=None):
    """Per-agent variant of horizon_ade_fde (same protocol semantics).

    Returns (min_ade@h (B, A), min_fde@h (B, A), covered (B, A)) — covered
    is the agent's eligibility mask (all steps up to ceil(h) observed).
    """
    if scale is not None:
        pred = pred * scale[:, None, None, None, None]
        gt = gt * scale[:, None, None, None]
    t = gt.shape[-2]
    lo = max(int(math.floor(horizon_steps + 1e-6)), 1)      # 1-based
    hi = min(int(math.ceil(horizon_steps - 1e-6)), t)
    frac = float(horizon_steps) - lo
    d = jnp.linalg.norm(pred - gt[..., None, :, :], axis=-1)  # (B,A,K,T)
    ade = jnp.mean(d[..., :lo], axis=-1)                      # (B, A, K)
    if hi > lo:
        p_h = pred[..., lo - 1, :] * (1 - frac) + pred[..., hi - 1, :] * frac
        g_h = gt[..., lo - 1, :] * (1 - frac) + gt[..., hi - 1, :] * frac
        fde = jnp.linalg.norm(p_h - g_h[..., None, :], axis=-1)
    else:
        fde = d[..., lo - 1]
    covered = jnp.all(step_mask[..., :hi] > 0, axis=-1).astype(jnp.float32)
    return jnp.min(ade, axis=-1), jnp.min(fde, axis=-1), covered


def per_agent_ranking(scores, pred, gt, step_mask):
    """Per-agent variant of ranking_quality: (top1_pct (B,A), corr (B,A))."""
    d = jnp.linalg.norm(pred - gt[..., None, :, :], axis=-1)   # (B,A,K,T)
    m = step_mask[..., None, :]
    ade = jnp.sum(d * m, axis=-1) / jnp.maximum(jnp.sum(m, axis=-1), 1e-8)
    k = ade.shape[-1]
    pick = jnp.argmax(scores, axis=-1)                          # (B, A)
    picked_ade = jnp.take_along_axis(ade, pick[..., None], -1)[..., 0]
    better = jnp.sum((ade < picked_ade[..., None]).astype(jnp.float32), -1)
    top1_pct = better / max(k - 1, 1)
    zs = (scores - scores.mean(-1, keepdims=True)) / (
        scores.std(-1, keepdims=True) + 1e-8)
    zd = (ade - ade.mean(-1, keepdims=True)) / (ade.std(-1, keepdims=True)
                                                + 1e-8)
    corr = jnp.mean(-zs * zd, axis=-1)                          # (B, A)
    return top1_pct, corr


def ranking_quality(scores, pred, gt, step_mask, agent_mask):
    """IOC ranking diagnostics (is top-1 selection better than chance?).

    scores (B,A,K); pred (B,A,K,T,2); gt (B,A,T,2); step_mask (B,A,T);
    agent_mask (B,A). Returns (top1_pct, corr, n):
      top1_pct — mean percentile rank (0 = picked the best lane, 1 = worst)
                 of the argmax-score lane when lanes are ordered by ADE;
                 chance = 0.5 - 0.5/K.
      corr     — masked-mean per-agent Pearson correlation between scores
                 and -ADE across lanes (1 = perfect ranking signal).

    Aggregates per_agent_ranking (single source of the per-agent math —
    ADVICE r2: the two diagnostics must not drift).
    """
    top1_pct, corr = per_agent_ranking(scores, pred, gt, step_mask)
    valid = agent_mask * (jnp.sum(step_mask, axis=-1) > 0)
    return (losses.masked_mean(top1_pct, valid),
            losses.masked_mean(corr, valid), jnp.sum(valid))


# ---------------------------------------------------------------------------
# Distribution calibration (north star: "match the TF1 reference in
# distribution" — the reference specifies bivariate-Gaussian heads, C14;
# these statistics test that the model's predictive distribution is an
# honest one, not just that its mean is close)
# ---------------------------------------------------------------------------

def pit_values(raw5, gt, step_mask, agent_mask, sigma_temp=1.0):
    """Probability-integral-transform of the ground truth under the K-lane
    Gaussian mixture, per coordinate.

    For each future step the model's marginal predictive distribution in x is
    the uniform mixture over lanes N(mu_kx, sx_k); its exact CDF at the truth
    is u = mean_k Phi((x - mu_kx)/sx_k) (same for y). If the predictive
    distribution is calibrated, u is Uniform(0,1) over held-out data.

    sigma_temp scales the predicted sigmas (post-hoc temperature fit on a
    train-video validation slice — see sampler.fit_sigma_temperature).
    Scalar tau: sigma * tau (corrects the center at the cost of the
    tails). Pair (tau_center, tau_tail): each lane's Gaussian CDF becomes
    the equal-weight two-scale mixture 0.5*Phi(z/tau_c) + 0.5*Phi(z/tau_t)
    — a valid CDF whose density has a narrow center AND heavy tails, so
    the 50% and 90% intervals calibrate independently (the scalar tau
    structurally trades one for the other; RESULTS.md calibration).

    raw5 (B, A, K, T, 5); gt (B, A, T, 2); step_mask (B, A, T);
    agent_mask (B, A). Returns (u (B,A,T,2), weights (B,A,T)).
    """
    mux, muy, sx, sy, _ = losses.get_coef(raw5.astype(jnp.float32))
    gx = gt[..., None, :, 0]
    gy = gt[..., None, :, 1]

    def phi(z):
        return 0.5 * (1.0 + jax.scipy.special.erf(z / jnp.sqrt(2.0)))

    if isinstance(sigma_temp, (tuple, list)):
        # (tau_center, tau_tail[, w_center]): mixture weight on the center
        # component defaults to 0.5; a third entry tunes it (the r5 on-chip
        # fit showed the equal-weight tail floors central coverage ~0.54 —
        # the weight is the lever that decouples the two levels)
        tc, tt = float(sigma_temp[0]), float(sigma_temp[1])
        w = float(sigma_temp[2]) if len(sigma_temp) > 2 else 0.5
        ux = jnp.mean(w * phi((gx - mux) / (sx * tc))
                      + (1 - w) * phi((gx - mux) / (sx * tt)), axis=-2)
        uy = jnp.mean(w * phi((gy - muy) / (sy * tc))
                      + (1 - w) * phi((gy - muy) / (sy * tt)), axis=-2)
    else:
        if sigma_temp != 1.0:
            sx = sx * sigma_temp
            sy = sy * sigma_temp
        ux = jnp.mean(phi((gx - mux) / sx), axis=-2)      # (B, A, T)
        uy = jnp.mean(phi((gy - muy) / sy), axis=-2)
    w = step_mask * agent_mask[..., None]
    return jnp.stack([ux, uy], axis=-1), w


def pit_histogram(u, w, bins=10):
    """Weighted PIT histogram counts (flattened over coords)."""
    u = u.reshape(-1)
    w = jnp.broadcast_to(w[..., None], w.shape + (2,)).reshape(-1)
    edges = jnp.linspace(0.0, 1.0, bins + 1)
    idx = jnp.clip(jnp.searchsorted(edges, u, side="right") - 1, 0, bins - 1)
    return jnp.zeros(bins).at[idx].add(w)


def coverage(u, w, levels=(0.5, 0.9)):
    """Central-interval coverage: fraction of PIT values inside the central
    `level` interval ((1-l)/2, (1+l)/2). Calibrated -> coverage == level."""
    w2 = jnp.broadcast_to(w[..., None], w.shape + (2,))
    tot = jnp.maximum(jnp.sum(w2), 1e-8)
    out = {}
    for lv in levels:
        lo, hi = (1 - lv) / 2, (1 + lv) / 2
        inside = jnp.logical_and(u >= lo, u <= hi).astype(jnp.float32)
        out[lv] = float(jnp.sum(inside * w2) / tot)
    return out
