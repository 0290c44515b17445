"""Evaluation metrics: best-of-K minADE / minFDE (BASELINE.json headline).

The reference has no eval harness at all (SURVEY §6); protocol follows the
DESIRE paper: displacement errors over the 4.8 s horizon (12 steps at 2.5 Hz)
in *pixels* (de-normalized by the per-video scale), minimum over the K
hypotheses, masked-averaged over live agents.
"""

from __future__ import annotations

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


def best_of_k_by_score(pred, scores):
    """Pick each agent's top-scored hypothesis (IOC ranking output).
    pred (B, A, K, T, 2), scores (B, A, K) -> (B, A, T, 2)."""
    idx = jnp.argmax(scores, axis=-1)
    return jnp.take_along_axis(
        pred, idx[..., None, None, None], axis=2)[:, :, 0]
