"""IOC ranking & refinement module.

**Absent from the reference** — the insertion point is marked
"RANKING AND REFINING SHOULD GO BEFORE WHAT FOLLOWS HERE !!!"
(/root/reference/model/model.py:312-313); built here from the DESIRE paper
(Lee et al., CVPR'17 §3.2) per BASELINE.json config 3 ("4 refinement
iterations"):

* a score-accumulating GRU runs over each hypothesis' fused context features
  (scene-context-fusion vector per step, scf.py) and emits a per-step reward
  ψ_t; the hypothesis score is the (future-mask-weighted) sum of rewards —
  the max-ent IOC "accumulated return";
* a regression head on the same hidden state emits per-step trajectory
  deltas Δy_t; the hypothesis is refined y ← y + scale·Δy and re-scored,
  ``num_refine`` times (features re-pooled at the refined positions each
  iteration).

The score GRU's per-step input fuses FOUR blocks: hypothesis velocity, scene
features pooled at the hypothesis position, social context, and the SGM
decoder hidden state of the hypothesis itself. The last block is what lets
the ranker condition on the agent's own dynamics/past (dec_h carries the
past-encoder state through the decoder init) — without it the ranking head
must judge hypotheses from their shape alone, which round-1 measurements
showed ranks barely better than chance (top-1 ADE ~2x the best-of-K oracle).

TPU shape: everything is batched over (B·A·K) rows; the per-iteration loop is
a static Python unroll of length ``num_refine`` (4) — XLA sees one straight-
line program, no dynamic control flow.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from desire_tpu.config import DesireConfig
from desire_tpu.models import layers as L
from desire_tpu.models import scf

# Refinement step size: deltas are tanh-bounded and scaled, keeping each
# iteration a local correction (positions live in [0,1] scene units). The
# learned sigmoid gate (init 0.5) modulates this per lane/step, so the
# effective initial bound matches the round-1 value of 0.05.
_DELTA_SCALE = 0.1


def init_ioc(key, cfg: DesireConfig, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 4)
    # scf.fuse_context layout: [vel(2) | scene(C) | social(d)] + dec_h(d)
    feat_dim = 2 + cfg.scene_channels + 2 * cfg.d_dim
    return {
        "gru": L.init_gru_stack(ks[0], feat_dim, cfg.d_dim, 1, dtype),
        "score": L.init_dense(ks[1], cfg.d_dim, 1, dtype),
        # zero-init: refinement starts as the identity (no drift away from
        # the SGM hypotheses before the regression loss shapes the deltas)
        "delta": {"w": jnp.zeros((cfg.d_dim, 2), dtype),
                  "b": jnp.zeros((2,), dtype)},
        # per-step delta gate (sigmoid, init 0.5): lets the model suppress
        # refinement on lanes/steps where moving the hypothesis hurts —
        # round-1's refinement consistently damaged the SGM oracle
        "gate": {"w": jnp.zeros((cfg.d_dim, 1), dtype),
                 "b": jnp.zeros((1,), dtype)},
    }


def score_and_delta(p, feats, dec_h, fut_mask, scene_channels):
    """Run the scoring GRU over one hypothesis set.

    feats: (vel, scene, social) tuple from scf.fuse_context — each
    (B, A, K, Tf, ·) or None; dec_h: (B, A, K, Tf, d) SGM decoder hiddens;
    fut_mask: (B, A, Tf).
    Returns scores (B, A, K), deltas (B, A, K, Tf, 2), hidden (B,A,K,Tf,d).
    """
    vel, scene, social = feats
    b, a, k, tf, _ = vel.shape
    gp = p["gru"][0]
    if social is None:
        soc_dim = gp["wi"].shape[0] - 2 - scene_channels - dec_h.shape[-1]
        social = jnp.zeros(vel.shape[:-1] + (soc_dim,), vel.dtype)
    fused = jnp.concatenate(
        [vel, scene, social, dec_h.astype(vel.dtype)], axis=-1)
    xs = jnp.moveaxis(fused.reshape(b * a * k, tf, -1), 1, 0)  # (Tf, M, F)
    h0 = jnp.zeros((b * a * k, gp["wh"].shape[0]), vel.dtype)
    _, hs = L.gru_scan(gp, h0, xs)                             # (Tf, M, d)
    hs = jnp.swapaxes(hs, 0, 1).reshape(b, a, k, tf, -1)
    psi = L.dense(p["score"], hs)[..., 0]                   # (B, A, K, Tf)
    m = fut_mask.astype(psi.dtype)[:, :, None, :]
    scores = jnp.sum(psi * m, axis=-1)                      # (B, A, K)
    gate = jax.nn.sigmoid(L.dense(p["gate"], hs))           # (B, A, K, Tf, 1)
    deltas = jnp.tanh(L.dense(p["delta"], hs)) * gate * _DELTA_SCALE
    deltas = deltas * m[..., None]
    return scores, deltas, hs


def ioc_forward(p_ioc, p_scf, cfg: DesireConfig, traj, dec_h, feat_map,
                live, fut_mask, num_refine=None):
    """Iterative rank-and-refine.

    traj: (B, A, K, Tf, 2) SGM mean trajectories (absolute normalized, f32);
    dec_h: (B, A, K, Tf, d) SGM decoder hiddens; feat_map: (B, G, G, C);
    live: (B, A); fut_mask: (B, A, Tf).

    Returns (refined_traj, scores, per_iter_trajs):
      refined_traj (B, A, K, Tf, 2) — after the final iteration (f32)
      scores       (B, A, K)        — accumulated rewards of the final pass
      per_iter     list of (B,A,K,Tf,2), one per iteration (for deep
                    supervision of the regression loss)
    """
    iters = cfg.num_refine if num_refine is None else num_refine
    per_iter = []
    scores = None
    traj = traj.astype(jnp.float32)  # position state stays exact
    traj0 = traj                     # initial (SGM) positions
    # social messages depend only on dec_h -> project once, reuse per iter
    msg = scf.social_messages(p_scf, dec_h) if cfg.use_social else dec_h
    # config.py social_freeze: attend once at the INITIAL positions, reuse
    # the pooled social block every pass (deltas are bounded-small, so the
    # distance-kernel weights barely move; saves the per-pass attention)
    social0 = (scf.social_pool(p_scf, traj, msg, live)
               if (cfg.use_social and cfg.social_freeze) else None)

    def one_iter(p_ioc, p_scf, traj, msg, dec_h, social0):
        feats = scf.fuse_context(p_scf, cfg, traj, msg, feat_map, live,
                                 social=social0)
        _, deltas, _ = score_and_delta(p_ioc, feats, dec_h, fut_mask,
                                       cfg.scene_channels)
        return traj + deltas.astype(jnp.float32)

    if cfg.remat:
        # rematerialize each iteration in the backward pass instead of
        # stashing its (B, K*T, A, A) social-attention activations — the
        # HBM-residency fix that makes K=50 training fit (see config.py)
        one_iter = jax.checkpoint(one_iter)
    for _ in range(max(iters, 1)):
        traj = one_iter(p_ioc, p_scf, traj, msg, dec_h, social0)
        per_iter.append(traj)
    # re-score the FINAL trajectories: inside the loop scores are computed
    # before the last delta is applied, so they would describe stale
    # hypotheses (ranking/CE would mis-rank lanes whose final delta moved
    # them) — one extra scoring pass aligns scores with refined_traj.
    # stop_gradient on the trajectory input: scoring judges hypotheses, it
    # must not MOVE them. Without it the ranking CE backpropagates through
    # scores -> pooled features -> refined positions -> deltas and drags
    # hypotheses to wherever lanes are easiest to tell apart — measured in
    # round 2: the moment the CE target became sharp enough to train, the
    # refined-vs-SGM oracle gap exploded from ~2 px to ~26-29 px at epoch 1.
    # (The CE loss already stop-gradients its distance TARGET, losses.py;
    # this cuts the other, feature-side leak.)
    # (under social_freeze the scoring pool is re-derived with the INITIAL
    # positions stop-gradiented — same VALUE as social0 (fused-kernel parity)
    # but the position leak is cut while msg/logtau keep their score-side
    # gradient; stopping social0 wholesale would zero those at init, where
    # the zero-init delta heads leave no other path)
    social_sc = None
    if social0 is not None:
        social_sc = scf.social_pool(p_scf, jax.lax.stop_gradient(traj0),
                                    msg, live)
    feats = scf.fuse_context(
        p_scf, cfg, jax.lax.stop_gradient(traj), msg, feat_map, live,
        social=social_sc)
    scores, _, _ = score_and_delta(p_ioc, feats, dec_h, fut_mask,
                                   cfg.scene_channels)
    return traj, scores, per_iter
