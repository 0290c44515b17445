"""Kernel tier (SURVEY §4): Pallas kernels vs the pure-XLA reference
implementations, interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from desire_tpu.models import layers, scf
from desire_tpu.ops.scene_pool import bilinear_pool_pallas


def _interior_positions(key, b, p, g, lo=0.15, hi=0.85):
    """Positions away from cell boundaries (floor() is discontinuous there —
    kernel and reference may legitimately pick different corners at exact
    boundaries)."""
    k1, k2 = jax.random.split(key)
    cells = jax.random.randint(k1, (b, p, 2), 0, g - 1)
    frac = jax.random.uniform(k2, (b, p, 2), minval=lo, maxval=hi)
    return (cells + frac) / (g - 1)


def test_scene_pool_forward_matches_xla():
    b, g, c, p = 3, 16, 8, 700   # p deliberately not a multiple of the tile
    fm = jax.random.normal(jax.random.PRNGKey(0), (b, g, g, c))
    pos = _interior_positions(jax.random.PRNGKey(1), b, p, g)
    out_k = bilinear_pool_pallas(fm, pos, True)   # interpret mode
    out_x = scf.bilinear_pool(fm, pos)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_x),
                               rtol=1e-5, atol=1e-5)
    assert out_k.shape == (b, p, c)


def test_scene_pool_out_of_range_positions_clamp():
    b, g, c = 2, 16, 8
    fm = jax.random.normal(jax.random.PRNGKey(0), (b, g, g, c))
    pos = jnp.array([[[-0.5, 0.5], [1.5, 0.5], [0.5, -3.0]]] * b)
    out_k = bilinear_pool_pallas(fm, pos, True)
    out_x = scf.bilinear_pool(fm, pos)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_x),
                               rtol=1e-5, atol=1e-5)


def test_scene_pool_gradients_match_xla():
    b, g, c, p = 2, 16, 8, 300
    fm = jax.random.normal(jax.random.PRNGKey(0), (b, g, g, c))
    pos = _interior_positions(jax.random.PRNGKey(1), b, p, g)
    tgt = jax.random.normal(jax.random.PRNGKey(2), (b, p, c))

    def loss_k(f, x):
        return jnp.sum((bilinear_pool_pallas(f, x, True) - tgt) ** 2)

    def loss_x(f, x):
        return jnp.sum((scf.bilinear_pool(f, x) - tgt) ** 2)

    gk = jax.grad(loss_k, argnums=(0, 1))(fm, pos)
    gx = jax.grad(loss_x, argnums=(0, 1))(fm, pos)
    np.testing.assert_allclose(np.asarray(gk[0]), np.asarray(gx[0]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gk[1]), np.asarray(gx[1]),
                               rtol=1e-4, atol=1e-3)


def test_scene_pool_grad_against_finite_differences():
    """Independent check of d_pos (not vs our own XLA impl)."""
    g, c = 16, 4
    fm = jax.random.normal(jax.random.PRNGKey(0), (1, g, g, c))
    pos = _interior_positions(jax.random.PRNGKey(1), 1, 4, g, 0.3, 0.7)

    def f(x):
        return jnp.sum(jnp.sin(bilinear_pool_pallas(fm, x, True)))

    grad = jax.grad(f)(pos)
    eps = 1e-4
    for i in range(4):
        for d in range(2):
            dp = jnp.zeros_like(pos).at[0, i, d].set(eps)
            fd = (f(pos + dp) - f(pos - dp)) / (2 * eps)
            np.testing.assert_allclose(float(grad[0, i, d]), float(fd),
                                       rtol=2e-2, atol=1e-3)


# -- fused NLL ----------------------------------------------------------------

def test_nll_kernel_matches_reference():
    from desire_tpu.models import losses
    from desire_tpu.ops.nll import bivariate_nll_pallas
    n, k, t = 300, 3, 5   # n not a tile multiple
    raw5 = jax.random.normal(jax.random.PRNGKey(0), (n, k, t, 5))
    tgt = jax.random.normal(jax.random.PRNGKey(1), (n, t, 2))
    mask = (jax.random.uniform(jax.random.PRNGKey(2), (n, t)) > 0.3
            ).astype(jnp.float32)
    got = bivariate_nll_pallas(raw5, tgt, mask, True)      # interpret
    want = jnp.sum(losses.bivariate_nll(
        raw5, tgt[:, None], step_mask=mask[:, None]), axis=-1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)


def test_nll_kernel_floor_active():
    from desire_tpu.ops.nll import bivariate_nll_pallas
    # far-out target: every step floored at -log(1e-20)
    raw5 = jnp.zeros((4, 2, 3, 5)).at[..., 2:4].set(-2.0)
    tgt = jnp.full((4, 3, 2), 1e3)
    mask = jnp.ones((4, 3))
    got = bivariate_nll_pallas(raw5, tgt, mask, True)
    np.testing.assert_allclose(np.asarray(got), 3 * -np.log(1e-20), rtol=1e-6)
    # floored rows must get zero gradient
    g = jax.grad(lambda r: jnp.sum(bivariate_nll_pallas(r, tgt, mask, True)))(
        raw5)
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-7)


def test_nll_kernel_gradients_match_reference():
    from desire_tpu.models import losses
    from desire_tpu.ops.nll import bivariate_nll_pallas
    n, k, t = 64, 4, 6
    raw5 = jax.random.normal(jax.random.PRNGKey(0), (n, k, t, 5)) * 0.5
    tgt = jax.random.normal(jax.random.PRNGKey(1), (n, t, 2)) * 0.5
    mask = (jax.random.uniform(jax.random.PRNGKey(2), (n, t)) > 0.3
            ).astype(jnp.float32)
    # weighted sum so every lane gets a distinct cotangent
    wts = jax.random.normal(jax.random.PRNGKey(3), (n, k))

    def lk(r):
        return jnp.sum(bivariate_nll_pallas(r, tgt, mask, True) * wts)

    def lx(r):
        lane = jnp.sum(losses.bivariate_nll(
            r, tgt[:, None], step_mask=mask[:, None]), axis=-1)
        return jnp.sum(lane * wts)

    gk = jax.grad(lk)(raw5)
    gx = jax.grad(lx)(raw5)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gx),
                               rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# Fused IOC rank-and-refine kernel (ops/ioc_fused.py)
# ---------------------------------------------------------------------------

def _ioc_env(seed=0, b=2, a=5, k=3, t=6, d=16, g=8, c=8):
    from desire_tpu.config import DesireConfig
    from desire_tpu.models.ioc import init_ioc
    from desire_tpu.models.scf import init_scf
    cfg = DesireConfig(d_dim=d, scene_grid=g, scene_channels=c,
                       num_refine=2, compute_dtype="float32",
                       max_num_obj=a, num_samples=k, pred_len=t)
    ks = jax.random.split(jax.random.PRNGKey(seed), 8)
    p_ioc = init_ioc(ks[0], cfg)
    # break the zero-init of delta/gate so refinement actually moves
    p_ioc["delta"]["w"] = 0.3 * jax.random.normal(ks[1], (d, 2))
    p_ioc["gate"]["w"] = 0.3 * jax.random.normal(ks[2], (d, 1))
    p_scf = init_scf(ks[3], cfg)
    traj = jax.random.uniform(ks[4], (b, a, k, t, 2), minval=0.2, maxval=0.8)
    dec_h = jax.random.normal(ks[5], (b, a, k, t, d))
    feat_map = jax.random.normal(ks[6], (b, g, g, c))
    live = (jax.random.uniform(ks[7], (b, a)) > 0.3).astype(jnp.float32)
    live = live.at[:, 0].set(1.0)           # at least one live agent
    fut_mask = jnp.ones((b, a, t)).at[:, :, -1].set(0.0)
    return cfg, p_ioc, p_scf, traj, dec_h, feat_map, live, fut_mask


def test_fused_ioc_matches_xla_ioc_forward():
    """The fused kernel reproduces ioc_forward (refined traj + scores) at
    f32, including the final re-score-on-frozen-traj semantics."""
    from desire_tpu.models.ioc import _DELTA_SCALE, ioc_forward
    from desire_tpu.ops.ioc_fused import ioc_refine_fused
    cfg, p_ioc, p_scf, traj, dec_h, feat_map, live, fut_mask = _ioc_env()
    ref_traj, ref_scores, _ = ioc_forward(
        p_ioc, p_scf, cfg, traj, dec_h, feat_map, live, fut_mask)
    msg = scf.social_messages(p_scf, dec_h)
    out_traj, out_scores = ioc_refine_fused(
        p_ioc, p_scf, traj, dec_h, msg, feat_map, live, fut_mask,
        num_refine=cfg.num_refine, delta_scale=_DELTA_SCALE, interpret=True)
    np.testing.assert_allclose(np.asarray(out_traj), np.asarray(ref_traj),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_scores),
                               np.asarray(ref_scores), rtol=2e-4, atol=2e-4)


def test_fused_ioc_tent_mm_matches_xla(monkeypatch):
    """DESIRE_TENT_MM=1 (factorized scene-tent build: narrow 1-D tents +
    one-hot expansion matmuls) must reproduce ioc_forward exactly at f32 —
    the expansion matmuls copy single nonzero terms, so the factorization
    is numbers-identical up to matmul accumulation order."""
    from desire_tpu.models.ioc import _DELTA_SCALE, ioc_forward
    from desire_tpu.ops.ioc_fused import ioc_refine_fused
    cfg, p_ioc, p_scf, traj, dec_h, feat_map, live, fut_mask = _ioc_env()
    ref_traj, ref_scores, _ = ioc_forward(
        p_ioc, p_scf, cfg, traj, dec_h, feat_map, live, fut_mask)
    msg = scf.social_messages(p_scf, dec_h)
    monkeypatch.setenv("DESIRE_TENT_MM", "1")
    out_traj, out_scores = ioc_refine_fused(
        p_ioc, p_scf, traj, dec_h, msg, feat_map, live, fut_mask,
        num_refine=cfg.num_refine, delta_scale=_DELTA_SCALE, interpret=True)
    np.testing.assert_allclose(np.asarray(out_traj), np.asarray(ref_traj),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_scores),
                               np.asarray(ref_scores), rtol=2e-4, atol=2e-4)


def test_fused_ioc_social_freeze_matches_xla():
    """social_freeze=True: the fused kernel (attend once at pass-0
    positions, reuse the pooled block every pass) must reproduce the
    XLA ioc_forward under the same config flag — and differ from the
    per-pass-attention output (the flag must actually change semantics)."""
    from desire_tpu.models.ioc import _DELTA_SCALE, ioc_forward
    from desire_tpu.ops.ioc_fused import ioc_refine_fused
    cfg, p_ioc, p_scf, traj, dec_h, feat_map, live, fut_mask = _ioc_env()
    cfg = cfg.replace(social_freeze=True)
    ref_traj, ref_scores, _ = ioc_forward(
        p_ioc, p_scf, cfg, traj, dec_h, feat_map, live, fut_mask)
    msg = scf.social_messages(p_scf, dec_h)
    out_traj, out_scores = ioc_refine_fused(
        p_ioc, p_scf, traj, dec_h, msg, feat_map, live, fut_mask,
        num_refine=cfg.num_refine, delta_scale=_DELTA_SCALE,
        interpret=True, social_freeze=True)
    np.testing.assert_allclose(np.asarray(out_traj), np.asarray(ref_traj),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_scores),
                               np.asarray(ref_scores), rtol=2e-4, atol=2e-4)
    unfrozen, _ = ioc_refine_fused(
        p_ioc, p_scf, traj, dec_h, msg, feat_map, live, fut_mask,
        num_refine=cfg.num_refine, delta_scale=_DELTA_SCALE, interpret=True)
    assert np.abs(np.asarray(unfrozen) - np.asarray(out_traj)).max() > 1e-6


def test_fused_ioc_row_cap_env_override(monkeypatch):
    """DESIRE_IOC_MAX_ROWS (the on-chip perf sweep knob) must only change
    the lane-chunk grid, never the numbers: forcing multi-chunk via the env
    var reproduces the single-chunk output."""
    from desire_tpu.models.ioc import _DELTA_SCALE
    from desire_tpu.ops.ioc_fused import ioc_refine_fused
    cfg, p_ioc, p_scf, traj, dec_h, feat_map, live, fut_mask = _ioc_env()
    msg = scf.social_messages(p_scf, dec_h)
    one = ioc_refine_fused(
        p_ioc, p_scf, traj, dec_h, msg, feat_map, live, fut_mask,
        num_refine=cfg.num_refine, delta_scale=_DELTA_SCALE, interpret=True)
    monkeypatch.setenv("DESIRE_IOC_MAX_ROWS", "8")   # a_pad=8 -> kc=1, 3 chunks
    chunked = ioc_refine_fused(
        p_ioc, p_scf, traj, dec_h, msg, feat_map, live, fut_mask,
        num_refine=cfg.num_refine, delta_scale=_DELTA_SCALE, interpret=True)
    for a, b in zip(chunked, one):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("freeze", [False, True])
def test_fused_ioc_single_loop_matches_two_loop(freeze, monkeypatch):
    """DESIRE_IOC_FUSED_LOOP (one T-loop for feat build + GRU update vs the
    staged two-loop structure) is a pure scheduling change: gi[t] has no
    dependence on the GRU state, so the op sequence per element is
    identical and the outputs must match bitwise — incl. per-iteration
    collect and the social_freeze frozen-attention branch."""
    from desire_tpu.models.ioc import _DELTA_SCALE
    from desire_tpu.ops.ioc_fused import ioc_refine_fused
    cfg, p_ioc, p_scf, traj, dec_h, feat_map, live, fut_mask = _ioc_env()
    msg = scf.social_messages(p_scf, dec_h)

    def run():
        return ioc_refine_fused(
            p_ioc, p_scf, traj, dec_h, msg, feat_map, live, fut_mask,
            num_refine=cfg.num_refine, delta_scale=_DELTA_SCALE,
            interpret=True, collect_iters=True, social_freeze=freeze)

    monkeypatch.setenv("DESIRE_IOC_FUSED_LOOP", "1")
    fused = run()
    monkeypatch.setenv("DESIRE_IOC_FUSED_LOOP", "0")
    staged = run()
    for a, b in zip(fused, staged):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_ioc_refinement_moves_and_masks():
    """Deltas respect the future mask (masked step -> no movement) and the
    loop actually refines (traj changes on unmasked steps)."""
    from desire_tpu.models.ioc import _DELTA_SCALE
    from desire_tpu.ops.ioc_fused import ioc_refine_fused
    cfg, p_ioc, p_scf, traj, dec_h, feat_map, live, fut_mask = _ioc_env()
    msg = scf.social_messages(p_scf, dec_h)
    out_traj, _ = ioc_refine_fused(
        p_ioc, p_scf, traj, dec_h, msg, feat_map, live, fut_mask,
        num_refine=cfg.num_refine, delta_scale=_DELTA_SCALE, interpret=True)
    moved = np.abs(np.asarray(out_traj - traj))
    np.testing.assert_allclose(moved[:, :, :, -1], 0.0, atol=1e-7)  # masked
    assert moved[:, :, :, :-1].max() > 1e-4


def test_fused_ioc_single_live_agent_zero_social():
    """One live agent -> no neighbors -> the social block contributes
    nothing, in both the kernel and the XLA path (dead-row zeroing)."""
    from desire_tpu.models.ioc import _DELTA_SCALE, ioc_forward
    from desire_tpu.ops.ioc_fused import ioc_refine_fused
    cfg, p_ioc, p_scf, traj, dec_h, feat_map, live, fut_mask = _ioc_env(b=1)
    live = jnp.zeros_like(live).at[:, 2].set(1.0)
    ref_traj, ref_scores, _ = ioc_forward(
        p_ioc, p_scf, cfg, traj, dec_h, feat_map, live, fut_mask)
    msg = scf.social_messages(p_scf, dec_h)
    out_traj, out_scores = ioc_refine_fused(
        p_ioc, p_scf, traj, dec_h, msg, feat_map, live, fut_mask,
        num_refine=cfg.num_refine, delta_scale=_DELTA_SCALE, interpret=True)
    # compare the live agent's row (dead rows are masked downstream)
    np.testing.assert_allclose(np.asarray(out_traj[:, 2]),
                               np.asarray(ref_traj[:, 2]),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_scores[:, 2]),
                               np.asarray(ref_scores[:, 2]),
                               rtol=2e-4, atol=2e-4)


def test_fused_ioc_sharded_matches_xla(monkeypatch):
    """ioc_refine_fused_sharded under a real (data=2, k=2) CPU mesh matches
    the XLA path — the VERDICT r2 'Pallas under a mesh' gap: shard_map runs
    the kernel per-shard, no collectives (every (row, lane) is independent)."""
    from desire_tpu.models.ioc import _DELTA_SCALE, ioc_forward
    from desire_tpu.ops.ioc_fused import ioc_refine_fused_sharded
    from desire_tpu.parallel import mesh as mesh_mod
    cfg, p_ioc, p_scf, traj, dec_h, feat_map, live, fut_mask = _ioc_env(
        b=4, a=5, k=4)
    ref_traj, ref_scores, _ = ioc_forward(
        p_ioc, p_scf, cfg, traj, dec_h, feat_map, live, fut_mask)
    msg = scf.social_messages(p_scf, dec_h)
    mesh = mesh_mod.make_mesh(2, 2)
    out_traj, out_scores = ioc_refine_fused_sharded(
        mesh, p_ioc, p_scf, traj, dec_h, msg, feat_map, live, fut_mask,
        num_refine=cfg.num_refine, delta_scale=_DELTA_SCALE, interpret=True)
    np.testing.assert_allclose(np.asarray(out_traj), np.asarray(ref_traj),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_scores),
                               np.asarray(ref_scores), rtol=2e-4, atol=2e-4)


def test_fused_ioc_collect_iters_matches_per_iter_list():
    """collect_iters returns exactly ioc_forward's per_iter stack (the
    deep-supervision targets of the trainable path)."""
    from desire_tpu.models.ioc import _DELTA_SCALE, ioc_forward
    from desire_tpu.ops.ioc_fused import ioc_refine_fused
    cfg, p_ioc, p_scf, traj, dec_h, feat_map, live, fut_mask = _ioc_env()
    _, _, per_iter = ioc_forward(
        p_ioc, p_scf, cfg, traj, dec_h, feat_map, live, fut_mask)
    msg = scf.social_messages(p_scf, dec_h)
    out_traj, _, iters = ioc_refine_fused(
        p_ioc, p_scf, traj, dec_h, msg, feat_map, live, fut_mask,
        num_refine=cfg.num_refine, delta_scale=_DELTA_SCALE, interpret=True,
        collect_iters=True)
    assert iters.shape == (cfg.num_refine,) + traj.shape
    for i, ref in enumerate(per_iter):
        np.testing.assert_allclose(np.asarray(iters[i]), np.asarray(ref),
                                   rtol=2e-4, atol=2e-5)
    # last collected iteration IS the final refined trajectory
    np.testing.assert_allclose(np.asarray(iters[-1]), np.asarray(out_traj),
                               rtol=1e-6, atol=1e-7)


def test_trainable_fused_ioc_gradient_parity():
    """make_trainable_fused_ioc: value ~= XLA path, gradients == XLA path
    (the custom_vjp backward IS the XLA vjp) — VERDICT r2 item 3."""
    from desire_tpu.models.ioc import ioc_forward
    from desire_tpu.ops.ioc_fused import make_trainable_fused_ioc
    cfg, p_ioc, p_scf, traj, dec_h, feat_map, live, fut_mask = _ioc_env()
    fused = make_trainable_fused_ioc(cfg, interpret=True)
    wts = jax.random.normal(jax.random.PRNGKey(9), live.shape + (3,))

    def loss_fused(p_ioc, p_scf, traj, dec_h, feat_map):
        refined, scores, iters = fused(p_ioc, p_scf, traj, dec_h,
                                       feat_map, live, fut_mask)
        return (jnp.sum(refined ** 2) + jnp.sum(scores * wts)
                + jnp.sum(iters ** 2))

    def loss_xla(p_ioc, p_scf, traj, dec_h, feat_map):
        refined, scores, per_iter = ioc_forward(
            p_ioc, p_scf, cfg, traj, dec_h, feat_map, live, fut_mask)
        return (jnp.sum(refined ** 2) + jnp.sum(scores * wts)
                + jnp.sum(jnp.stack(per_iter) ** 2))

    args = (p_ioc, p_scf, traj, dec_h, feat_map)
    v_f, g_f = jax.value_and_grad(loss_fused, argnums=(0, 1, 2, 3, 4))(*args)
    v_x, g_x = jax.value_and_grad(loss_xla, argnums=(0, 1, 2, 3, 4))(*args)
    np.testing.assert_allclose(float(v_f), float(v_x), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(g_f),
                    jax.tree_util.tree_leaves(g_x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_trainable_fused_ioc_sharded_gradient_parity():
    """make_trainable_fused_ioc_sharded under a real (data=2, k=2) CPU mesh:
    value and EVERY gradient (params incl. the psum'd ICI all-reduces, data
    cotangents) match the single-device XLA path — VERDICT r3 item 4 (fused
    IOC training under the mesh)."""
    from desire_tpu.models.ioc import ioc_forward
    from desire_tpu.ops.ioc_fused import make_trainable_fused_ioc_sharded
    from desire_tpu.parallel import mesh as mesh_mod
    cfg, p_ioc, p_scf, traj, dec_h, feat_map, live, fut_mask = _ioc_env(
        b=4, a=5, k=4)
    mesh = mesh_mod.make_mesh(2, 2)
    fused = make_trainable_fused_ioc_sharded(cfg, mesh, interpret=True)
    wts = jax.random.normal(jax.random.PRNGKey(9), live.shape + (4,))

    def loss_fused(p_ioc, p_scf, traj, dec_h, feat_map):
        refined, scores, iters = fused(p_ioc, p_scf, traj, dec_h,
                                       feat_map, live, fut_mask)
        return (jnp.sum(refined ** 2) + jnp.sum(scores * wts)
                + jnp.sum(iters ** 2))

    def loss_xla(p_ioc, p_scf, traj, dec_h, feat_map):
        refined, scores, per_iter = ioc_forward(
            p_ioc, p_scf, cfg, traj, dec_h, feat_map, live, fut_mask)
        return (jnp.sum(refined ** 2) + jnp.sum(scores * wts)
                + jnp.sum(jnp.stack(per_iter) ** 2))

    args = (p_ioc, p_scf, traj, dec_h, feat_map)
    v_f, g_f = jax.jit(jax.value_and_grad(
        loss_fused, argnums=(0, 1, 2, 3, 4)))(*args)
    v_x, g_x = jax.value_and_grad(loss_xla, argnums=(0, 1, 2, 3, 4))(*args)
    np.testing.assert_allclose(float(v_f), float(v_x), rtol=1e-4)
    for path, a in jax.tree_util.tree_leaves_with_path(g_f):
        b = {jax.tree_util.keystr(p): x
             for p, x in jax.tree_util.tree_leaves_with_path(g_x)}[
            jax.tree_util.keystr(path)]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4,
                                   err_msg=jax.tree_util.keystr(path))


# ---------------------------------------------------------------------------
# Fused SGM CVAE sampler kernel (ops/sgm_fused.py, north-star kernel (a))
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("input_norm", [False, True])
def test_fused_sgm_sampler_matches_xla_forward(input_norm):
    """encode -> prior draw -> mask MLP -> K-lane decode in one kernel must
    reproduce sgm_forward's inference outputs (same PRNG draws) — including
    under input_norm (scale-free features + log-speed channel, computed
    OUTSIDE the kernel so both paths must wire them identically)."""
    from desire_tpu.config import DesireConfig
    from desire_tpu.models import layers as L
    from desire_tpu.models import sgm
    from desire_tpu.ops.sgm_fused import sgm_sample_decode_fused

    cfg = DesireConfig(obs_len=5, pred_len=6, num_samples=4, d_dim=16,
                      latent_size=8, embedding_size=8, channel_multiplier=10,
                      compute_dtype="float32", rnn_size=128,  # MLP VAE side 16
                      input_norm=input_norm)
    key = jax.random.PRNGKey(0)
    p = sgm.init_sgm(key, cfg)
    n = 7                                   # odd: exercises row padding
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    obs = jax.random.uniform(ks[0], (n, cfg.obs_len, 2)) * 0.5 + 0.2
    m_o = jnp.ones((n, cfg.obs_len)).at[0, 0].set(0.0)  # one masked step

    k0 = jax.random.PRNGKey(5)
    ref = sgm.sgm_forward(p, cfg, obs, m_o, key=k0, train=False)

    # replicate the fused branch's precompute + PRNG stream
    origin = obs[:, -1]
    rel = (obs - origin[:, None]) * m_o[..., None]
    enc_rel, extra = rel, None
    if input_norm:
        s_obs = sgm.observed_speed(rel, m_o)
        enc_rel = rel * (1.0 / (s_obs + cfg.vel_floor))[:, None]
        extra = jnp.log1p(s_obs / cfg.vel_floor)
    feats = jax.nn.relu(L.dense(p["embed_x"],
                                sgm._traj_feats(enc_rel, m_o, extra=extra)))
    rho = sgm.temporal_features(p, enc_rel, m_o)
    rho_seed = jax.nn.relu(L.dense(p["rho_proj"], rho))
    key2, _, _ = jax.random.split(k0, 3)
    eps = jax.random.normal(key2, (n, cfg.num_samples, cfg.latent_size))

    dec_h, hx = sgm_sample_decode_fused(
        p, feats, m_o, rho_seed, eps, cfg.pred_len, block_rows=8,
        interpret=True)
    np.testing.assert_allclose(np.asarray(dec_h), np.asarray(ref["dec_h"]),
                               rtol=2e-4, atol=2e-5)
    raw = L.dense(p["head"], dec_h.astype(jnp.float32))
    # full raw5 parity through compose_positions
    cv = sgm.mean_observed_velocity(rel, m_o)
    s = sgm.observed_speed(rel, m_o)
    gain = jnp.exp(p["vel_gain_log"]); floor = jnp.exp(p["vel_floor_log"])
    raw5 = sgm.compose_positions(raw, origin[:, None, :], cfg.vel_scale,
                                 cv_vel=cv[:, None, :],
                                 vel_bound=(gain * s + floor)[:, None])
    np.testing.assert_allclose(np.asarray(raw5), np.asarray(ref["raw5"]),
                               rtol=2e-4, atol=2e-5)


def test_fused_sgm_sampler_lane_chunked_matches_single_chunk():
    """The K-chunk grid axis (VMEM bound for large K, e.g. the K=50 eval that
    OOMed the 96 MB scoped stack) must be bit-compatible with one chunk:
    encoder state persists in scratch across chunks of the same agent block."""
    from desire_tpu.config import DesireConfig
    from desire_tpu.models import layers as L
    from desire_tpu.models import sgm
    from desire_tpu.ops.sgm_fused import sgm_sample_decode_fused

    cfg = DesireConfig(obs_len=5, pred_len=6, num_samples=6, d_dim=16,
                      latent_size=8, embedding_size=8, channel_multiplier=10,
                      compute_dtype="float32", rnn_size=128,
                      input_norm=False)   # feats built without the extra
    #                                       log-speed channel below; the
    #                                       chunk-parity property is
    #                                       input-independent
    p = sgm.init_sgm(jax.random.PRNGKey(0), cfg)
    n = 10                                  # 2 agent blocks at block_rows=8
    obs = jax.random.uniform(jax.random.PRNGKey(1), (n, cfg.obs_len, 2))
    m_o = jnp.ones((n, cfg.obs_len)).at[3, :2].set(0.0)
    origin = obs[:, -1]
    rel = (obs - origin[:, None]) * m_o[..., None]
    feats = jax.nn.relu(L.dense(p["embed_x"], sgm._traj_feats(rel, m_o)))
    rho_seed = jax.nn.relu(L.dense(
        p["rho_proj"], sgm.temporal_features(p, rel, m_o)))
    eps = jax.random.normal(jax.random.PRNGKey(2),
                            (n, cfg.num_samples, cfg.latent_size))

    one = sgm_sample_decode_fused(p, feats, m_o, rho_seed, eps, cfg.pred_len,
                                  block_rows=8, k_chunk=6, interpret=True)
    chunked = sgm_sample_decode_fused(p, feats, m_o, rho_seed, eps,
                                      cfg.pred_len, block_rows=8, k_chunk=2,
                                      interpret=True)
    for a, b in zip(chunked, one):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_fused_sgm_sampler_sharded_matches_unsharded():
    """sgm_sample_decode_fused_sharded (VERDICT r4 item 3): the shard_map
    wrapper over a (data=4, k=2) mesh — rows over 'data', lanes over 'k',
    no collectives — must reproduce the unsharded kernel exactly (every
    (row, lane) is independent; each k-shard recomputes its rows' encoder
    locally)."""
    from desire_tpu.config import DesireConfig
    from desire_tpu.models import layers as L
    from desire_tpu.models import sgm
    from desire_tpu.ops.sgm_fused import (sgm_sample_decode_fused,
                                          sgm_sample_decode_fused_sharded)
    from desire_tpu.parallel import mesh as mesh_mod

    cfg = DesireConfig(obs_len=5, pred_len=6, num_samples=4, d_dim=16,
                       latent_size=8, embedding_size=8,
                       channel_multiplier=10, compute_dtype="float32",
                       rnn_size=128, input_norm=False)
    p = sgm.init_sgm(jax.random.PRNGKey(0), cfg)
    n = 16                                  # 4 rows per data shard
    obs = jax.random.uniform(jax.random.PRNGKey(1), (n, cfg.obs_len, 2))
    m_o = jnp.ones((n, cfg.obs_len)).at[3, :2].set(0.0)
    origin = obs[:, -1]
    rel = (obs - origin[:, None]) * m_o[..., None]
    feats = jax.nn.relu(L.dense(p["embed_x"], sgm._traj_feats(rel, m_o)))
    rho_seed = jax.nn.relu(L.dense(
        p["rho_proj"], sgm.temporal_features(p, rel, m_o)))
    eps = jax.random.normal(jax.random.PRNGKey(2),
                            (n, cfg.num_samples, cfg.latent_size))

    ref = sgm_sample_decode_fused(p, feats, m_o, rho_seed, eps,
                                  cfg.pred_len, interpret=True)
    mesh = mesh_mod.make_mesh(4, 2)
    got = sgm_sample_decode_fused_sharded(mesh, p, feats, m_o, rho_seed,
                                          eps, cfg.pred_len, interpret=True)
    for a, b in zip(got, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("tent_mm,freeze,kcsoc",
                         [("0", False, "0"), ("1", False, "0"),
                          ("0", True, "0"), ("1", True, "0"),
                          ("0", False, "1")])
def test_pallas_backward_ioc_gradient_parity(tent_mm, freeze, kcsoc,
                                             monkeypatch):
    """The full Pallas backward (ops/ioc_bwd.py) must reproduce jax.grad of
    the XLA ioc_forward for every input and parameter — with both the wide
    and the factorized (DESIRE_TENT_MM=1) scene-tent builds, with the
    frozen social attention (social_freeze: one deferred attention adjoint;
    positions hear only the refine passes, ltau/msg also the score pass),
    and with the lane-block-batched social (DESIRE_SOCIAL_KC: (kc, A, A)
    recompute + adjoint in both the forward and backward kernels)."""
    from desire_tpu.models.ioc import ioc_forward
    from desire_tpu.ops.ioc_fused import make_trainable_fused_ioc
    monkeypatch.setenv("DESIRE_TENT_MM", tent_mm)
    monkeypatch.setenv("DESIRE_SOCIAL_KC", kcsoc)
    # the batched-social case needs kc >= 8 to clear the kernel's size
    # guard; the baseline cases keep the small fast shapes
    cfg, p_ioc, p_scf, traj, dec_h, feat_map, live, fut_mask = _ioc_env(
        k=10 if kcsoc == "1" else 3)
    if freeze:
        cfg = cfg.replace(social_freeze=True)
    fused = make_trainable_fused_ioc(cfg, interpret=True, backward="pallas")
    wts = jax.random.normal(jax.random.PRNGKey(9),
                            live.shape + (cfg.num_samples,))

    def loss_fused(p_ioc, p_scf, traj, dec_h, feat_map):
        refined, scores, iters = fused(p_ioc, p_scf, traj, dec_h,
                                       feat_map, live, fut_mask)
        return (jnp.sum(refined ** 2) + jnp.sum(scores * wts)
                + jnp.sum(iters ** 2) + jnp.sum(jnp.sin(refined)))

    def loss_xla(p_ioc, p_scf, traj, dec_h, feat_map):
        refined, scores, per_iter = ioc_forward(
            p_ioc, p_scf, cfg, traj, dec_h, feat_map, live, fut_mask)
        return (jnp.sum(refined ** 2) + jnp.sum(scores * wts)
                + jnp.sum(jnp.stack(per_iter) ** 2)
                + jnp.sum(jnp.sin(refined)))

    args = (p_ioc, p_scf, traj, dec_h, feat_map)
    v_f, g_f = jax.value_and_grad(loss_fused, argnums=(0, 1, 2, 3, 4))(*args)
    v_x, g_x = jax.value_and_grad(loss_xla, argnums=(0, 1, 2, 3, 4))(*args)
    np.testing.assert_allclose(float(v_f), float(v_x), rtol=1e-4)
    flat_f, tree_f = jax.tree_util.tree_flatten_with_path(g_f)
    flat_x = jax.tree_util.tree_leaves(g_x)
    assert len(flat_f) == len(flat_x)
    for (path, af), ax in zip(flat_f, flat_x):
        np.testing.assert_allclose(
            np.asarray(af), np.asarray(ax), rtol=2e-3, atol=2e-4,
            err_msg=jax.tree_util.keystr(path))


@pytest.mark.parametrize("freeze", [False, True])
def test_pallas_backward_ioc_parity_chunked(freeze):
    """Same parity with a multi-chunk lane layout (kc < K) and 4 refinement
    iterations — the flagship configuration's control flow — with and
    without the frozen social attention."""
    from desire_tpu.models.ioc import ioc_forward
    from desire_tpu.ops.ioc_fused import make_trainable_fused_ioc
    cfg, p_ioc, p_scf, traj, dec_h, feat_map, live, fut_mask = _ioc_env(
        seed=1, b=1, a=33, k=10, t=4)
    cfg = cfg.replace(num_refine=4, social_freeze=freeze)
    fused = make_trainable_fused_ioc(cfg, interpret=True, backward="pallas")

    def loss_fused(p_ioc, traj, dec_h):
        refined, scores, iters = fused(p_ioc, p_scf, traj, dec_h,
                                       feat_map, live, fut_mask)
        return jnp.sum(refined ** 2) + jnp.sum(scores) + jnp.sum(iters ** 2)

    def loss_xla(p_ioc, traj, dec_h):
        refined, scores, per_iter = ioc_forward(
            p_ioc, p_scf, cfg, traj, dec_h, feat_map, live, fut_mask)
        return (jnp.sum(refined ** 2) + jnp.sum(scores)
                + jnp.sum(jnp.stack(per_iter) ** 2))

    g_f = jax.grad(loss_fused, argnums=(0, 1, 2))(p_ioc, traj, dec_h)
    g_x = jax.grad(loss_xla, argnums=(0, 1, 2))(p_ioc, traj, dec_h)
    for af, ax in zip(jax.tree_util.tree_leaves(g_f),
                      jax.tree_util.tree_leaves(g_x)):
        np.testing.assert_allclose(np.asarray(af), np.asarray(ax),
                                   rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize("freeze", [False, True])
def test_pallas_backward_single_loop_matches_staged(freeze, monkeypatch):
    """DESIRE_IOC_FUSED_LOOP in the BACKWARD kernel (feat+GRU+head-seed
    recompute in one T-loop vs three staged loops) is pure scheduling:
    every store keeps its ascending-t order, so all 7 cotangent groups
    must match bitwise."""
    from desire_tpu.models import scf as scf_mod
    from desire_tpu.models.ioc import _DELTA_SCALE
    from desire_tpu.ops.ioc_bwd import ioc_refine_bwd
    from desire_tpu.ops.ioc_fused import ioc_refine_fused
    cfg, p_ioc, p_scf, traj, dec_h, feat_map, live, fut_mask = _ioc_env()
    msg = scf_mod.social_messages(p_scf, dec_h)
    refined, scores, iters = ioc_refine_fused(
        p_ioc, p_scf, traj, dec_h, msg, feat_map, live, fut_mask,
        num_refine=cfg.num_refine, delta_scale=_DELTA_SCALE,
        interpret=True, collect_iters=True, social_freeze=freeze)
    d_refined = jnp.ones_like(refined) * 0.3
    d_scores = jnp.ones_like(scores)
    d_iters = jnp.ones_like(iters) * 0.1

    def run():
        return ioc_refine_bwd(
            p_ioc, p_scf, traj, dec_h, msg, feat_map, live, fut_mask,
            iters, d_refined, d_scores, d_iters,
            num_refine=cfg.num_refine, delta_scale=_DELTA_SCALE,
            interpret=True, social_freeze=freeze)

    monkeypatch.setenv("DESIRE_IOC_FUSED_LOOP", "1")
    fused = run()
    monkeypatch.setenv("DESIRE_IOC_FUSED_LOOP", "0")
    staged = run()
    for af, ax in zip(jax.tree_util.tree_leaves(fused),
                      jax.tree_util.tree_leaves(staged)):
        np.testing.assert_array_equal(np.asarray(af), np.asarray(ax))


@pytest.mark.parametrize("freeze", [False, True])
def test_fused_ioc_social_band_matches_full(freeze, monkeypatch):
    """DESIRE_SOCIAL_BAND (banded social attention: (rows, A) distance/
    softmax + exact one-hot re-expansion) must match the full (rows, rows)
    form to ~1 ULP — the band sees the same non-excluded logits and
    exp(-1e9) underflows to exact 0.0; the only difference is the softmax
    denominator's reduction-tree pairing (400 vs 40 summands, the excluded
    ones exactly 0.0)."""
    from desire_tpu.models.ioc import _DELTA_SCALE
    from desire_tpu.ops.ioc_fused import ioc_refine_fused
    cfg, p_ioc, p_scf, traj, dec_h, feat_map, live, fut_mask = _ioc_env(
        seed=2, b=1, a=33, k=10, t=4)
    msg = scf.social_messages(p_scf, dec_h)

    def run():
        return ioc_refine_fused(
            p_ioc, p_scf, traj, dec_h, msg, feat_map, live, fut_mask,
            num_refine=cfg.num_refine, delta_scale=_DELTA_SCALE,
            interpret=True, social_freeze=freeze)

    monkeypatch.setenv("DESIRE_SOCIAL_BAND", "0")
    full_t, full_s = run()
    monkeypatch.setenv("DESIRE_SOCIAL_BAND", "1")
    band_t, band_s = run()
    np.testing.assert_allclose(np.asarray(band_t), np.asarray(full_t),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(band_s), np.asarray(full_s),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("freeze", [False, True])
def test_pallas_backward_social_band_gradient_parity(freeze, monkeypatch):
    """The banded softmax adjoint (DESIRE_SOCIAL_BAND=1 in ops/ioc_bwd.py:
    (rows, A) adjoint algebra, block-sum selects instead of the (rows, rows)
    transpose) must reproduce jax.grad of the XLA ioc_forward, with and
    without the frozen social attention."""
    from desire_tpu.models.ioc import ioc_forward
    from desire_tpu.ops.ioc_fused import make_trainable_fused_ioc
    monkeypatch.setenv("DESIRE_SOCIAL_BAND", "1")
    cfg, p_ioc, p_scf, traj, dec_h, feat_map, live, fut_mask = _ioc_env()
    if freeze:
        cfg = cfg.replace(social_freeze=True)
    fused = make_trainable_fused_ioc(cfg, interpret=True, backward="pallas")
    wts = jax.random.normal(jax.random.PRNGKey(9), live.shape + (3,))

    def loss_fused(p_ioc, p_scf, traj, dec_h, feat_map):
        refined, scores, iters = fused(p_ioc, p_scf, traj, dec_h,
                                       feat_map, live, fut_mask)
        return (jnp.sum(refined ** 2) + jnp.sum(scores * wts)
                + jnp.sum(iters ** 2) + jnp.sum(jnp.sin(refined)))

    def loss_xla(p_ioc, p_scf, traj, dec_h, feat_map):
        refined, scores, per_iter = ioc_forward(
            p_ioc, p_scf, cfg, traj, dec_h, feat_map, live, fut_mask)
        return (jnp.sum(refined ** 2) + jnp.sum(scores * wts)
                + jnp.sum(jnp.stack(per_iter) ** 2)
                + jnp.sum(jnp.sin(refined)))

    args = (p_ioc, p_scf, traj, dec_h, feat_map)
    g_f = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(*args)
    g_x = jax.grad(loss_xla, argnums=(0, 1, 2, 3, 4))(*args)
    flat_f, _ = jax.tree_util.tree_flatten_with_path(g_f)
    flat_x = jax.tree_util.tree_leaves(g_x)
    assert len(flat_f) == len(flat_x)
    for (path, af), ax in zip(flat_f, flat_x):
        np.testing.assert_allclose(
            np.asarray(af), np.asarray(ax), rtol=2e-3, atol=2e-4,
            err_msg=jax.tree_util.keystr(path))


@pytest.mark.parametrize("freeze,band", [(False, "0"), (True, "0"),
                                         (False, "1"), (True, "1")])
def test_fused_ioc_msg_inkernel_matches_precomputed(freeze, band,
                                                    monkeypatch):
    """msg=None (in-kernel social-message projection — the kernel computes
    msg = dec_h @ W + b itself during pass 0) must reproduce the
    precomputed-msg path bitwise: the kernel replicates the XLA dense's
    numerics (f32 MXU accumulate rounded to the compute dtype + cd bias
    add). Covers both attention forms and the frozen variant."""
    from desire_tpu.models.ioc import _DELTA_SCALE
    from desire_tpu.ops.ioc_fused import ioc_refine_fused
    monkeypatch.setenv("DESIRE_SOCIAL_BAND", band)
    cfg, p_ioc, p_scf, traj, dec_h, feat_map, live, fut_mask = _ioc_env(
        seed=3, b=1, a=33, k=10, t=4)
    msg = scf.social_messages(p_scf, dec_h)

    def run(m):
        return ioc_refine_fused(
            p_ioc, p_scf, traj, dec_h, m, feat_map, live, fut_mask,
            num_refine=cfg.num_refine, delta_scale=_DELTA_SCALE,
            interpret=True, social_freeze=freeze)

    ref_t, ref_s = run(msg)
    ink_t, ink_s = run(None)
    np.testing.assert_array_equal(np.asarray(ink_t), np.asarray(ref_t))
    np.testing.assert_array_equal(np.asarray(ink_s), np.asarray(ref_s))


@pytest.mark.parametrize("freeze,band",
                         [(False, "0"), (True, "1"), (True, "0")])
def test_pallas_backward_batch_wgrad_gradient_parity(freeze, band,
                                                     monkeypatch):
    """DESIRE_IOC_BATCH_WGRAD (per-pass batched weight-gradient
    contractions over the flattened (T*rows) axis, staged in the dead gate
    scratches) must reproduce jax.grad of the XLA ioc_forward — same
    products, different f32 accumulation order. Multi-chunk layout +
    4 refinement iterations (the flagship control flow), crossed with the
    banded attention and the frozen variant."""
    from desire_tpu.models.ioc import ioc_forward
    from desire_tpu.ops.ioc_fused import make_trainable_fused_ioc
    monkeypatch.setenv("DESIRE_IOC_BATCH_WGRAD", "1")
    monkeypatch.setenv("DESIRE_SOCIAL_BAND", band)
    cfg, p_ioc, p_scf, traj, dec_h, feat_map, live, fut_mask = _ioc_env(
        seed=1, b=1, a=33, k=10, t=4)
    cfg = cfg.replace(num_refine=4, social_freeze=freeze)
    fused = make_trainable_fused_ioc(cfg, interpret=True, backward="pallas")

    def loss_fused(p_ioc, p_scf, traj, dec_h, feat_map):
        refined, scores, iters = fused(p_ioc, p_scf, traj, dec_h,
                                       feat_map, live, fut_mask)
        return jnp.sum(refined ** 2) + jnp.sum(scores) + jnp.sum(iters ** 2)

    def loss_xla(p_ioc, p_scf, traj, dec_h, feat_map):
        refined, scores, per_iter = ioc_forward(
            p_ioc, p_scf, cfg, traj, dec_h, feat_map, live, fut_mask)
        return (jnp.sum(refined ** 2) + jnp.sum(scores)
                + jnp.sum(jnp.stack(per_iter) ** 2))

    args = (p_ioc, p_scf, traj, dec_h, feat_map)
    g_f = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(*args)
    g_x = jax.grad(loss_xla, argnums=(0, 1, 2, 3, 4))(*args)
    flat_f, _ = jax.tree_util.tree_flatten_with_path(g_f)
    flat_x = jax.tree_util.tree_leaves(g_x)
    for (path, af), ax in zip(flat_f, flat_x):
        np.testing.assert_allclose(
            np.asarray(af), np.asarray(ax), rtol=2e-3, atol=2e-4,
            err_msg=jax.tree_util.keystr(path))


@pytest.mark.parametrize("freeze", [False, True])
@pytest.mark.parametrize("tb", [2, 3])
def test_fused_ioc_social_tb_matches_per_step(tb, freeze, monkeypatch):
    """DESIRE_SOCIAL_TB (T-blocked social attention: the d2/softmax chain
    for TB steps on one (TB*rows, rows) tile, staged into the pooled-social
    scratch) must match the per-step path BITWISE: the block form
    broadcasts positions with exact one-hot-copy matmuls and composes
    sq/gram/d2/softmax/nb-zeroing with the identical ops in the identical
    order."""
    from desire_tpu.models.ioc import _DELTA_SCALE
    from desire_tpu.ops.ioc_fused import ioc_refine_fused
    cfg, p_ioc, p_scf, traj, dec_h, feat_map, live, fut_mask = _ioc_env()
    msg = scf.social_messages(p_scf, dec_h)

    def run():
        return ioc_refine_fused(
            p_ioc, p_scf, traj, dec_h, msg, feat_map, live, fut_mask,
            num_refine=cfg.num_refine, delta_scale=_DELTA_SCALE,
            interpret=True, social_freeze=freeze)

    monkeypatch.setenv("DESIRE_SOCIAL_TB", "1")
    base_t, base_s = run()
    monkeypatch.setenv("DESIRE_SOCIAL_TB", str(tb))
    blk_t, blk_s = run()
    np.testing.assert_array_equal(np.asarray(blk_t), np.asarray(base_t))
    np.testing.assert_array_equal(np.asarray(blk_s), np.asarray(base_s))


def test_pick_chunk_row_defaults(monkeypatch):
    """Round-5 row-cap defaults: inference 1280 (measured 53.1 vs 59.2 ms),
    freeze inference 640 (probed 49.6), training/backward 320 (their sweep
    pending); DESIRE_IOC_MAX_ROWS overrides everything."""
    from desire_tpu.ops.ioc_fused import _pick_chunk
    monkeypatch.delenv("DESIRE_IOC_MAX_ROWS", raising=False)
    a = 64
    monkeypatch.setenv("DESIRE_SOCIAL_KC", "1")   # round-5 default
    assert _pick_chunk(20, a) * a == 1280                  # whole-K chunk
    assert _pick_chunk(20, a, conservative=True) * a == 320
    assert _pick_chunk(20, a, social_freeze=True) * a == 1280
    assert _pick_chunk(50, a) * a == 1600                  # kc=25 (batched)
    monkeypatch.setenv("DESIRE_SOCIAL_KC", "0")   # dense fallbacks
    assert _pick_chunk(20, a, social_freeze=True) * a == 640
    assert _pick_chunk(50, a) * a == 640                   # kc|50 at 1280
    monkeypatch.setenv("DESIRE_IOC_MAX_ROWS", "320")
    assert _pick_chunk(20, a) * a == 320


@pytest.mark.parametrize("freeze", [False, True])
def test_fused_ioc_social_kc_matches_dense(freeze, monkeypatch):
    """DESIRE_SOCIAL_KC (lane-block-BATCHED social attention: (kc, A, A)
    batched distance/softmax + one batched pooling dot instead of the
    dense (rows, rows) form whose off-diagonal lane blocks are all-zero
    weights) must match the dense path: cross-block exp(-1e9) underflows
    to exactly 0 there, so the two forms sum identical terms."""
    from desire_tpu.models.ioc import _DELTA_SCALE
    from desire_tpu.ops.ioc_fused import ioc_refine_fused
    # k=10 agents=5: kc=10 clears the kc >= 8 guard (the batched form is
    # gated off for small chunks where it measured slower)
    cfg, p_ioc, p_scf, traj, dec_h, feat_map, live, fut_mask = _ioc_env(
        k=10)
    msg = scf.social_messages(p_scf, dec_h)

    def run():
        return ioc_refine_fused(
            p_ioc, p_scf, traj, dec_h, msg, feat_map, live, fut_mask,
            num_refine=cfg.num_refine, delta_scale=_DELTA_SCALE,
            interpret=True, social_freeze=freeze)

    monkeypatch.setenv("DESIRE_SOCIAL_KC", "0")
    base_t, base_s = run()
    monkeypatch.setenv("DESIRE_SOCIAL_KC", "1")
    kc_t, kc_s = run()
    np.testing.assert_allclose(np.asarray(kc_t), np.asarray(base_t),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(kc_s), np.asarray(base_s),
                               rtol=1e-6, atol=1e-6)


def test_fused_ioc_social_tb_msg_inkernel_and_clamp(monkeypatch):
    """T-block composes with the in-kernel message projection (msg=None):
    the pass-0 pre-loop stages dec/msg before soc_block reads them. A
    requested TB that doesn't divide T clamps to the largest divisor
    (here 12 -> 6 at t=6) instead of miscomputing."""
    from desire_tpu.models.ioc import _DELTA_SCALE
    from desire_tpu.ops.ioc_fused import ioc_refine_fused
    cfg, p_ioc, p_scf, traj, dec_h, feat_map, live, fut_mask = _ioc_env()

    def run():
        return ioc_refine_fused(
            p_ioc, p_scf, traj, dec_h, None, feat_map, live, fut_mask,
            num_refine=cfg.num_refine, delta_scale=_DELTA_SCALE,
            interpret=True)

    monkeypatch.setenv("DESIRE_SOCIAL_TB", "1")
    base_t, base_s = run()
    for req in ("3", "12"):
        monkeypatch.setenv("DESIRE_SOCIAL_TB", req)
        blk_t, blk_s = run()
        np.testing.assert_array_equal(np.asarray(blk_t), np.asarray(base_t))
        np.testing.assert_array_equal(np.asarray(blk_s), np.asarray(base_s))
