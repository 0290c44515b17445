"""Pallas TPU kernel: the IOC rank-and-refine BACKWARD pass.

Completes the trainable fused IOC (ops/ioc_fused.py): the forward kernel
saves only the per-iteration trajectory planes (tiny), and this kernel
recomputes everything else (gates, GRU hiddens, attention weights, scene
pools) in VMEM while running reverse-mode accumulation — the training step
stops paying the unfused XLA program's ~9 GB/iteration HBM traffic in BOTH
directions. Measured motivation (v5e, B=64 A=60 K=20): the XLA train step
is 355 ms, and the hybrid custom_vjp (fused forward + full XLA recompute
backward) is *slower* (409 ms) because its backward replays the whole
unfused forward program.

Per (batch row, lane chunk) grid program, reverse over passes — ONE
fori_loop instantiation (static unrolling of the 5 passes doubled compile
time past Mosaic's cliff on the forward kernel):

    g <- d_refined                               # cotangent planes
    for p = R, R-1, ..., 0:
        positions <- levels[p]                   # levels = [traj_in, iters]
        recompute pass p forward (gates per GATE block, hs, attention w,
            scene/social pools) into VMEM scratch
        p <  R: g += d_iters[p]; seed dh from the delta heads (tanh x gate)
        p == R: seed dh from the score head (d_scores)
        reverse-time GRU accumulation (T steps): d_gi -> d_dec, d_msg
            (attention adjoint), d_feat_map (tent adjoint), weight grads;
            position grads -> g only for p < R (the final re-score runs on
            stop_gradient(traj), exactly models/ioc.ioc_forward)
    d_traj_in = g

Mosaic constraints honored: weights arrive PRE-SPLIT per gate (r/z/n), so
the kernel never touches the 3d gate axis at unaligned lane offsets;
transposed contractions use dot_general dimension numbers (no materialized
transposes); sublane concats only at multiples of 8 — smaller accumulators
(velocity/head/bias grads) use static-offset row stores instead. Weight and
feat-map gradients are per-program partial sums, reduced in XLA by the
wrapper. live/fut_mask are data (never parameter-dependent): their
cotangents are zeros.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from desire_tpu.ops.ioc_fused import (_fused_loop_default, _pick_chunk,
                                      _precision_for, _social_band_default,
                                      _social_kc_default, _tent_mm_default)


def _batch_wgrad_default():
    """Batch the weight-gradient contractions per pass instead of per step
    (DESIRE_IOC_BATCH_WGRAD=1): the reverse T-loop stages the gate/head
    cotangents in scratch (reusing the gate buffers, which are dead once
    the step's gates are recomputed) and each weight group's T matmul-
    accumulate rounds collapse into ONE (T*rows, ·) contraction per pass.
    At flagship shapes that deletes ~26 of the ~45 serial ops per reverse
    step — the backward kernel is op-issue-latency-bound, like the forward
    (RESULTS.md r4 row-cap sweep). Same products, f32-accumulated in a
    different order (gradient-parity tested).

    Measured (r4 on-chip A/B, v5e, B=64 A=60 K=20): train 239.2 vs
    242.8 ms/step. DEFAULT flipped back OFF in round 5: the 100-epoch
    controlled pair (save/r4_flagship2 WGRAD=1 vs save/r4_flagship3
    WGRAD=0, identical recipe/seed otherwise) shows the reordered f32
    accumulation costs ~1.5 px held-out minADE@20 (15.69 vs 14.12 best
    epoch; final 16.77 vs 14.55) — a numerics regression the 3.6 ms
    train-step win does not justify."""
    import os
    return os.environ.get("DESIRE_IOC_BATCH_WGRAD", "0") == "1"


def _mmf(a, b, cd, precision):
    return jnp.dot(a.astype(cd), b.astype(cd),
                   preferred_element_type=jnp.float32, precision=precision)


def _contract_last(a, b, cd, precision):
    """einsum('rk,dk->rd'): contraction over the LAST dims of both."""
    return jax.lax.dot_general(
        a.astype(cd), b.astype(cd), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)


def _contract_first(a, b, cd, precision):
    """einsum('rp,rq->pq'): contraction over the FIRST dims of both."""
    return jax.lax.dot_general(
        a.astype(cd), b.astype(cd), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)


def _kernel(lx_ref, ly_ref, dec_ref, msg_ref, fmap_ref, live_ref, fmask_ref,
            wvr_ref, wvz_ref, wvn_ref, wsr_ref, wsz_ref, wsn_ref,
            wor_ref, woz_ref, won_ref, wdr_ref, wdz_ref, wdn_ref,
            whr_ref, whz_ref, whn_ref,
            bir_ref, biz_ref, bin_ref, bhr_ref, bhz_ref, bhn_ref,
            hw_ref, hb_ref, ltau_ref,
            grx_ref, gry_ref, gsc_ref, gix_ref, giy_ref,
            dtx_ref, dty_ref, ddec_ref, dmsg_ref, dfmap_ref,
            dwv_ref, dws_ref, dwo_ref, dwd_ref, dwh_ref,
            dbi_ref, dbh_ref, dhw_ref, dhb_ref, dltau_ref,
            gir_s, giz_s, gin_s, hs_s, w_s, scene_s, soc_s, x_s, y_s,
            gx_s, gy_s, dh_s, h_s, dhseed_s, gdec_s, dsoc_r_s, dsoc_c_s,
            xb_s, yb_s, d2b_s, douts_scr,
            *, num_refine, delta_scale, grid_g, cd, a_dim, kc,
            tent_mm=False, social_freeze=False, fused_loop=True, band=False,
            batch_wgrad=False, kcb=False):
    t_len = fmask_ref.shape[1]
    rows = kc * a_dim
    d = whr_ref.shape[0]
    c_dim = wsr_ref.shape[0]
    precision = _precision_for(cd)
    f32 = jnp.float32

    fmap = fmap_ref[0]                                    # (G*G, C)
    live = live_ref[0].astype(f32)                        # (1, rows)
    ltau = ltau_ref[0, 0].astype(f32)
    tau = jnp.exp(ltau) + 1e-4

    g2 = grid_g * grid_g
    if tent_mm:
        # Factorized tent build (see ops/ioc_fused scene_step): narrow
        # (rows, G) 1-D tents + constant one-hot expansion matmuls replace
        # the wide (rows, G^2) elementwise builds in BOTH the recompute
        # and the tent-adjoint below. Exact copies at f32; under bf16 the
        # quantization point moves from after to before the x*y product
        # (second order) — same trade as the forward kernel.
        ncol = jax.lax.broadcasted_iota(
            jnp.int32, (rows, grid_g), 1).astype(f32)
        eg = jax.lax.broadcasted_iota(jnp.int32, (grid_g, g2), 1)
        ei = jax.lax.broadcasted_iota(jnp.int32, (grid_g, g2), 0)
        exp_x = ((eg - (eg // grid_g) * grid_g) == ei).astype(cd)
        exp_y = ((eg // grid_g) == ei).astype(cd)
    else:
        col = jax.lax.broadcasted_iota(jnp.int32, (rows, g2), 1)
        col_y = (col // grid_g).astype(f32)
        col_x = (col - (col // grid_g) * grid_g).astype(f32)

    r_id = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 0)
    c_id = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 1)
    if band:
        # banded-attention constants (ioc_fused._social_band_default):
        # softmax + its adjoint run on (rows, A); (rows, rows) appears
        # only inside MXU matmuls (pool, d_w, and the block-sum selects)
        bsel = ((r_id // a_dim) == (c_id // a_dim)).astype(f32)
        rb = jax.lax.broadcasted_iota(jnp.int32, (rows, a_dim), 0)
        jb = jax.lax.broadcasted_iota(jnp.int32, (rows, a_dim), 1)
        selfb = (rb - (rb // a_dim) * a_dim) == jb        # (rows, A) bool
        gt = selfb.astype(f32)
        ja = jax.lax.broadcasted_iota(jnp.int32, (a_dim, rows), 0)
        ca = jax.lax.broadcasted_iota(jnp.int32, (a_dim, rows), 1)
        gexp = ((ca - (ca // a_dim) * a_dim) == ja).astype(cd)  # (A, rows)

        def _sel(m):
            """Block-sum select: out[r, j] = sum over rows r' of blk(r) of
            m[r', j] (exact copies when m has one nonzero per block-col)."""
            return jnp.dot(bsel, m, preferred_element_type=f32,
                           precision=jax.lax.Precision.HIGHEST)

        liveband = _sel(jnp.swapaxes(live, 0, 1) * gt)    # (rows, A)
        excl = selfb | (liveband <= 0)                    # band-shaped
        nb_ok = (jnp.sum(jnp.where(excl, 0.0, 1.0), axis=-1,
                         keepdims=True) > 0).astype(f32)

        def band_pick(m):
            """(rows, A) -> (rows, 1): row r picks its own column r%A."""
            return jnp.sum(m * gt, axis=-1, keepdims=True)
    elif kcb:
        # lane-block-batched constants (ioc_fused._social_kc_default): the
        # recompute AND the softmax/position adjoints run on (kc, A, A)
        live_a = jnp.swapaxes(
            jnp.swapaxes(live, 0, 1).reshape(kc, a_dim, 1), 1, 2)
        ia3 = jax.lax.broadcasted_iota(jnp.int32, (kc, a_dim, a_dim), 1)
        ja3 = jax.lax.broadcasted_iota(jnp.int32, (kc, a_dim, a_dim), 2)
        excl_a = (ia3 == ja3) | (live_a <= 0)             # (kc, A, A)
        nb_ok_a = (jnp.sum(jnp.where(excl_a, 0.0, 1.0), axis=-1,
                           keepdims=True) > 0).astype(f32)
    else:
        excl = ((r_id // a_dim) != (c_id // a_dim)) | (r_id == c_id) | (
            live <= 0)
        nb_ok = (jnp.sum(jnp.where(excl, 0.0, 1.0), axis=-1,
                         keepdims=True) > 0).astype(f32)      # (rows, 1)

    hw = hw_ref[:].astype(f32)                            # (d, 4)
    if batch_wgrad:
        # lane one-hots for staging the four head cotangents as (rows, 8)
        c8 = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)
        e8 = [(c8 == i).astype(f32) for i in range(4)]
    def hb(i):
        return hb_ref[0, i].astype(f32)                   # SMEM scalar
    bir = bir_ref[:].astype(f32)                          # (1, d)
    biz = biz_ref[:].astype(f32)
    bin_ = bin_ref[:].astype(f32)
    bhr = bhr_ref[:].astype(f32)
    bhz = bhz_ref[:].astype(f32)
    bhn = bhn_ref[:].astype(f32)
    wv_r = wvr_ref[:].astype(f32)                         # (2, d)
    wv_z = wvz_ref[:].astype(f32)
    wv_n = wvn_ref[:].astype(f32)

    # ---- zero the accumulator outputs ------------------------------------
    dtx_ref[0, 0] = jnp.zeros((t_len, rows), f32)
    dty_ref[0, 0] = jnp.zeros((t_len, rows), f32)
    ddec_ref[0, 0] = jnp.zeros((t_len, rows, d), f32)
    dmsg_ref[0, 0] = jnp.zeros((t_len, rows, d), f32)
    dfmap_ref[0, 0] = jnp.zeros((g2, c_dim), f32)
    dwv_ref[0, 0] = jnp.zeros((8, d), f32)
    dws_ref[0, 0] = jnp.zeros((3 * c_dim, d), f32)
    dwo_ref[0, 0] = jnp.zeros((3 * d, d), f32)
    dwd_ref[0, 0] = jnp.zeros((3 * d, d), f32)
    dwh_ref[0, 0] = jnp.zeros((3 * d, d), f32)
    dbi_ref[0, 0] = jnp.zeros((8, d), f32)
    dbh_ref[0, 0] = jnp.zeros((8, d), f32)
    dhw_ref[0, 0] = jnp.zeros((8, d), f32)
    dhb_ref[0, 0] = jnp.zeros((8, 8), f32)
    dltau_ref[0, 0] = jnp.zeros((8, 128), f32)

    # ---- per-pass forward recompute (dec-block projection is pass-
    # invariant: compute once) ---------------------------------------------
    def dec_proj_step(t, _):
        dec_t = dec_ref[0, 0, pl.ds(t, 1)][0]             # (rows, d)
        gdec_s[pl.ds(t, 1), :, 0:d] = (
            _mmf(dec_t, wdr_ref[:], cd, precision) + bir)[None]
        gdec_s[pl.ds(t, 1), :, d:2 * d] = (
            _mmf(dec_t, wdz_ref[:], cd, precision) + biz)[None]
        gdec_s[pl.ds(t, 1), :, 2 * d:3 * d] = (
            _mmf(dec_t, wdn_ref[:], cd, precision) + bin_)[None]
        return 0

    jax.lax.fori_loop(0, t_len, dec_proj_step, 0)

    if tent_mm:
        def _tents(xT, yT):
            """Narrow (rows, G) tents + slope masks for x and y."""
            xs = jnp.clip(xT, 0.0, 1.0) * (grid_g - 1)
            ys = jnp.clip(yT, 0.0, 1.0) * (grid_g - 1)
            dx, dy = xs - ncol, ys - ncol
            ax, ay = jnp.abs(dx), jnp.abs(dy)
            tx = jnp.maximum(0.0, 1.0 - ax)
            ty = jnp.maximum(0.0, 1.0 - ay)
            dtx = jnp.where(ax < 1.0, -jnp.sign(dx), 0.0)
            dty = jnp.where(ay < 1.0, -jnp.sign(dy), 0.0)
            return tx, ty, dtx, dty

        def _expand(narrow, mat):
            # f32 accumulator (Mosaic rejects bf16 acc on real TPU), cast
            # back to cd so the wide products stay packed
            return jnp.dot(narrow.astype(cd), mat,
                           preferred_element_type=jnp.float32,
                           precision=precision).astype(cd)

        def scene_hot(xT, yT):
            tx, ty, _, _ = _tents(xT, yT)
            return _expand(tx, exp_x) * _expand(ty, exp_y)

        def tent_weights(xT, yT):
            """(hot, d hot/d xs, d hot/d ys) as three (rows, G^2) planes."""
            tx, ty, dtx, dty = _tents(xT, yT)
            txe, tye = _expand(tx, exp_x), _expand(ty, exp_y)
            return (txe * tye, _expand(dtx, exp_x) * tye,
                    txe * _expand(dty, exp_y))
    else:
        def scene_hot(xT, yT):
            xs = jnp.clip(xT, 0.0, 1.0) * (grid_g - 1)
            ys = jnp.clip(yT, 0.0, 1.0) * (grid_g - 1)
            return (jnp.maximum(0.0, 1.0 - jnp.abs(xs - col_x))
                    * jnp.maximum(0.0, 1.0 - jnp.abs(ys - col_y)))

        def tent_weights(xT, yT):
            xs = jnp.clip(xT, 0.0, 1.0) * (grid_g - 1)
            ys = jnp.clip(yT, 0.0, 1.0) * (grid_g - 1)
            ax = jnp.abs(xs - col_x)
            ay = jnp.abs(ys - col_y)
            tent_x = jnp.maximum(0.0, 1.0 - ax)
            tent_y = jnp.maximum(0.0, 1.0 - ay)
            dtent_x = jnp.where(ax < 1.0, -jnp.sign(xs - col_x), 0.0)
            dtent_y = jnp.where(ay < 1.0, -jnp.sign(ys - col_y), 0.0)
            return (tent_x * tent_y, dtent_x * tent_y, tent_x * dtent_y)

    def attend_store(t, _):
        """Compute attention + social pool at the CURRENT x_s/y_s positions
        and persist (w_s, soc_s). Per pass normally; once at the level-0
        positions under social_freeze."""
        x = x_s[pl.ds(t, 1)]                              # (1, rows)
        y = y_s[pl.ds(t, 1)]
        xT = jnp.swapaxes(x, 0, 1)
        yT = jnp.swapaxes(y, 0, 1)
        mt = msg_ref[0, 0, pl.ds(t, 1)][0].astype(f32)
        if band:
            xb = _sel(xT * gt)                            # (rows, A)
            yb = _sel(yT * gt)
            sqb = xb * xb + yb * yb
            gramb = xT * xb + yT * yb
            d2 = (xT * xT + yT * yT) + sqb - 2.0 * gramb
            logits = jnp.where(excl, -1e9, -d2 / tau)
            w = jax.nn.softmax(logits, axis=-1) * nb_ok   # (rows, A)
            w_s[pl.ds(t, 1)] = w[None]
            xb_s[pl.ds(t, 1)] = xb[None]
            yb_s[pl.ds(t, 1)] = yb[None]
            d2b_s[pl.ds(t, 1)] = d2[None]
            wf = _mmf(w, gexp, cd, precision) * bsel      # (rows, rows)
            soc_s[pl.ds(t, 1)] = _mmf(wf, mt, cd, precision)[None]
            return 0
        if kcb:
            # lane-block-batched recompute: (kc, A, A) softmax stored as a
            # (rows, A) leading-merged plane (same scratch shape as band)
            dm = mt.shape[-1]
            mt_a = mt.reshape(kc, a_dim, dm)
            xa = xT.reshape(kc, a_dim, 1)
            ya = yT.reshape(kc, a_dim, 1)
            xat = jnp.swapaxes(xa, 1, 2)
            yat = jnp.swapaxes(ya, 1, 2)
            sqa = xa * xa + ya * ya
            d2 = (sqa + jnp.swapaxes(sqa, 1, 2)
                  - 2.0 * (xa * xat + ya * yat))          # (kc, A, A)
            logits = jnp.where(excl_a, -1e9, -d2 / tau)
            w = jax.nn.softmax(logits, axis=-1) * nb_ok_a
            w_s[pl.ds(t, 1)] = w.reshape(rows, a_dim)[None]
            pooled = jax.lax.dot_general(
                w.astype(cd), mt_a.astype(cd),
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=f32, precision=precision)
            soc_s[pl.ds(t, 1)] = pooled.reshape(rows, dm)[None]
            return 0
        sq = x * x + y * y
        gram = xT * x + yT * y
        d2 = jnp.swapaxes(sq, 0, 1) + sq - 2.0 * gram
        logits = jnp.where(excl, -1e9, -d2 / tau)
        w = jax.nn.softmax(logits, axis=-1) * nb_ok
        w_s[pl.ds(t, 1)] = w[None]
        soc_s[pl.ds(t, 1)] = _mmf(w, mt, cd, precision)[None]
        return 0

    def feat_step(t, _):
        x = x_s[pl.ds(t, 1)]                              # (1, rows)
        y = y_s[pl.ds(t, 1)]
        xT = jnp.swapaxes(x, 0, 1)
        yT = jnp.swapaxes(y, 0, 1)
        if not social_freeze:
            attend_store(t, 0)
        soc = soc_s[pl.ds(t, 1)][0]
        scene = _mmf(scene_hot(xT, yT), fmap, cd, precision)
        scene_s[pl.ds(t, 1)] = scene[None]
        tp = jnp.maximum(t - 1, 0)
        vx = jnp.swapaxes(x - x_s[pl.ds(tp, 1)], 0, 1)    # (rows, 1)
        vy = jnp.swapaxes(y - y_s[pl.ds(tp, 1)], 0, 1)
        gir_s[pl.ds(t, 1)] = (vx * wv_r[0:1] + vy * wv_r[1:2]
                              + _mmf(scene, wsr_ref[:], cd, precision)
                              + _mmf(soc, wor_ref[:], cd, precision)
                              + gdec_s[pl.ds(t, 1)][0][:, 0:d])[None]
        giz_s[pl.ds(t, 1)] = (vx * wv_z[0:1] + vy * wv_z[1:2]
                              + _mmf(scene, wsz_ref[:], cd, precision)
                              + _mmf(soc, woz_ref[:], cd, precision)
                              + gdec_s[pl.ds(t, 1)][0][:, d:2 * d])[None]
        gin_s[pl.ds(t, 1)] = (vx * wv_n[0:1] + vy * wv_n[1:2]
                              + _mmf(scene, wsn_ref[:], cd, precision)
                              + _mmf(soc, won_ref[:], cd, precision)
                              + gdec_s[pl.ds(t, 1)][0][:, 2 * d:3 * d])[None]
        return 0

    def gru_seq(t, _):
        h_prev = h_s[:]
        ghr = _mmf(h_prev, whr_ref[:], cd, precision) + bhr
        ghz = _mmf(h_prev, whz_ref[:], cd, precision) + bhz
        ghn = _mmf(h_prev, whn_ref[:], cd, precision) + bhn
        r = jax.nn.sigmoid(gir_s[pl.ds(t, 1)][0] + ghr)
        z = jax.nn.sigmoid(giz_s[pl.ds(t, 1)][0] + ghz)
        n = jnp.tanh(gin_s[pl.ds(t, 1)][0] + r * ghn)
        h_s[:] = (1.0 - z) * n + z * h_prev
        hs_s[pl.ds(t, 1)] = h_s[:][None]
        return 0

    fscale = float(delta_scale)

    # ---------------- reverse over passes ----------------------------------
    def pass_body(pp, _):
        p = num_refine - pp                               # R, R-1, ..., 0

        x_s[:] = lx_ref[0, 0, pl.ds(p, 1)][0]
        y_s[:] = ly_ref[0, 0, pl.ds(p, 1)][0]

        # cotangent of level p+1 also includes d_iters[p] (only for p < R).
        # Hoisted above the recompute loops (it reads nothing they write):
        # seed_step consumes gx_s/gy_s, so this must land first either way.
        @pl.when(p < num_refine)
        def _():
            gx_s[:] = gx_s[:] + gix_ref[0, 0, pl.ds(p, 1)][0]
            gy_s[:] = gy_s[:] + giy_ref[0, 0, pl.ds(p, 1)][0]

        is_score = (p == num_refine)
        zf = jnp.where(is_score, 1.0, 0.0)                # score-pass flag
        df = 1.0 - zf

        def seed_step(t, _):
            hs_t = hs_s[pl.ds(t, 1)][0]
            # one (d, 4) heads matmul (same per-column products/accumulation
            # as three (d, 1) matmuls; column 0 is unused here)
            out = _mmf(hs_t, hw, cd, precision)                # (rows, 4)
            out1 = out[:, 1:2] + hb(1)
            out2 = out[:, 2:3] + hb(2)
            out3 = out[:, 3:4] + hb(3)
            fmask_t = fmask_ref[0, pl.ds(t, 1)].astype(f32)    # (1, rows)
            fm_col = jnp.swapaxes(fmask_t, 0, 1)               # (rows, 1)

            d_psi = (jnp.swapaxes(gsc_ref[0, 0, 0:1], 0, 1)
                     * fm_col) * zf                            # (rows, 1)
            gxc = jnp.swapaxes(gx_s[pl.ds(t, 1)], 0, 1)
            gyc = jnp.swapaxes(gy_s[pl.ds(t, 1)], 0, 1)
            m = fm_col * fscale
            gate = jax.nn.sigmoid(out1)
            tx2 = jnp.tanh(out2)
            ty3 = jnp.tanh(out3)
            d_dxv = gxc * m * df
            d_dyv = gyc * m * df
            d_out2 = d_dxv * gate * (1.0 - tx2 * tx2)
            d_out3 = d_dyv * gate * (1.0 - ty3 * ty3)
            d_gate = d_dxv * tx2 + d_dyv * ty3
            d_out1 = d_gate * gate * (1.0 - gate)

            dhseed_s[pl.ds(t, 1)] = (
                d_psi * jnp.swapaxes(hw[:, 0:1], 0, 1)
                + d_out1 * jnp.swapaxes(hw[:, 1:2], 0, 1)
                + d_out2 * jnp.swapaxes(hw[:, 2:3], 0, 1)
                + d_out3 * jnp.swapaxes(hw[:, 3:4], 0, 1))[None]

            if batch_wgrad:
                # stage the four head cotangents as (rows, 8) lanes 0..3
                # (one-hot compose — lane-dim concats are forbidden); the
                # per-pass batched contraction replaces the 8 per-step
                # matmul/reduce accumulations below
                douts_scr[pl.ds(t, 1)] = (
                    d_psi * e8[0] + d_out1 * e8[1]
                    + d_out2 * e8[2] + d_out3 * e8[3])[None]
                return 0

            # head grads: rows 0..3 of the (8, d) accumulator
            dhw_ref[0, 0, 0:1] = dhw_ref[0, 0, 0:1] + _contract_first(
                d_psi, hs_t, cd, precision)               # (1, d)
            dhw_ref[0, 0, 1:2] = dhw_ref[0, 0, 1:2] + _contract_first(
                d_out1, hs_t, cd, precision)
            dhw_ref[0, 0, 2:3] = dhw_ref[0, 0, 2:3] + _contract_first(
                d_out2, hs_t, cd, precision)
            dhw_ref[0, 0, 3:4] = dhw_ref[0, 0, 3:4] + _contract_first(
                d_out3, hs_t, cd, precision)
            dhb_ref[0, 0, 0:1, 0:1] = (dhb_ref[0, 0, 0:1, 0:1]
                                       + jnp.sum(d_psi, keepdims=True))
            dhb_ref[0, 0, 1:2, 0:1] = (dhb_ref[0, 0, 1:2, 0:1]
                                       + jnp.sum(d_out1, keepdims=True))
            dhb_ref[0, 0, 2:3, 0:1] = (dhb_ref[0, 0, 2:3, 0:1]
                                       + jnp.sum(d_out2, keepdims=True))
            dhb_ref[0, 0, 3:4, 0:1] = (dhb_ref[0, 0, 3:4, 0:1]
                                       + jnp.sum(d_out3, keepdims=True))
            return 0

        if fused_loop:
            # gi[t]/hs[t]/seed[t] form a per-step chain with no cross-step
            # dependence beyond the GRU carry, so the three forward loops
            # fuse into ONE T-loop (same DESIRE_IOC_FUSED_LOOP knob as the
            # forward kernel): 4 serial T-loops per pass drop to 2. All
            # stores (gates, hs, seeds, head-grad accumulators) keep the
            # same ascending-t order — bitwise-identical outputs.
            def recompute_step(t, _):
                feat_step(t, 0)
                gru_seq(t, 0)
                seed_step(t, 0)
                return 0

            h_s[:] = jnp.zeros((rows, d), f32)
            jax.lax.fori_loop(0, t_len, recompute_step, 0)
        else:
            jax.lax.fori_loop(0, t_len, feat_step, 0)
            h_s[:] = jnp.zeros((rows, d), f32)
            jax.lax.fori_loop(0, t_len, gru_seq, 0)
            jax.lax.fori_loop(0, t_len, seed_step, 0)
        dh_s[:] = jnp.zeros((rows, d), f32)

        def bwd_step(tt, _):
            t = t_len - 1 - tt
            dh = dhseed_s[pl.ds(t, 1)][0] + dh_s[:]
            # recompute gates at t
            tp = jnp.maximum(t - 1, 0)
            h_prev = jnp.where(t > 0, hs_s[pl.ds(tp, 1)][0],
                               jnp.zeros((rows, d), f32))
            ghr = _mmf(h_prev, whr_ref[:], cd, precision) + bhr
            ghz = _mmf(h_prev, whz_ref[:], cd, precision) + bhz
            ghn = _mmf(h_prev, whn_ref[:], cd, precision) + bhn
            r = jax.nn.sigmoid(gir_s[pl.ds(t, 1)][0] + ghr)
            z = jax.nn.sigmoid(giz_s[pl.ds(t, 1)][0] + ghz)
            n = jnp.tanh(gin_s[pl.ds(t, 1)][0] + r * ghn)

            dn = dh * (1.0 - z)
            dz = dh * (h_prev - n)
            dh_prev = dh * z
            dnp = dn * (1.0 - n * n)
            dr = dnp * ghn
            d_h_n = dnp * r
            dzp = dz * z * (1.0 - z)
            drp = dr * r * (1.0 - r)

            dh_prev = (dh_prev
                       + _contract_last(drp, whr_ref[:], cd, precision)
                       + _contract_last(dzp, whz_ref[:], cd, precision)
                       + _contract_last(d_h_n, whn_ref[:], cd, precision))
            if batch_wgrad:
                # stage the gate cotangents for the per-pass batched weight
                # contractions (see wgrad_flush): gir/giz/gin are dead at t
                # after the gate recompute above, dhseed was consumed at the
                # top of this step — all four stores reuse live scratch
                gir_s[pl.ds(t, 1)] = drp[None]
                giz_s[pl.ds(t, 1)] = dzp[None]
                gin_s[pl.ds(t, 1)] = dnp[None]
                dhseed_s[pl.ds(t, 1)] = d_h_n[None]
            else:
                dwh_ref[0, 0, 0:d] = dwh_ref[0, 0, 0:d] + _contract_first(
                    h_prev, drp, cd, precision)
                dwh_ref[0, 0, d:2 * d] = (dwh_ref[0, 0, d:2 * d]
                                          + _contract_first(h_prev, dzp,
                                                            cd, precision))
                dwh_ref[0, 0, 2 * d:3 * d] = (dwh_ref[0, 0, 2 * d:3 * d]
                                              + _contract_first(
                                                  h_prev, d_h_n,
                                                  cd, precision))
                dbh_ref[0, 0, 0:1] = dbh_ref[0, 0, 0:1] + jnp.sum(
                    drp, axis=0, keepdims=True)
                dbh_ref[0, 0, 1:2] = dbh_ref[0, 0, 1:2] + jnp.sum(
                    dzp, axis=0, keepdims=True)
                dbh_ref[0, 0, 2:3] = dbh_ref[0, 0, 2:3] + jnp.sum(
                    d_h_n, axis=0, keepdims=True)
                dbi_ref[0, 0, 0:1] = dbi_ref[0, 0, 0:1] + jnp.sum(
                    drp, axis=0, keepdims=True)
                dbi_ref[0, 0, 1:2] = dbi_ref[0, 0, 1:2] + jnp.sum(
                    dzp, axis=0, keepdims=True)
                dbi_ref[0, 0, 2:3] = dbi_ref[0, 0, 2:3] + jnp.sum(
                    dnp, axis=0, keepdims=True)
            dh_s[:] = dh_prev

            # ---- feature blocks ----
            if not batch_wgrad:
                scene_t = scene_s[pl.ds(t, 1)][0]
                soc_t = soc_s[pl.ds(t, 1)][0]
            mt = msg_ref[0, 0, pl.ds(t, 1)][0].astype(f32)
            w_t = w_s[pl.ds(t, 1)][0]
            x = x_s[pl.ds(t, 1)]
            y = y_s[pl.ds(t, 1)]
            xT = jnp.swapaxes(x, 0, 1)
            yT = jnp.swapaxes(y, 0, 1)

            if not batch_wgrad:
                # dec block (batched: wgrad_flush)
                dec_t = dec_ref[0, 0, pl.ds(t, 1)][0].astype(f32)
                ddec_ref[0, 0, pl.ds(t, 1)] = (
                    ddec_ref[0, 0, pl.ds(t, 1)]
                    + (_contract_last(drp, wdr_ref[:], cd, precision)
                       + _contract_last(dzp, wdz_ref[:], cd, precision)
                       + _contract_last(dnp, wdn_ref[:], cd, precision))[
                           None])
                dwd_ref[0, 0, 0:d] = dwd_ref[0, 0, 0:d] + _contract_first(
                    dec_t, drp, cd, precision)
                dwd_ref[0, 0, d:2 * d] = (dwd_ref[0, 0, d:2 * d]
                                          + _contract_first(dec_t, dzp,
                                                            cd, precision))
                dwd_ref[0, 0, 2 * d:3 * d] = (dwd_ref[0, 0, 2 * d:3 * d]
                                              + _contract_first(dec_t, dnp,
                                                                cd,
                                                                precision))

            # scene block
            d_scene = (_contract_last(drp, wsr_ref[:], cd, precision)
                       + _contract_last(dzp, wsz_ref[:], cd, precision)
                       + _contract_last(dnp, wsn_ref[:], cd, precision))
            if not batch_wgrad:
                dws_ref[0, 0, 0:c_dim] = (dws_ref[0, 0, 0:c_dim]
                                          + _contract_first(scene_t, drp,
                                                            cd, precision))
                dws_ref[0, 0, c_dim:2 * c_dim] = (
                    dws_ref[0, 0, c_dim:2 * c_dim]
                    + _contract_first(scene_t, dzp, cd, precision))
                dws_ref[0, 0, 2 * c_dim:3 * c_dim] = (
                    dws_ref[0, 0, 2 * c_dim:3 * c_dim]
                    + _contract_first(scene_t, dnp, cd, precision))
            hot, wx, wy = tent_weights(xT, yT)
            dfmap_ref[0, 0] = dfmap_ref[0, 0] + _contract_first(
                hot, d_scene, cd, precision)
            d_hot = _contract_last(d_scene, fmap, cd, precision)  # (rows,G2)
            in01_x = ((xT > 0.0) & (xT < 1.0)).astype(f32) * (grid_g - 1)
            in01_y = ((yT > 0.0) & (yT < 1.0)).astype(f32) * (grid_g - 1)
            gpx = jnp.sum(d_hot * wx, axis=-1,
                          keepdims=True) * in01_x          # (rows, 1)
            gpy = jnp.sum(d_hot * wy, axis=-1,
                          keepdims=True) * in01_y

            # social block
            d_soc = (_contract_last(drp, wor_ref[:], cd, precision)
                     + _contract_last(dzp, woz_ref[:], cd, precision)
                     + _contract_last(dnp, won_ref[:], cd, precision))
            if not batch_wgrad:
                dwo_ref[0, 0, 0:d] = dwo_ref[0, 0, 0:d] + _contract_first(
                    soc_t, drp, cd, precision)
                dwo_ref[0, 0, d:2 * d] = (dwo_ref[0, 0, d:2 * d]
                                          + _contract_first(soc_t, dzp,
                                                            cd, precision))
                dwo_ref[0, 0, 2 * d:3 * d] = (dwo_ref[0, 0, 2 * d:3 * d]
                                              + _contract_first(soc_t, dnp,
                                                                cd,
                                                                precision))
            if social_freeze:
                # defer the attention adjoint: bucket d_soc by pass class
                # (refine passes carry position+ltau gradient; the score
                # pass carries ltau/msg only — XLA re-score stops positions)
                # and run ONE frozen-attention adjoint after the pass loop.
                dsoc_r_s[pl.ds(t, 1)] = (dsoc_r_s[pl.ds(t, 1)]
                                         + (d_soc * df)[None])
                dsoc_c_s[pl.ds(t, 1)] = (dsoc_c_s[pl.ds(t, 1)]
                                         + (d_soc * zf)[None])
            elif band:
                # banded softmax adjoint: all wide VPU work on (rows, A);
                # (rows, rows) only inside MXU matmuls (expand, d_w, _sel)
                wf = _mmf(w_t, gexp, cd, precision) * bsel
                dmsg_ref[0, 0, pl.ds(t, 1)] = (
                    dmsg_ref[0, 0, pl.ds(t, 1)]
                    + _contract_first(wf, d_soc, cd, precision)[None])
                d_w = _contract_last(d_soc, mt, cd, precision)  # (rows,rows)
                d_wb = jnp.dot(d_w * bsel, gt, preferred_element_type=f32,
                               precision=jax.lax.Precision.HIGHEST)
                d_sm = d_wb * nb_ok                             # (rows, A)
                row_dot = jnp.sum(d_sm * w_t, axis=-1, keepdims=True)
                d_l = w_t * d_sm - w_t * row_dot
                d_l = jnp.where(excl, 0.0, d_l)
                d_d2 = -d_l / tau
                d2v = d2b_s[pl.ds(t, 1)][0]
                dltau_ref[0, 0, 0:1, 0:1] = dltau_ref[0, 0, 0:1, 0:1] + (
                    jnp.sum(d_l * d2v, keepdims=True)[0:1, 0:1]
                    / (tau * tau) * jnp.exp(ltau))
                rs = jnp.sum(d_d2, axis=-1, keepdims=True)      # (rows, 1)
                cs = band_pick(_sel(d_d2))
                xb = xb_s[pl.ds(t, 1)][0]
                yb = yb_s[pl.ds(t, 1)][0]
                # (d_d2 + d_d2^T) @ pos, banded: row term is a masked row
                # sum; the transposed term block-sums pos-weighted cotangents
                mx = (jnp.sum(d_d2 * xb, axis=-1, keepdims=True)
                      + band_pick(_sel(d_d2 * xT)))
                my = (jnp.sum(d_d2 * yb, axis=-1, keepdims=True)
                      + band_pick(_sel(d_d2 * yT)))
                gpx = gpx + 2.0 * ((rs + cs) * xT - mx)
                gpy = gpy + 2.0 * ((rs + cs) * yT - my)
            elif kcb:
                # lane-block-batched adjoint: every (rows, rows) tensor of
                # the dense path shrinks to (kc, A, A) — same math (the
                # deleted cross-block terms are exactly zero there)
                dm = mt.shape[-1]
                mt_a = mt.reshape(kc, a_dim, dm)
                w_a = w_t.reshape(kc, a_dim, a_dim)
                dsoc_a = d_soc.reshape(kc, a_dim, dm)
                dmsg_ref[0, 0, pl.ds(t, 1)] = (
                    dmsg_ref[0, 0, pl.ds(t, 1)]
                    + jax.lax.dot_general(
                        w_a.astype(cd), dsoc_a.astype(cd),
                        (((1,), (1,)), ((0,), (0,))),
                        preferred_element_type=f32,
                        precision=precision).reshape(rows, dm)[None])
                d_w = jax.lax.dot_general(
                    dsoc_a.astype(cd), mt_a.astype(cd),
                    (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=f32,
                    precision=precision)                  # (kc, A, A)
                d_sm = d_w * nb_ok_a
                row_dot = jnp.sum(d_sm * w_a, axis=-1, keepdims=True)
                d_l = w_a * d_sm - w_a * row_dot
                d_l = jnp.where(excl_a, 0.0, d_l)
                d_d2 = -d_l / tau
                xa = xT.reshape(kc, a_dim, 1)
                ya = yT.reshape(kc, a_dim, 1)
                xat = jnp.swapaxes(xa, 1, 2)
                yat = jnp.swapaxes(ya, 1, 2)
                sqa = xa * xa + ya * ya
                d2v = (sqa + jnp.swapaxes(sqa, 1, 2)
                       - 2.0 * (xa * xat + ya * yat))
                # full reduce via a 2D leading-merge view + keepdims row/col
                # sums (Mosaic: mid/leading-axis 3D reductions trip a
                # layout_rank assert when compiled; last-axis keepdims and
                # 2D sums are the known-good forms)
                ld = (d_l * d2v).reshape(rows, a_dim)
                tot = jnp.sum(jnp.sum(ld, axis=-1, keepdims=True),
                              axis=0, keepdims=True)         # (1, 1)
                dltau_ref[0, 0, 0:1, 0:1] = dltau_ref[0, 0, 0:1, 0:1] + (
                    tot / (tau * tau) * jnp.exp(ltau))
                rs = jnp.sum(d_d2, axis=-1, keepdims=True)   # (kc, A, 1)
                cs = jnp.sum(jnp.swapaxes(d_d2, 1, 2), axis=-1,
                             keepdims=True)                  # (kc, A, 1)
                symm = d_d2 + jnp.swapaxes(d_d2, 1, 2)
                mx = jax.lax.dot_general(
                    symm.astype(cd), xa.astype(cd),
                    (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=f32, precision=precision)
                my = jax.lax.dot_general(
                    symm.astype(cd), ya.astype(cd),
                    (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=f32, precision=precision)
                gpx = gpx + (2.0 * ((rs + cs) * xa - mx)).reshape(rows, 1)
                gpy = gpy + (2.0 * ((rs + cs) * ya - my)).reshape(rows, 1)
            else:
                dmsg_ref[0, 0, pl.ds(t, 1)] = (
                    dmsg_ref[0, 0, pl.ds(t, 1)]
                    + _contract_first(w_t, d_soc, cd, precision)[None])
                d_w = _contract_last(d_soc, mt, cd, precision)  # (rows,rows)
                d_sm = d_w * nb_ok
                row_dot = jnp.sum(d_sm * w_t, axis=-1, keepdims=True)
                d_l = w_t * d_sm - w_t * row_dot
                d_l = jnp.where(excl, 0.0, d_l)
                d_d2 = -d_l / tau
                # tau adjoint: l = -d2/tau -> dl/dtau = d2/tau^2;
                # d_ltau = sum(d_l*d2)/tau^2 * dtau/dltau, dtau/dltau = e^ltau
                sq = x * x + y * y
                gram = xT * x + yT * y
                d2v = jnp.swapaxes(sq, 0, 1) + sq - 2.0 * gram
                dltau_ref[0, 0, 0:1, 0:1] = dltau_ref[0, 0, 0:1, 0:1] + (
                    jnp.sum(d_l * d2v, keepdims=True)[0:1, 0:1]
                    / (tau * tau) * jnp.exp(ltau))
                rs = jnp.sum(d_d2, axis=-1, keepdims=True)  # (rows, 1)
                cs = jnp.swapaxes(jnp.sum(d_d2, axis=0, keepdims=True), 0, 1)
                symm = d_d2 + jnp.swapaxes(d_d2, 0, 1)
                gpx = gpx + 2.0 * ((rs + cs) * xT
                                   - _mmf(symm, xT, cd, precision))
                gpy = gpy + 2.0 * ((rs + cs) * yT
                                   - _mmf(symm, yT, cd, precision))

            # velocity block
            d_vx = (jnp.sum(drp * wv_r[0:1], axis=-1, keepdims=True)
                    + jnp.sum(dzp * wv_z[0:1], axis=-1, keepdims=True)
                    + jnp.sum(dnp * wv_n[0:1], axis=-1, keepdims=True))
            d_vy = (jnp.sum(drp * wv_r[1:2], axis=-1, keepdims=True)
                    + jnp.sum(dzp * wv_z[1:2], axis=-1, keepdims=True)
                    + jnp.sum(dnp * wv_n[1:2], axis=-1, keepdims=True))
            vx = jnp.swapaxes(x - x_s[pl.ds(tp, 1)], 0, 1)
            vy = jnp.swapaxes(y - y_s[pl.ds(tp, 1)], 0, 1)
            # rows 0..5 of the (8, d) accumulator: [r|z|n] x [vx|vy]
            dwv_ref[0, 0, 0:1] = dwv_ref[0, 0, 0:1] + _contract_first(
                vx, drp, cd, precision)
            dwv_ref[0, 0, 1:2] = dwv_ref[0, 0, 1:2] + _contract_first(
                vy, drp, cd, precision)
            dwv_ref[0, 0, 2:3] = dwv_ref[0, 0, 2:3] + _contract_first(
                vx, dzp, cd, precision)
            dwv_ref[0, 0, 3:4] = dwv_ref[0, 0, 3:4] + _contract_first(
                vy, dzp, cd, precision)
            dwv_ref[0, 0, 4:5] = dwv_ref[0, 0, 4:5] + _contract_first(
                vx, dnp, cd, precision)
            dwv_ref[0, 0, 5:6] = dwv_ref[0, 0, 5:6] + _contract_first(
                vy, dnp, cd, precision)

            # position grads (not on the final re-score pass)
            @pl.when(p < num_refine)
            def _():
                gx_s[pl.ds(t, 1)] = (gx_s[pl.ds(t, 1)]
                                     + jnp.swapaxes(gpx, 0, 1))
                gy_s[pl.ds(t, 1)] = (gy_s[pl.ds(t, 1)]
                                     + jnp.swapaxes(gpy, 0, 1))

                @pl.when(t > 0)
                def _():
                    dvx_r = jnp.swapaxes(d_vx, 0, 1)       # (1, rows)
                    dvy_r = jnp.swapaxes(d_vy, 0, 1)
                    gx_s[pl.ds(t, 1)] = gx_s[pl.ds(t, 1)] + dvx_r
                    gy_s[pl.ds(t, 1)] = gy_s[pl.ds(t, 1)] + dvy_r
                    gx_s[pl.ds(t - 1, 1)] = gx_s[pl.ds(t - 1, 1)] - dvx_r
                    gy_s[pl.ds(t - 1, 1)] = gy_s[pl.ds(t - 1, 1)] - dvy_r
            return 0

        jax.lax.fori_loop(0, t_len, bwd_step, 0)

        if batch_wgrad:
            # ---- per-pass batched weight-gradient contractions ----------
            # The reverse loop staged drp/dzp/dnp in gir/giz/gin, d_h_n in
            # dhseed, and the head cotangents in douts; each weight group's
            # T x per-step matmul-accumulate rounds collapse into ONE
            # contraction over the flattened (T*rows) axis. Values are the
            # same products f32-accumulated in a different order. The (T,
            # rows, d) -> (T*rows, d) reshapes merge the untiled leading
            # dim into sublanes (rows % 8 == 0) — layout-preserving.
            tr = t_len * rows
            drp_f = gir_s[:].reshape(tr, d)
            dzp_f = giz_s[:].reshape(tr, d)
            dnp_f = gin_s[:].reshape(tr, d)
            dhn_f = dhseed_s[:].reshape(tr, d)
            hs_f = hs_s[:].reshape(tr, d)
            # GRU-recurrent weight: h_prev[t] = hs[t-1] (zero at t=0, whose
            # term vanishes) -> contract hs[0:T-1] against gates[1:T]
            trm = (t_len - 1) * rows
            hsp_f = hs_s[0:t_len - 1].reshape(trm, d)
            dwh_ref[0, 0, 0:d] = dwh_ref[0, 0, 0:d] + _contract_first(
                hsp_f, gir_s[1:t_len].reshape(trm, d), cd, precision)
            dwh_ref[0, 0, d:2 * d] = (dwh_ref[0, 0, d:2 * d]
                                      + _contract_first(
                                          hsp_f,
                                          giz_s[1:t_len].reshape(trm, d),
                                          cd, precision))
            dwh_ref[0, 0, 2 * d:3 * d] = (dwh_ref[0, 0, 2 * d:3 * d]
                                          + _contract_first(
                                              hsp_f,
                                              dhseed_s[1:t_len].reshape(
                                                  trm, d),
                                              cd, precision))
            dbh_ref[0, 0, 0:1] = dbh_ref[0, 0, 0:1] + jnp.sum(
                drp_f, axis=0, keepdims=True)
            dbh_ref[0, 0, 1:2] = dbh_ref[0, 0, 1:2] + jnp.sum(
                dzp_f, axis=0, keepdims=True)
            dbh_ref[0, 0, 2:3] = dbh_ref[0, 0, 2:3] + jnp.sum(
                dhn_f, axis=0, keepdims=True)
            dbi_ref[0, 0, 0:1] = dbi_ref[0, 0, 0:1] + jnp.sum(
                drp_f, axis=0, keepdims=True)
            dbi_ref[0, 0, 1:2] = dbi_ref[0, 0, 1:2] + jnp.sum(
                dzp_f, axis=0, keepdims=True)
            dbi_ref[0, 0, 2:3] = dbi_ref[0, 0, 2:3] + jnp.sum(
                dnp_f, axis=0, keepdims=True)
            # dec block: cotangent into dec + weight grads
            dec_f = dec_ref[0, 0].reshape(tr, d).astype(f32)
            ddec_ref[0, 0] = ddec_ref[0, 0] + (
                _contract_last(drp_f, wdr_ref[:], cd, precision)
                + _contract_last(dzp_f, wdz_ref[:], cd, precision)
                + _contract_last(dnp_f, wdn_ref[:], cd, precision)
            ).reshape(t_len, rows, d)
            dwd_ref[0, 0, 0:d] = dwd_ref[0, 0, 0:d] + _contract_first(
                dec_f, drp_f, cd, precision)
            dwd_ref[0, 0, d:2 * d] = (dwd_ref[0, 0, d:2 * d]
                                      + _contract_first(dec_f, dzp_f,
                                                        cd, precision))
            dwd_ref[0, 0, 2 * d:3 * d] = (dwd_ref[0, 0, 2 * d:3 * d]
                                          + _contract_first(dec_f, dnp_f,
                                                            cd, precision))
            scene_f = scene_s[:].reshape(tr, c_dim)
            dws_ref[0, 0, 0:c_dim] = (dws_ref[0, 0, 0:c_dim]
                                      + _contract_first(scene_f, drp_f,
                                                        cd, precision))
            dws_ref[0, 0, c_dim:2 * c_dim] = (
                dws_ref[0, 0, c_dim:2 * c_dim]
                + _contract_first(scene_f, dzp_f, cd, precision))
            dws_ref[0, 0, 2 * c_dim:3 * c_dim] = (
                dws_ref[0, 0, 2 * c_dim:3 * c_dim]
                + _contract_first(scene_f, dnp_f, cd, precision))
            soc_f = soc_s[:].reshape(tr, d)
            dwo_ref[0, 0, 0:d] = dwo_ref[0, 0, 0:d] + _contract_first(
                soc_f, drp_f, cd, precision)
            dwo_ref[0, 0, d:2 * d] = (dwo_ref[0, 0, d:2 * d]
                                      + _contract_first(soc_f, dzp_f,
                                                        cd, precision))
            dwo_ref[0, 0, 2 * d:3 * d] = (dwo_ref[0, 0, 2 * d:3 * d]
                                          + _contract_first(soc_f, dnp_f,
                                                            cd, precision))
            # head grads: one (8, d) contraction + one bias reduce
            douts_f = douts_scr[:].reshape(tr, 8)
            dhw_ref[0, 0] = dhw_ref[0, 0] + _contract_first(
                douts_f, hs_f, cd, precision)
            dhb_ref[0, 0, 0:8, 0:1] = dhb_ref[0, 0, 0:8, 0:1] + jnp.swapaxes(
                jnp.sum(douts_f, axis=0, keepdims=True), 0, 1)
        return 0

    gx_s[:] = grx_ref[0, 0]
    gy_s[:] = gry_ref[0, 0]
    if social_freeze:
        # frozen attention: compute (w, soc) ONCE at the level-0 (initial
        # SGM) positions; feat_step reuses them for every pass recompute
        dsoc_r_s[:] = jnp.zeros(dsoc_r_s.shape, f32)
        dsoc_c_s[:] = jnp.zeros(dsoc_c_s.shape, f32)
        x_s[:] = lx_ref[0, 0, 0]
        y_s[:] = ly_ref[0, 0, 0]
        jax.lax.fori_loop(0, t_len, attend_store, 0)
    jax.lax.fori_loop(0, num_refine + 1, pass_body, 0)
    if social_freeze:
        # deferred frozen-attention adjoint, once per step: x_s/y_s hold the
        # level-0 positions again (pass_body's last iteration is p=0)
        def attn_adj(t, _):
            x = x_s[pl.ds(t, 1)]
            y = y_s[pl.ds(t, 1)]
            xT = jnp.swapaxes(x, 0, 1)
            yT = jnp.swapaxes(y, 0, 1)
            w_t = w_s[pl.ds(t, 1)][0]
            mt = msg_ref[0, 0, pl.ds(t, 1)][0].astype(f32)
            dsr = dsoc_r_s[pl.ds(t, 1)][0]
            dsc = dsoc_c_s[pl.ds(t, 1)][0]
            if band:
                wf = _mmf(w_t, gexp, cd, precision) * bsel
                dmsg_ref[0, 0, pl.ds(t, 1)] = (
                    dmsg_ref[0, 0, pl.ds(t, 1)]
                    + _contract_first(wf, dsr + dsc, cd, precision)[None])
                d2v = d2b_s[pl.ds(t, 1)][0]                # (rows, A)

                def softmax_adj(d_soc_in):
                    d_w = _contract_last(d_soc_in, mt, cd, precision)
                    d_wb = jnp.dot(d_w * bsel, gt,
                                   preferred_element_type=f32,
                                   precision=jax.lax.Precision.HIGHEST)
                    d_sm = d_wb * nb_ok
                    row_dot = jnp.sum(d_sm * w_t, axis=-1, keepdims=True)
                    return jnp.where(excl, 0.0, w_t * d_sm - w_t * row_dot)

                d_l_all = softmax_adj(dsr + dsc)
                dltau_ref[0, 0, 0:1, 0:1] = dltau_ref[0, 0, 0:1, 0:1] + (
                    jnp.sum(d_l_all * d2v, keepdims=True)[0:1, 0:1]
                    / (tau * tau) * jnp.exp(ltau))
                d_d2 = -softmax_adj(dsr) / tau
                rs = jnp.sum(d_d2, axis=-1, keepdims=True)
                cs = band_pick(_sel(d_d2))
                xb = xb_s[pl.ds(t, 1)][0]
                yb = yb_s[pl.ds(t, 1)][0]
                mx = (jnp.sum(d_d2 * xb, axis=-1, keepdims=True)
                      + band_pick(_sel(d_d2 * xT)))
                my = (jnp.sum(d_d2 * yb, axis=-1, keepdims=True)
                      + band_pick(_sel(d_d2 * yT)))
                gpx = 2.0 * ((rs + cs) * xT - mx)
                gpy = 2.0 * ((rs + cs) * yT - my)
                gx_s[pl.ds(t, 1)] = gx_s[pl.ds(t, 1)] + jnp.swapaxes(
                    gpx, 0, 1)
                gy_s[pl.ds(t, 1)] = gy_s[pl.ds(t, 1)] + jnp.swapaxes(
                    gpy, 0, 1)
                return 0
            dmsg_ref[0, 0, pl.ds(t, 1)] = (
                dmsg_ref[0, 0, pl.ds(t, 1)]
                + _contract_first(w_t, dsr + dsc, cd, precision)[None])
            sq = x * x + y * y
            gram = xT * x + yT * y
            d2v = jnp.swapaxes(sq, 0, 1) + sq - 2.0 * gram

            def softmax_adj(d_soc_in):
                d_w = _contract_last(d_soc_in, mt, cd, precision)
                d_sm = d_w * nb_ok
                row_dot = jnp.sum(d_sm * w_t, axis=-1, keepdims=True)
                return jnp.where(excl, 0.0, w_t * d_sm - w_t * row_dot)

            # ltau hears BOTH buckets; positions only the refine bucket
            d_l_all = softmax_adj(dsr + dsc)
            dltau_ref[0, 0, 0:1, 0:1] = dltau_ref[0, 0, 0:1, 0:1] + (
                jnp.sum(d_l_all * d2v, keepdims=True)[0:1, 0:1]
                / (tau * tau) * jnp.exp(ltau))
            d_d2 = -softmax_adj(dsr) / tau
            rs = jnp.sum(d_d2, axis=-1, keepdims=True)     # (rows, 1)
            cs = jnp.swapaxes(jnp.sum(d_d2, axis=0, keepdims=True), 0, 1)
            symm = d_d2 + jnp.swapaxes(d_d2, 0, 1)
            gpx = 2.0 * ((rs + cs) * xT - _mmf(symm, xT, cd, precision))
            gpy = 2.0 * ((rs + cs) * yT - _mmf(symm, yT, cd, precision))
            gx_s[pl.ds(t, 1)] = gx_s[pl.ds(t, 1)] + jnp.swapaxes(gpx, 0, 1)
            gy_s[pl.ds(t, 1)] = gy_s[pl.ds(t, 1)] + jnp.swapaxes(gpy, 0, 1)
            return 0

        jax.lax.fori_loop(0, t_len, attn_adj, 0)
    dtx_ref[0, 0] = gx_s[:]
    dty_ref[0, 0] = gy_s[:]


def ioc_refine_bwd(p_ioc, p_scf, traj, dec_h, msg, feat_map, live, fut_mask,
                   iters, d_refined, d_scores, d_iters, *, num_refine,
                   delta_scale, interpret=False, social_freeze=False):
    """Drive the backward kernel; returns cotangents
    (d_traj, d_dec, d_msg, d_feat_map, grads_gru, grads_heads, d_ltau)
    where grads_gru = {'wi','wh','bi','bh'} matching p_ioc['gru'][0] and
    grads_heads = {'score','gate','delta'} (each {'w','b'}).

    Shapes follow ioc_refine_fused; iters is its collect_iters output
    (R, B, A, K, T, 2).
    """
    import functools

    b, a, k, t, _ = traj.shape
    a_orig = a
    a_pad = max(-(-a // 8) * 8, 8)
    if a_pad != a:
        pad5 = [(0, 0)] * 5
        pad5[1] = (0, a_pad - a)
        traj = jnp.pad(traj, pad5)
        dec_h = jnp.pad(dec_h, pad5)
        msg = jnp.pad(msg, pad5)
        d_refined = jnp.pad(d_refined, pad5)
        live = jnp.pad(live, ((0, 0), (0, a_pad - a)))
        fut_mask = jnp.pad(fut_mask, ((0, 0), (0, a_pad - a), (0, 0)))
        d_scores = jnp.pad(d_scores, ((0, 0), (0, a_pad - a), (0, 0)))
        pad6 = [(0, 0)] * 6
        pad6[2] = (0, a_pad - a)
        iters = jnp.pad(iters, pad6)
        d_iters = jnp.pad(d_iters, pad6)
        a = a_pad
    d = dec_h.shape[-1]
    g = feat_map.shape[1]
    c = feat_map.shape[-1]
    gp = p_ioc["gru"][0]
    cd = dec_h.dtype
    # fused_loop=False: the freeze row clamp is about THIS kernel's VMEM
    # budget (it stages every gate block for reverse accumulation — the
    # forward's fused-loop scratch saving does not apply here). Chunk size
    # is numbers-neutral and need not match the forward kernel's.
    kc = _pick_chunk(k, a, social_freeze=social_freeze, conservative=True)
    chunks = k // kc
    rows = kc * a
    nr = int(num_refine)
    f32 = jnp.float32

    def to_chunk_major(arr):
        trailing = arr.shape[4:]
        arr = arr.reshape(b, a, chunks, kc, t, *trailing)
        arr = jnp.moveaxis(arr, (2, 4, 3, 1), (1, 2, 3, 4))
        return arr.reshape(b, chunks, t, rows, *trailing)

    def iters_to_chunk_major(arr):
        """(R, B, A, K, T) -> (B, Ch, R, T, rows)."""
        arr = arr.reshape(nr, b, a, chunks, kc, t)
        arr = jnp.transpose(arr, (1, 3, 0, 5, 4, 2))      # (b,Ch,R,t,kc,a)
        return arr.reshape(b, chunks, nr, t, rows)

    tcm = to_chunk_major(traj.astype(f32))                # (B,Ch,T,rows,2)
    # levels: [traj_in, iter_1..iter_R] along a leading iteration dim
    lev_x = jnp.concatenate(
        [tcm[..., 0][:, :, None],
         iters_to_chunk_major(iters[..., 0])], axis=2)
    lev_y = jnp.concatenate(
        [tcm[..., 1][:, :, None],
         iters_to_chunk_major(iters[..., 1])], axis=2)    # (B,Ch,R+1,T,rows)
    dec_cm = to_chunk_major(dec_h)
    msg_cm = to_chunk_major(msg)
    grx = to_chunk_major(d_refined.astype(f32))
    grx_x, grx_y = grx[..., 0], grx[..., 1]
    gi_cm_x = iters_to_chunk_major(d_iters[..., 0].astype(f32))
    gi_cm_y = iters_to_chunk_major(d_iters[..., 1].astype(f32))
    fmap_flat = feat_map.reshape(b, g * g, c)
    live_t = jnp.tile(live, (1, kc))[:, None, :]
    fmask_t = jnp.tile(jnp.swapaxes(fut_mask, 1, 2), (1, 1, kc))
    gsc = d_scores.astype(f32)                            # (B, A, K)
    gsc = jnp.moveaxis(gsc.reshape(b, a, chunks, kc), 1, 3)
    gsc = gsc.reshape(b, chunks, 1, rows)
    ltau = p_scf["soc_logtau"].reshape(1, 1).astype(f32)

    # per-gate weight splits (wi rows: [vel(2) | scene(C) | social(d) | dec])
    wi, wh = gp["wi"], gp["wh"]
    gates = [wi[:, i * d:(i + 1) * d] for i in range(3)]
    wv = [w[:2] for w in gates]
    ws = [w[2:2 + c] for w in gates]
    wo = [w[2 + c:2 + c + d] for w in gates]
    wd = [w[2 + c + d:] for w in gates]
    whg = [wh[:, i * d:(i + 1) * d] for i in range(3)]
    big = [gp["bi"][i * d:(i + 1) * d][None] for i in range(3)]
    bhg = [gp["bh"][i * d:(i + 1) * d][None] for i in range(3)]
    heads_w = jnp.concatenate(
        [p_ioc["score"]["w"], p_ioc["gate"]["w"], p_ioc["delta"]["w"]],
        axis=-1)
    heads_b = jnp.concatenate(
        [p_ioc["score"]["b"], p_ioc["gate"]["b"], p_ioc["delta"]["b"]])

    band = _social_band_default()
    batch_wgrad = _batch_wgrad_default()
    # lane-block-batched social (ioc_fused._social_kc_default): recompute +
    # softmax/position adjoints on (kc, A, A); the frozen-attention path
    # keeps its deferred dense adjoint. kc >= 8 guard as in the forward
    # (the batched form loses at small kc — r5 matrix).
    kcb = (_social_kc_default() and kc >= 8
           and not band and not social_freeze)
    kernel = functools.partial(
        _kernel, num_refine=nr, delta_scale=float(delta_scale),
        grid_g=int(g), cd=cd, a_dim=a, kc=kc,
        tent_mm=_tent_mm_default(), social_freeze=bool(social_freeze),
        fused_loop=_fused_loop_default(), band=band,
        batch_wgrad=batch_wgrad, kcb=kcb)

    def bk(shape, imap):
        return pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM)

    plane = lambda bi, ci: (bi, ci, 0, 0)
    block5 = lambda bi, ci: (bi, ci, 0, 0, 0)
    per_b = lambda bi, ci: (bi, 0, 0)
    pc4 = lambda bi, ci: (bi, ci, 0, 0)

    n_w = lambda: bk(None, None)
    outs = pl.pallas_call(
        kernel,
        grid=(b, chunks),
        in_specs=[
            bk((1, 1, nr + 1, t, rows), block5),           # levels x
            bk((1, 1, nr + 1, t, rows), block5),           # levels y
            bk((1, 1, t, rows, d), block5),                # dec
            bk((1, 1, t, rows, d), block5),                # msg
            bk((1, g * g, c), per_b),                      # fmap
            bk((1, 1, rows), per_b),                       # live
            bk((1, t, rows), per_b),                       # fmask
        ] + [n_w() for _ in range(22)] + [
            pl.BlockSpec((1, 4), lambda bi, ci: (0, 0),
                         memory_space=pltpu.SMEM),         # heads_b
            pl.BlockSpec((1, 1), lambda bi, ci: (0, 0),
                         memory_space=pltpu.SMEM),         # ltau
            bk((1, 1, t, rows), plane),                    # g refined x
            bk((1, 1, t, rows), plane),                    # g refined y
            bk((1, 1, 1, rows), pc4),                      # g scores
            bk((1, 1, nr, t, rows), block5),               # g iters x
            bk((1, 1, nr, t, rows), block5),               # g iters y
        ],
        out_specs=[
            bk((1, 1, t, rows), plane),                    # d traj x
            bk((1, 1, t, rows), plane),                    # d traj y
            bk((1, 1, t, rows, d), block5),                # d dec
            bk((1, 1, t, rows, d), block5),                # d msg
            bk((1, 1, g * g, c), pc4),                     # d fmap
            bk((1, 1, 8, d), pc4),                         # d wv
            bk((1, 1, 3 * c, d), pc4),                     # d ws
            bk((1, 1, 3 * d, d), pc4),                     # d wo
            bk((1, 1, 3 * d, d), pc4),                     # d wd
            bk((1, 1, 3 * d, d), pc4),                     # d wh
            bk((1, 1, 8, d), pc4),                         # d bi
            bk((1, 1, 8, d), pc4),                         # d bh
            bk((1, 1, 8, d), pc4),                         # d heads w
            bk((1, 1, 8, 8), pc4),                         # d heads b
            bk((1, 1, 8, 128), pc4),                       # d ltau
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, chunks, t, rows), f32),
            jax.ShapeDtypeStruct((b, chunks, t, rows), f32),
            jax.ShapeDtypeStruct((b, chunks, t, rows, d), f32),
            jax.ShapeDtypeStruct((b, chunks, t, rows, d), f32),
            jax.ShapeDtypeStruct((b, chunks, g * g, c), f32),
            jax.ShapeDtypeStruct((b, chunks, 8, d), f32),
            jax.ShapeDtypeStruct((b, chunks, 3 * c, d), f32),
            jax.ShapeDtypeStruct((b, chunks, 3 * d, d), f32),
            jax.ShapeDtypeStruct((b, chunks, 3 * d, d), f32),
            jax.ShapeDtypeStruct((b, chunks, 3 * d, d), f32),
            jax.ShapeDtypeStruct((b, chunks, 8, d), f32),
            jax.ShapeDtypeStruct((b, chunks, 8, d), f32),
            jax.ShapeDtypeStruct((b, chunks, 8, d), f32),
            jax.ShapeDtypeStruct((b, chunks, 8, 8), f32),
            jax.ShapeDtypeStruct((b, chunks, 8, 128), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((t, rows, d), f32),                 # gir
            pltpu.VMEM((t, rows, d), f32),                 # giz
            pltpu.VMEM((t, rows, d), f32),                 # gin
            pltpu.VMEM((t, rows, d), f32),                 # hs
            # attention w: (T, rows, A) under band (DESIRE_SOCIAL_BAND) or
            # lane-block-batched (DESIRE_SOCIAL_KC; stored as the (rows, A)
            # leading-merge of (kc, A, A)), full (T, rows, rows) else
            pltpu.VMEM((t, rows, a if (band or kcb) else rows), f32),
            pltpu.VMEM((t, rows, c), f32),                 # scene
            pltpu.VMEM((t, rows, d), f32),                 # social
            pltpu.VMEM((t, rows), f32),                    # x plane
            pltpu.VMEM((t, rows), f32),                    # y plane
            pltpu.VMEM((t, rows), f32),                    # g x
            pltpu.VMEM((t, rows), f32),                    # g y
            pltpu.VMEM((rows, d), f32),                    # dh carry
            pltpu.VMEM((rows, d), f32),                    # h carry
            pltpu.VMEM((t, rows, d), f32),                 # dh seeds
            pltpu.VMEM((t, rows, 3 * d), f32),             # dec projection
            # d_soc buckets (refine / score) for the deferred frozen-
            # attention adjoint; dummy-sized when social_freeze is off
            pltpu.VMEM((t, rows, d) if social_freeze else (1, 8, 128), f32),
            pltpu.VMEM((t, rows, d) if social_freeze else (1, 8, 128), f32),
            # banded-attention recompute planes (xband/yband/d2band) for
            # the softmax adjoint; dummy-sized when band is off
            pltpu.VMEM((t, rows, a) if band else (1, 8, 128), f32),
            pltpu.VMEM((t, rows, a) if band else (1, 8, 128), f32),
            pltpu.VMEM((t, rows, a) if band else (1, 8, 128), f32),
            # staged head cotangents for the batched weight contractions
            pltpu.VMEM((t, rows, 8) if batch_wgrad else (1, 8, 128), f32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(lev_x, lev_y, dec_cm, msg_cm, fmap_flat, live_t, fmask_t,
      wv[0], wv[1], wv[2], ws[0], ws[1], ws[2],
      wo[0], wo[1], wo[2], wd[0], wd[1], wd[2],
      whg[0], whg[1], whg[2],
      big[0], big[1], big[2], bhg[0], bhg[1], bhg[2],
      heads_w, heads_b[None], ltau,
      grx_x, grx_y, gsc, gi_cm_x, gi_cm_y)

    (dtx, dty, ddec_cm, dmsg_cm, dfmap_cm, dwv_p, dws_p, dwo_p, dwd_p,
     dwh_p, dbi_p, dbh_p, dhw_p, dhb_p, dltau_p) = outs

    def from_chunk_major(arr):
        trailing = arr.shape[4:]
        arr = arr.reshape(b, chunks, t, kc, a, *trailing)
        arr = jnp.moveaxis(arr, (4, 1, 3, 2), (1, 2, 3, 4))
        return arr.reshape(b, a, k, t, *trailing)

    d_traj = from_chunk_major(jnp.stack([dtx, dty], axis=-1))[:, :a_orig]
    d_dec = from_chunk_major(ddec_cm)[:, :a_orig].astype(cd)
    d_msg = from_chunk_major(dmsg_cm)[:, :a_orig].astype(cd)
    d_fmap = jnp.sum(dfmap_cm, axis=1).reshape(b, g, g, c).astype(
        feat_map.dtype)

    # weight partials: sum over (batch, chunk) programs, then reassemble
    dwv = jnp.sum(dwv_p, axis=(0, 1))                      # (8, d)
    dws = jnp.sum(dws_p, axis=(0, 1))                      # (3C, d)
    dwo = jnp.sum(dwo_p, axis=(0, 1))
    dwd = jnp.sum(dwd_p, axis=(0, 1))
    dwh = jnp.sum(dwh_p, axis=(0, 1))
    dbi = jnp.sum(dbi_p, axis=(0, 1))
    dbh = jnp.sum(dbh_p, axis=(0, 1))
    dhw = jnp.sum(dhw_p, axis=(0, 1))
    dhb = jnp.sum(dhb_p, axis=(0, 1))
    d_ltau = jnp.sum(dltau_p, axis=(0, 1))[0, 0]

    wdt = gp["wi"].dtype
    wi_grad = jnp.concatenate([
        jnp.concatenate([dwv[2 * i:2 * i + 2], dws[i * c:(i + 1) * c],
                         dwo[i * d:(i + 1) * d], dwd[i * d:(i + 1) * d]],
                        axis=0)
        for i in range(3)], axis=1).astype(wdt)            # (F, 3d)
    # dwh blocks are h_prev^T @ d_gate = (d_in, d_gate) — wh orientation
    wh_grad = jnp.concatenate([dwh[i * d:(i + 1) * d]
                               for i in range(3)], axis=1).astype(wdt)
    bi_grad = jnp.concatenate([dbi[i] for i in range(3)]).astype(wdt)
    bh_grad = jnp.concatenate([dbh[i] for i in range(3)]).astype(wdt)
    grads_gru = {"wi": wi_grad, "wh": wh_grad, "bi": bi_grad, "bh": bh_grad}
    grads_heads = {
        "score": {"w": dhw[0:1].swapaxes(0, 1).astype(wdt),
                  "b": dhb[0:1, 0].astype(wdt)},
        "gate": {"w": dhw[1:2].swapaxes(0, 1).astype(wdt),
                 "b": dhb[1:2, 0].astype(wdt)},
        "delta": {"w": dhw[2:4].swapaxes(0, 1).astype(wdt),
                  "b": dhb[2:4, 0].astype(wdt)},
    }
    return (d_traj, d_dec, d_msg, d_fmap, grads_gru, grads_heads,
            d_ltau.astype(wdt))
