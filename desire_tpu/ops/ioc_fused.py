"""Pallas TPU kernel: the ENTIRE IOC rank-and-refine loop, fused.

The north-star spec names the IOC module ("score-accumulating GRU +
iterative trajectory deltas") as a fused-kernel target. XLA cost analysis
of the full inference program (B=64, A=60, K=20, T=12) shows why: the
model is HBM-bandwidth-bound (arithmetic intensity ~21 flops/byte against
a v5e balance point of ~240), and ~80% of the bytes are the IOC/SCF
refinement iterations — each XLA iteration re-materializes the fused
feature tensor (B,A,K,T,130), the social-attention maps (B,K*T,A,A), the
score-GRU hidden states, and their layout transposes, ~9 GB of traffic
per iteration. The per-(batch, lane) working set, however, is tiny:
msg/dec_h tiles (A,T,d), a (G^2,C) scene map, and the GRU weights — a few
hundred KB. So the whole loop fits in VMEM.

This kernel runs ALL of `ioc_forward` (num_refine iterations + the final
re-score) for one (batch, hypothesis-lane) pair per grid program:

    for _ in range(num_refine):
        vel, scene, social = fuse_context(traj)        # in VMEM
        hs = score_gru(vel | scene | social | dec_h)   # T-step recurrence
        traj += tanh(delta(hs)) * sigmoid(gate(hs)) * scale * mask
    scores = sum_t psi(score_gru(...)) * mask          # final re-score

HBM traffic for the whole stage drops to one read of traj/dec_h/msg/
feat_map + one write of (refined traj, scores) — ~200 MB at flagship
shapes vs ~40 GB for the unfused XLA program.

Mosaic lessons encoded here (each was a compile failure or a
compile-time explosion at A=60):
* dynamic time indexing must land on a LEADING (untiled) dim — all
  per-step state is time-major (T, A, ·);
* positions are kept as separate x/y (T, A) planes: any tensor whose
  minor dim is 2 (positions/velocities/deltas as (..., 2)) spends its
  tile 126/128 empty and the relayouts around it blow up compile time
  superlinearly in A (observed: 1.3 s at A=16 -> >9 min at A=60);
* reductions may not produce 1-D (implicit-dim) outputs — keepdims, or
  reduce a full tensor and slice after;
* no lane-dim concats at non-tile-aligned offsets — the input-gate
  projection distributes over the four feature blocks instead (which is
  also cheaper, and lets the iteration-invariant dec_h block hoist out
  of the refinement loop).

Semantics mirror models/ioc.py + models/scf.py exactly (same gate order
as layers.gru_step, same align-corners bilinear pooling as
scf.bilinear_pool — realized as an exact one-hot matmul, the technique
of ops/scene_pool.py — same -1e9 masking + self-exclusion + dead-row
zeroing as scf.social_pool, same final-re-score-on-frozen-traj). One
deliberate deviation, a precision upgrade: squared distances and the
softmax run in f32 even under bf16 compute.

Inference-only: the XLA path in models/ioc.py remains the training path
(this kernel defines no VJP; refinement gradients flow through the
unfused program where jax.checkpoint can rematerialize it).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _precision_for(dtype):
    return (jax.lax.Precision.HIGHEST if dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)


def _mm(a, b, cd, precision):
    """MXU matmul in the model's compute dtype, f32 accumulate."""
    return jnp.dot(a.astype(cd), b.astype(cd),
                   preferred_element_type=jnp.float32, precision=precision)


def _kernel(tx_ref, ty_ref, dec_ref, msg_ref, fmap_ref, live_ref, fmask_ref,
            wiv_ref, wis_ref, wio_ref, wid_ref, wh_ref, bi_ref, bh_ref,
            heads_w_ref, heads_b_ref, ltau_ref,
            out_x_ref, out_y_ref, out_sc_ref,
            msg_scr, soc_scr, scene_scr, gi_scr, hs_scr, x_scr, y_scr,
            fmask_scr, h_scr,
            *, num_refine, delta_scale, grid_g, cd):
    t_len, a_dim = fmask_ref.shape[1], fmask_ref.shape[2]
    d = wh_ref.shape[0]
    precision = _precision_for(cd)

    dec = jnp.swapaxes(dec_ref[0, :, 0], 0, 1)            # (T, A, d)
    fmap = fmap_ref[0]                                    # (G*G, C)
    live = live_ref[0].astype(jnp.float32)                # (1, A)
    # fmask lives in a scratch ref: per-step access needs pl.ds, and
    # Mosaic cannot dynamic-slice a loaded VALUE (only refs)
    tau = jnp.exp(ltau_ref[0, 0].astype(jnp.float32)) + 1e-4

    g2 = grid_g * grid_g
    p_flat = a_dim * t_len
    # bilinear sampling as TENT weights over the flat grid: the weight of
    # grid node (gy, gx) for a position (x, y) is
    #   max(0, 1-|x-gx|) * max(0, 1-|y-gy|)
    # — exactly the 4-corner bilinear weights (align-corners, clipped), but
    # ~3 elementwise ops instead of four one-hot compare/select rounds. The
    # per-STEP (A, G^2) shape matters as much as the formula: a fully
    # unrolled (A*T, G^2) build is ~15-20k native vector instructions and
    # crashes/hangs the Mosaic compiler.
    col = jax.lax.broadcasted_iota(jnp.int32, (a_dim, g2), 1)
    col_y = (col // grid_g).astype(jnp.float32)
    col_x = (col - (col // grid_g) * grid_g).astype(jnp.float32)

    def scene_step(x, y):
        """(1, A) position planes -> (A, C) scene features at step t."""
        xs = jnp.swapaxes(jnp.clip(x, 0.0, 1.0), 0, 1) * (grid_g - 1)
        ys = jnp.swapaxes(jnp.clip(y, 0.0, 1.0), 0, 1) * (grid_g - 1)
        hot = (jnp.maximum(0.0, 1.0 - jnp.abs(xs - col_x))
               * jnp.maximum(0.0, 1.0 - jnp.abs(ys - col_y)))  # (A, G^2)
        return _mm(hot, fmap, cd, precision)              # (A, C)

    eye = jnp.eye(a_dim, dtype=bool)
    livej = live > 0                                      # (1, A)
    nb_ok = (jnp.sum((~eye & livej).astype(jnp.float32), axis=-1,
                     keepdims=True) > 0).astype(jnp.float32)   # (A, 1)

    wh = wh_ref[:]
    bi = bi_ref[:].astype(jnp.float32)
    bh = bh_ref[:].astype(jnp.float32)
    gi_dec = _mm(dec.reshape(p_flat, d), wid_ref[:], cd, precision)

    wiv = wiv_ref[:].astype(jnp.float32)                  # (2, 3d)

    def feat_step(t, _):
        """Per-step context features at step t: social attention ->
        soc_scr, tent-bilinear scene pooling -> scene_scr, and the
        velocity block of the input projection -> gi_scr.

        Social: f32 softmax; d2 via |yi|^2+|yj|^2-2 yi.yj with
        per-coordinate outer products — no (A, A, 2) tensor, no 2-wide
        contractions. Velocity runs here (not batched) because the batched
        form needs a (T, A) -> (T*A, 1) reshape, and any reshape that moves
        data between the lane and sublane dims unrolls into per-element
        moves at Mosaic compile time — the skeleton with just those
        reshapes took >9 min to compile at A=60."""
        x = x_scr[pl.ds(t, 1)]                            # (1, A)
        y = y_scr[pl.ds(t, 1)]
        xT = jnp.swapaxes(x, 0, 1)                        # (A, 1)
        yT = jnp.swapaxes(y, 0, 1)
        sq = x * x + y * y                                # (1, A)
        gram = xT * x + yT * y                            # (A, A) broadcast
        d2 = jnp.swapaxes(sq, 0, 1) + sq - 2.0 * gram
        logits = jnp.where(eye | ~livej, -1e9, -d2 / tau)
        w = jax.nn.softmax(logits, axis=-1) * nb_ok
        mt = msg_scr[pl.ds(t, 1)][0]                      # (A, d)
        soc_scr[pl.ds(t, 1)] = _mm(w, mt, cd, precision)[None]
        scene_scr[pl.ds(t, 1)] = scene_step(x, y)[None]
        tp = jnp.maximum(t - 1, 0)
        vx = jnp.swapaxes(x - x_scr[pl.ds(tp, 1)], 0, 1)  # (A, 1); 0 at t=0
        vy = jnp.swapaxes(y - y_scr[pl.ds(tp, 1)], 0, 1)
        gi_scr[pl.ds(t, 1)] = (vx * wiv[0:1] + vy * wiv[1:2])[None]
        return 0

    def gru_step(t, _):
        # the recurrent state lives in h_scr, NOT in the fori carry: a
        # loop-carried (A, d) vector value makes Mosaic's compile time
        # explode once the surrounding body is non-trivial (hours at
        # A=60); the same state through a VMEM scratch compiles in seconds
        h = h_scr[:]
        gh = _mm(h, wh, cd, precision) + bh
        gi_t = gi_scr[pl.ds(t, 1)][0]                     # (A, 3d)
        i_r, i_z, i_n = jnp.split(gi_t, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(i_r + h_r)
        z = jax.nn.sigmoid(i_z + h_z)
        n = jnp.tanh(i_n + r * h_n)
        h = (1.0 - z) * n + z * h
        h_scr[:] = h
        hs_scr[pl.ds(t, 1)] = h[None]
        return 0

    def fuse_and_gru():
        """One full pass at (x_scr, y_scr) positions -> hs_scr filled.

        feat_step seeds gi_scr with the velocity block; the batched terms
        use only contiguous (T, A, d) -> (T*A, d) reshapes (minor dims
        untouched — the benign kind)."""
        jax.lax.fori_loop(0, t_len, feat_step, 0)
        gi = (gi_scr[:].reshape(p_flat, 3 * d)
              + _mm(scene_scr[:].reshape(p_flat, -1), wis_ref[:], cd,
                    precision)
              + _mm(soc_scr[:].reshape(p_flat, d), wio_ref[:], cd, precision)
              + gi_dec + bi)
        gi_scr[:] = gi.reshape(t_len, a_dim, 3 * d)
        h_scr[:] = jnp.zeros((a_dim, d), jnp.float32)
        jax.lax.fori_loop(0, t_len, gru_step, 0)

    # heads packed (by the wrapper) into one (d, 4) matmul:
    # [score | gate | delta_x | delta_y]. Applied per STEP: the batched
    # form's (P, 1) <-> (T, A) column reshapes are lane<->sublane moves
    # (see feat_step comment).
    heads_w = heads_w_ref[:]
    heads_b = heads_b_ref[:].astype(jnp.float32)

    def delta_step(t, _):
        out = _mm(hs_scr[pl.ds(t, 1)][0], heads_w, cd,
                  precision) + heads_b                    # (A, 4)
        gate = jax.nn.sigmoid(out[:, 1:2])
        dx = jnp.swapaxes(jnp.tanh(out[:, 2:3]) * gate, 0, 1)  # (1, A)
        dy = jnp.swapaxes(jnp.tanh(out[:, 3:4]) * gate, 0, 1)
        m = fmask_scr[pl.ds(t, 1)] * delta_scale
        x_scr[pl.ds(t, 1)] = x_scr[pl.ds(t, 1)] + dx * m
        y_scr[pl.ds(t, 1)] = y_scr[pl.ds(t, 1)] + dy * m
        return 0

    def score_step(t, acc):
        out = _mm(hs_scr[pl.ds(t, 1)][0], heads_w, cd,
                  precision) + heads_b                    # (A, 4)
        psi = jnp.swapaxes(out[:, 0:1], 0, 1)             # (1, A)
        return acc + psi * fmask_scr[pl.ds(t, 1)]

    x_scr[:] = tx_ref[0, 0].astype(jnp.float32)
    y_scr[:] = ty_ref[0, 0].astype(jnp.float32)
    fmask_scr[:] = fmask_ref[0].astype(jnp.float32)
    msg_scr[:] = jnp.swapaxes(msg_ref[0, :, 0], 0, 1).astype(jnp.float32)

    # num_refine+1 passes with ONE fuse_and_gru instantiation: the final
    # pass skips the delta application (= ioc_forward's re-score of the
    # frozen refined trajectory). Two separate call sites double the
    # kernel body and push Mosaic's compile time over a cliff.
    def refine_iter(i, carry):
        fuse_and_gru()

        @pl.when(i < num_refine)
        def _():
            jax.lax.fori_loop(0, t_len, delta_step, 0)
        return carry

    jax.lax.fori_loop(0, num_refine + 1, refine_iter, 0)
    # hs_scr now holds the final pass -> accumulate the scores from it
    scores = jax.lax.fori_loop(0, t_len, score_step,
                               jnp.zeros((1, a_dim), jnp.float32))
    out_x_ref[0, 0] = x_scr[:]
    out_y_ref[0, 0] = y_scr[:]
    out_sc_ref[0, 0] = scores


def ioc_refine_fused(p_ioc, p_scf, traj, dec_h, msg, feat_map, live,
                     fut_mask, *, num_refine, delta_scale, interpret=False):
    """Fused rank-and-refine. Shapes follow models/ioc.ioc_forward:

    traj (B, A, K, T, 2) f32; dec_h/msg (B, A, K, T, d) compute dtype;
    feat_map (B, G, G, C); live (B, A); fut_mask (B, A, T).
    Returns (refined_traj (B, A, K, T, 2) f32, scores (B, A, K) f32).
    """
    b, a, k, t, _ = traj.shape
    # pad the agent axis to a sublane multiple: at ragged A (e.g. the SDD
    # flagship's 60) Mosaic's layout search degenerates — the same kernel
    # compiles in 1.5 s at A=64 and was killed after >9 min at A=60. Pad
    # agents are dead (live=0, fut_mask=0) and sliced off on the way out.
    a_orig = a
    a_pad = max(-(-a // 8) * 8, 8)
    if a_pad != a:
        pad = [(0, 0)] * 5
        pad[1] = (0, a_pad - a)
        traj = jnp.pad(traj, pad)
        dec_h = jnp.pad(dec_h, pad)
        msg = jnp.pad(msg, pad)
        live = jnp.pad(live, ((0, 0), (0, a_pad - a)))
        fut_mask = jnp.pad(fut_mask, ((0, 0), (0, a_pad - a), (0, 0)))
        a = a_pad
    d = dec_h.shape[-1]
    g = feat_map.shape[1]
    c = feat_map.shape[-1]
    gp = p_ioc["gru"][0]
    cd = dec_h.dtype
    fmap_flat = feat_map.reshape(b, g * g, c)
    ltau = p_scf["soc_logtau"].reshape(1, 1).astype(jnp.float32)
    # positions enter/leave the kernel as separate x/y (B, K, T, A) planes
    # (see the layout lessons in the module docstring); XLA does these
    # transposes once, outside the refinement loop
    tkta = jnp.transpose(traj.astype(jnp.float32), (0, 2, 3, 1, 4))
    tx, ty = tkta[..., 0], tkta[..., 1]                   # (B, K, T, A)
    fmask_t = jnp.swapaxes(fut_mask, 1, 2)                # (B, T, A)
    # split the input-gate matrix by feature block (fuse_context layout:
    # [vel(2) | scene(C) | social(d) | dec_h(d)]) and pack the three heads
    wi = gp["wi"]
    wi_v, wi_s, wi_o, wi_d = (wi[:2], wi[2:2 + c],
                              wi[2 + c:2 + c + d], wi[2 + c + d:])
    heads_w = jnp.concatenate(
        [p_ioc["score"]["w"], p_ioc["gate"]["w"], p_ioc["delta"]["w"]],
        axis=-1)
    heads_b = jnp.concatenate(
        [p_ioc["score"]["b"], p_ioc["gate"]["b"], p_ioc["delta"]["b"]])

    kernel = functools.partial(
        _kernel, num_refine=int(num_refine),
        delta_scale=float(delta_scale), grid_g=int(g), cd=cd)

    def bk(shape, imap):
        return pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM)

    lane5 = lambda bi, ki: (bi, 0, ki, 0, 0)  # (B, A, K, T, ·) blocks
    plane = lambda bi, ki: (bi, ki, 0, 0)     # (B, K, T, A) planes
    per_b = lambda bi, ki: (bi, 0, 0)
    out_x, out_y, scores = pl.pallas_call(
        kernel,
        grid=(b, k),
        in_specs=[
            bk((1, 1, t, a), plane),                         # traj x
            bk((1, 1, t, a), plane),                         # traj y
            bk((1, a, 1, t, d), lane5),                      # dec_h
            bk((1, a, 1, t, d), lane5),                      # msg
            bk((1, g * g, c), per_b),                        # feat_map
            bk((1, 1, a), per_b),                            # live (B, 1, A)
            bk((1, t, a), per_b),                            # fut_mask (T-maj)
            bk(None, None),                                  # wi_v
            bk(None, None),                                  # wi_s
            bk(None, None),                                  # wi_o
            bk(None, None),                                  # wi_d
            bk(None, None),                                  # wh
            bk(None, None),                                  # bi
            bk(None, None),                                  # bh
            bk(None, None),                                  # heads_w
            bk(None, None),                                  # heads_b
            pl.BlockSpec((1, 1), lambda bi, ki: (0, 0),
                         memory_space=pltpu.SMEM),           # log-tau
        ],
        out_specs=[
            bk((1, 1, t, a), plane),
            bk((1, 1, t, a), plane),
            bk((1, 1, 1, a), lambda bi, ki: (bi, ki, 0, 0)), # scores
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, k, t, a), jnp.float32),
            jax.ShapeDtypeStruct((b, k, t, a), jnp.float32),
            jax.ShapeDtypeStruct((b, k, 1, a), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((t, a, d), jnp.float32),        # social messages
            pltpu.VMEM((t, a, d), jnp.float32),        # social context
            pltpu.VMEM((t, a, c), jnp.float32),        # scene features
            pltpu.VMEM((t, a, 3 * d), jnp.float32),    # input gates
            pltpu.VMEM((t, a, d), jnp.float32),        # GRU hiddens
            pltpu.VMEM((t, a), jnp.float32),           # x plane
            pltpu.VMEM((t, a), jnp.float32),           # y plane
            pltpu.VMEM((t, a), jnp.float32),           # future mask
            pltpu.VMEM((a, d), jnp.float32),           # GRU state
        ],
        interpret=interpret,
    )(tx, ty, dec_h, msg, fmap_flat, live[:, None, :], fmask_t,
      wi_v, wi_s, wi_o, wi_d, gp["wh"], gp["bi"], gp["bh"],
      heads_w, heads_b, ltau)
    refined = jnp.stack([out_x, out_y], axis=-1)          # (B, K, T, A, 2)
    refined = jnp.transpose(refined, (0, 3, 1, 2, 4))     # (B, A, K, T, 2)
    return (refined[:, :a_orig],
            jnp.moveaxis(scores[:, :, 0], 1, 2)[:, :a_orig])   # (B, A, K)
