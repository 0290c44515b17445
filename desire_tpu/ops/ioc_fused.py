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
re-score) for a CHUNK of KC hypothesis lanes of one batch row per grid
program:

    for _ in range(num_refine):
        vel, scene, social = fuse_context(traj)        # in VMEM
        hs = score_gru(vel | scene | social | dec_h)   # T-step recurrence
        traj += tanh(delta(hs)) * sigmoid(gate(hs)) * scale * mask
    scores = sum_t psi(score_gru(...)) * mask          # final re-score

HBM traffic for the whole stage drops to one read of traj/dec_h/msg/
feat_map + one write of (refined traj, scores) — ~200 MB at flagship
shapes vs ~40 GB for the unfused XLA program. Lane chunking exists
because the fused stage is LATENCY-bound, not byte-bound (unchunked:
B*K=1280 programs x 5 passes x (12 attention + 12 GRU) sequential tiny
ops = 175 ms full forward at 10% HBM / 3% MXU): KC lanes per program
divides the sequential-op total by KC, with the per-step social
attention over all KC lanes batched into ONE block-diagonal
(KC*A, KC*A) masked softmax + ONE (KC*A, KC*A) @ (KC*A, d) matmul —
cross-lane weights are masked to zero, so the block-diagonal matmul
computes exactly the per-lane pools.

Mosaic lessons encoded here (each was a compile failure or a
compile-time explosion at A=60):
* dynamic time indexing must land on a LEADING (untiled) dim — all
  per-step state is time-major (T, rows, ·);
* PAD RAGGED DIMS: at the SDD flagship's A=60 the layout search
  degenerates (>9 min, killed) — padded to 64 the same kernel compiles
  in 1.5 s. The wrapper pads agents to a sublane multiple (dead agents,
  masked, sliced off on the way out);
* positions are kept as separate x/y (T, rows) planes: any tensor whose
  minor dim is 2 (positions as (..., 2)) spends its tile 126/128 empty
  and the relayouts around it blow up compile time;
* no lane<->sublane reshapes like (T, rows) -> (T*rows, 1) — they unroll
  into per-element moves at compile time; columns are extracted per-step
  with small (1, rows) <-> (rows, 1) transposes instead;
* reductions may not produce 1-D (implicit-dim) outputs — keepdims, or
  reduce a full tensor and slice after;
* no lane-dim concats at non-tile-aligned offsets — the input-gate
  projection distributes over the four feature blocks instead (which is
  also cheaper, and lets the iteration-invariant dec_h block hoist out
  of the refinement loop), and the per-lane masks are tiled by the
  wrapper in XLA, never concatenated in-kernel.

Semantics mirror models/ioc.py + models/scf.py exactly (same gate order
as layers.gru_step, same align-corners bilinear pooling as
scf.bilinear_pool — realized as exact TENT weights over the flat grid,
max(0,1-|x-gx|)*max(0,1-|y-gy|), the bilinear weights without the
4-corner one-hot build that crashed the Mosaic compiler at (A*T, G^2) —
same -1e9 masking + self-exclusion + dead-row zeroing as
scf.social_pool, same final-re-score-on-frozen-traj). One deliberate
deviation, a precision upgrade: squared distances and the softmax run
in f32 even under bf16 compute.

Training: the same kernel (collect_iters=True) is the forward of
make_trainable_fused_ioc; the custom VJP's backward is either an XLA
recompute or the fused Pallas backward in ops/ioc_bwd.py (default —
gradient-parity tested against jax.grad of the XLA path).
"""

from __future__ import annotations

import functools
import os

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


def _tent_mm_default():
    """Factorized scene-tent build switch (see scene_step in _kernel).

    Env-overridable for on-chip A/B sweeps: DESIRE_TENT_MM=0/1.
    Measured (r4 A/B, v5e, B=64 A=60 K=20): 79.0 ms fwd vs 59.2 ms for the
    direct build — the one-hot expansion matmuls cost more than the wide
    VPU passes they remove; stays off."""
    return os.environ.get("DESIRE_TENT_MM", "0") == "1"


def _tent_bf16_default():
    """Build the wide (rows, G^2) tent product in the compute dtype instead
    of f32 (DESIRE_TENT_BF16=1): halves the dominant per-pass VPU element
    passes when compute is bf16. Positions quantize to ~2^-9 of the grid
    span (~3% worst-case tent-weight error feeding an already-bf16 matmul);
    numerics-checked by A/B eval before any default flip."""
    return os.environ.get("DESIRE_TENT_BF16", "0") == "1"


def _social_band_default():
    """Banded social attention (DESIRE_SOCIAL_BAND=1): every lane block's
    row attends only to the A agents of its OWN block, so the wide
    (rows, rows) distance/softmax work — ~12 ms of the 60 ms forward by
    in-kernel ablation, the kernel's largest VPU stage — carries a kc x
    redundancy (kc = lanes per chunk, 5 at flagship shapes). The band
    form computes d2/softmax on (rows, A) instead:

        xband[r, j] = x[blk(r)*A + j]   (exact f32 selection matmul:
                                         block-select @ (xT * one-hot),
                                         HIGHEST precision = bf16x3,
                                         exact for 1.0-weight copies)
        d2band      = |p_r - p_{blk(r),j}|^2        on (rows, A)
        w           = softmax(-d2band/tau) * masks  on (rows, A)

    and expands w back to the block-diagonal (rows, rows) matrix with one
    constant one-hot matmul + mask multiply, so the message pooling stays
    ONE MXU matmul with bitwise-identical accumulation (cross-block
    weights are exact zeros, contributing exact-zero products). The
    backward kernel mirrors the banding for the softmax adjoint and
    shrinks its (T, rows, rows) attention scratch to (T, rows, A).
    Numerics: the banded softmax sees the same non-excluded logits and
    exp(-1e9 - max) underflows to exactly 0.0 in f32; the only delta vs
    the full form is the softmax denominator's reduction-tree pairing
    (A vs rows summands, the rest exact zeros) — ~1 ULP, parity-tested
    at 1e-5/1e-6 in tests/test_kernels.py.

    Measured (r4 on-chip A/B, v5e, B=64 A=60 K=20): LOSES — fwd 86.8 vs
    61.1 ms, train 328.0 vs 242.8 ms/step. The two exact selection
    matmuls + band re-expansion per step ADD serial ops to an op-issue-
    latency-bound loop; shrinking the VPU element count doesn't pay when
    elements aren't the constraint. Default off, kept for the record."""
    return os.environ.get("DESIRE_SOCIAL_BAND", "0") == "1"


def _msg_inkernel_default():
    """Compute the social messages msg = dec_h @ W + b INSIDE the kernel
    (DESIRE_MSG_INKERNEL=1, inference path only): msg is pass-invariant, so
    pass 0 projects each step's dec tile into a (T, rows, d) VMEM scratch
    (the same write-then-read-in-iteration pattern as the dec-gate
    projection). This deletes the XLA-side social_messages einsum, the
    agent-pad and the chunk-major transpose of the (B, A, K, T, d) msg
    tensor — ~half of the ~8 ms of XLA glue around the kernel in the r4
    device trace (docs/traces/r4_fwd_trace.json.gz). Numerics: the XLA
    dense is a cd-output dot (f32 MXU accumulate, rounded to cd) + cd bias
    — the kernel reproduces exactly that (f32 accumulate, cast, add).
    Training keeps the explicit-msg path: the backward kernel consumes msg
    as an operand and the soc_msg parameter gradients chain through the
    XLA einsum either way.

    Measured (r4 on-chip A/B, v5e, B=64 A=60 K=20): fwd 59.3 vs 61.1 ms
    (1.30M vs 1.26M traj/s) — DEFAULT ON since round 4."""
    return os.environ.get("DESIRE_MSG_INKERNEL", "1") == "1"


def _social_tb_default():
    """T-blocked social attention (DESIRE_SOCIAL_TB=N, inference path
    only): instead of running the distance/softmax chain once per step
    inside the recurrent T-loop, a pre-loop computes the attention for N
    steps at a time on one (N*rows, rows) tile and stages the pooled
    messages in a (T, rows, d) scratch the GRU loop then reads. The
    social stage is the kernel's largest VPU stage (~12 ms of the 60 ms
    forward by in-kernel ablation) and the kernel is op-ISSUE-latency
    bound, not element bound (the band/ablation lessons): batching N
    steps divides the stage's serial-op count by ~N at identical element
    throughput, which is exactly the regime where this kernel wins.

    Bitwise-neutral by construction: the block form broadcasts each
    step's positions with exact one-hot-copy matmuls (HIGHEST precision,
    single-nonzero rows), extracts the per-row position with an exact
    one-hot row-sum, and composes d2/softmax/nb-zeroing/pooling with the
    SAME ops in the SAME order as the per-step path — parity-tested
    exactly in tests/test_kernels.py. N is clamped to a divisor of T;
    N=1 keeps the per-step path. Applies to the fused-loop inference
    forward (incl. social_freeze pass-0); the trainable collect_iters
    forward and the band variant keep their measured paths."""
    return int(os.environ.get("DESIRE_SOCIAL_TB", "1"))


def _social_kc_default():
    """Lane-block-BATCHED social attention (DESIRE_SOCIAL_KC=1, inference
    path only): the dense (rows, rows) distance/softmax computes kc^2
    lane-block tiles of which only the kc diagonal blocks carry nonzero
    weights (attention is per-lane block-diagonal) — a kc-fold VPU-element
    waste that also explains why the 640-row chunk did NOT win the r5
    sweep (social elements grow with rows^2 and cancel the cell-count
    halving). This variant reshapes the (rows, 1) position/live columns
    into (kc, A, 1) leading-split views (free), forms the (kc, A, A)
    batched distance/softmax directly, and pools with ONE batched
    dot_general — same math, ~kc x fewer VPU elements, no selection
    matmuls (the band variant's failure mode). Mathematically identical
    to the dense path (cross-block exp(-1e9) underflows to exactly 0);
    parity-tested. Applies where kc >= 8 (the batched-dot overhead needs a
    big enough element saving — the r5 matrix measured 51.65 vs 53.07 ms
    at kc=20/1280 rows WIN, 60.5 vs 59.2 ms at kc=5/320 rows LOSS, and
    44.35 ms with social_freeze at 1280); mutually exclusive with
    band/T-block. DEFAULT ON since round 5."""
    return os.environ.get("DESIRE_SOCIAL_KC", "1") == "1"


def _fused_loop_default():
    """Fuse the per-step feature build, GRU update, pass-0 dec projection
    and final-pass score accumulation into ONE T-loop, in the forward AND
    the backward recompute (DESIRE_IOC_FUSED_LOOP=0 keeps the staged
    multi-loop structure for A/B; both directions are bitwise-identical,
    parity-tested).

    Measured (r4 on-chip A/B, v5e, B=64 A=60 K=20): fwd 60.5 vs 59.5 ms
    staged (within noise — per-iteration LOOP overhead is NOT the
    kernel's cost; per-cell time is bound by the op dependency chain),
    but TRAIN 227.8 vs 235.1 ms/step — the backward's single recompute
    loop and the freed (T, rows, 3d) gi scratch win 7 ms. The freed
    scratch also lets the social_freeze inference forward back to 320
    rows (probed; see _pick_chunk). Default stays on."""
    return os.environ.get("DESIRE_IOC_FUSED_LOOP", "1") == "1"


def _ablate_default():
    """BENCH-ONLY stage ablation (DESIRE_IOC_ABLATE=scene|social): skips
    that stage's per-step work inside the kernel so its cost can be read
    off the fwd time — the in-kernel decomposition a trace cannot see
    (XLA shows one opaque custom call). CHANGES NUMERICS; never set for
    training/eval."""
    v = os.environ.get("DESIRE_IOC_ABLATE", "")
    assert v in ("", "scene", "social"), v
    return v


def _kernel(*refs, num_refine, delta_scale, grid_g, cd, a_dim, kc,
            collect_iters=False, tent_mm=False, tent_bf16=False,
            ablate="", social_freeze=False, fused_loop=True, band=False,
            msg_in=False, tblock=1, kcb=False):
    (tx_ref, ty_ref, dec_ref, msg_ref, fmap_ref, live_ref, fmask_ref,
     wiv_ref, wis_ref, wio_ref, wid_ref, wh_ref, bi_ref, bh_ref,
     heads_w_ref, heads_b_ref, ltau_ref) = refs[:17]
    # msg_in: the msg slot carries the (d, d) soc_msg WEIGHT instead of the
    # precomputed (1, 1, T, rows, d) messages; the bias rides one slot later
    base = 17
    if msg_in:
        bmsg_ref = refs[17]
        base = 18
    n_out = 5 if collect_iters else 3
    if collect_iters:
        (out_x_ref, out_y_ref, out_sc_ref,
         out_xi_ref, out_yi_ref) = refs[base:base + n_out]
    else:
        out_x_ref, out_y_ref, out_sc_ref = refs[base:base + n_out]
    scr = refs[base + n_out:]
    msg_scr = None
    if msg_in:
        *scr, msg_scr = scr
    soc_scr = None
    if social_freeze or tblock > 1:
        *scr, soc_scr = scr
    gi_scr = None
    if fused_loop:
        (hs_scr, x_scr, y_scr, fmask_scr, h_scr, gi_dec_scr) = scr
    else:
        (gi_scr, hs_scr, x_scr, y_scr, fmask_scr, h_scr, gi_dec_scr) = scr
    t_len = fmask_ref.shape[1]
    rows = kc * a_dim                       # lanes-in-chunk x agents
    d = wh_ref.shape[0]
    precision = _precision_for(cd)

    # dec/msg arrive (1, 1, T, rows, d) — chunk-major from the wrapper;
    # both are read per STEP from their refs (dynamic T index on a leading
    # dim), never materialized whole
    fmap = fmap_ref[0]                                    # (G*G, C)
    live = live_ref[0].astype(jnp.float32)                # (1, rows) tiled
    tau = jnp.exp(ltau_ref[0, 0].astype(jnp.float32)) + 1e-4

    g2 = grid_g * grid_g
    p_flat = rows * t_len
    if tent_mm:
        # Factorized tent build (perf): the bilinear weight is separable,
        # hot[r, gy*G+gx] = tent(xs[r]-gx) * tent(ys[r]-gy), so build the
        # two 1-D tents NARROW at (rows, G) — G lanes instead of G^2 — and
        # expand each to (rows, G^2) with a constant one-hot matmul on the
        # MXU (exact copies: one nonzero per column). The wide VPU work
        # per call drops from ~9 elementwise passes over (rows, G^2) f32
        # to ONE bf16 multiply; those passes are ~60% of a refine pass's
        # element-ops (RESULTS.md round-3 roofline). Numerics: the
        # original path casts the f32 tent product to the compute dtype
        # inside _mm anyway, so the only delta under bf16 is
        # round(tx)*round(ty) vs round(tx*ty) — second order.
        ncol = jax.lax.broadcasted_iota(
            jnp.int32, (rows, grid_g), 1).astype(jnp.float32)
        eg = jax.lax.broadcasted_iota(jnp.int32, (grid_g, g2), 1)
        ei = jax.lax.broadcasted_iota(jnp.int32, (grid_g, g2), 0)
        exp_x = ((eg - (eg // grid_g) * grid_g) == ei).astype(cd)  # (G,G^2)
        exp_y = ((eg // grid_g) == ei).astype(cd)

        def scene_step(xT, yT):
            """(rows, 1) position columns -> (rows, C) scene features."""
            xs = jnp.clip(xT, 0.0, 1.0) * (grid_g - 1)
            ys = jnp.clip(yT, 0.0, 1.0) * (grid_g - 1)
            tx = jnp.maximum(0.0, 1.0 - jnp.abs(xs - ncol))   # (rows, G)
            ty = jnp.maximum(0.0, 1.0 - jnp.abs(ys - ncol))
            # Mosaic requires a 32-bit matmul accumulator (bf16 acc fails
            # verification on real TPU); accumulate f32, cast the expanded
            # tents back to cd so the wide (rows, G^2) multiply runs packed
            hot = (jnp.dot(tx.astype(cd), exp_x,
                           preferred_element_type=jnp.float32,
                           precision=precision).astype(cd)
                   * jnp.dot(ty.astype(cd), exp_y,
                             preferred_element_type=jnp.float32,
                             precision=precision).astype(cd))
            return _mm(hot, fmap, cd, precision)          # (rows, C)
    else:
        tdt = cd if tent_bf16 else jnp.float32      # _tent_bf16_default
        col = jax.lax.broadcasted_iota(jnp.int32, (rows, g2), 1)
        col_y = (col // grid_g).astype(tdt)
        col_x = (col - (col // grid_g) * grid_g).astype(tdt)
        one = jnp.ones((), tdt)

        def scene_step(xT, yT):
            """(rows, 1) position columns -> (rows, C) scene features."""
            xs = (jnp.clip(xT, 0.0, 1.0) * (grid_g - 1)).astype(tdt)
            ys = (jnp.clip(yT, 0.0, 1.0) * (grid_g - 1)).astype(tdt)
            hot = (jnp.maximum(one * 0, one - jnp.abs(xs - col_x))
                   * jnp.maximum(one * 0, one - jnp.abs(ys - col_y)))
            return _mm(hot, fmap, cd, precision)          # (rows, C)

    # block-diagonal attention mask over the flat (lane, agent) rows:
    # attend only within the same lane block, never to self or dead agents
    r_id = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 0)
    c_id = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 1)
    if band:
        # banded-attention constants (_social_band_default): per-cell
        # one-time builds, amortized over every pass x step
        bsel = ((r_id // a_dim) == (c_id // a_dim)).astype(jnp.float32)
        rb = jax.lax.broadcasted_iota(jnp.int32, (rows, a_dim), 0)
        jb = jax.lax.broadcasted_iota(jnp.int32, (rows, a_dim), 1)
        selfb = (rb - (rb // a_dim) * a_dim) == jb        # (rows, A) bool
        gt = selfb.astype(jnp.float32)                    # row->band one-hot
        ja = jax.lax.broadcasted_iota(jnp.int32, (a_dim, rows), 0)
        ca = jax.lax.broadcasted_iota(jnp.int32, (a_dim, rows), 1)
        gexp = ((ca - (ca // a_dim) * a_dim) == ja).astype(cd)  # (A, rows)

        def _sel(m):
            """Exact banded selection: (rows, A)[r, j] = m-col of agent j in
            blk(r). HIGHEST = bf16x3, exact for 1.0-weight copy sums."""
            return jnp.dot(bsel, m, preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)

        liveband = _sel(jnp.swapaxes(live, 0, 1) * gt)    # (rows, A)
        exclband = selfb | (liveband <= 0)
        nb_ok = (jnp.sum(jnp.where(exclband, 0.0, 1.0), axis=-1,
                         keepdims=True) > 0).astype(jnp.float32)
    elif kcb:
        # lane-block-batched constants (_social_kc_default): the (rows, 1)
        # live column leading-splits to (kc, A, 1) for free; the exclusion
        # mask lives directly in batched (kc, A, A) form
        live_a = jnp.swapaxes(
            jnp.swapaxes(live, 0, 1).reshape(kc, a_dim, 1), 1, 2)
        ia3 = jax.lax.broadcasted_iota(jnp.int32, (kc, a_dim, a_dim), 1)
        ja3 = jax.lax.broadcasted_iota(jnp.int32, (kc, a_dim, a_dim), 2)
        excl_a = (ia3 == ja3) | (live_a <= 0)             # (kc, A, A)
        nb_ok_a = (jnp.sum(jnp.where(excl_a, 0.0, 1.0), axis=-1,
                           keepdims=True) > 0).astype(jnp.float32)
    else:
        excl = ((r_id // a_dim) != (c_id // a_dim)) | (r_id == c_id) | (
            live <= 0)                                        # (rows, rows)
        nb_ok = (jnp.sum(jnp.where(excl, 0.0, 1.0), axis=-1,
                         keepdims=True) > 0).astype(jnp.float32)   # (rows, 1)

    if tblock > 1:
        # T-block constants (_social_tb_default): the block tile stacks
        # tblock step-slabs along sublanes; rmod folds a block row back to
        # its in-slab row, so the exclusion/neighbor masks are exact tilings
        # of the per-step ones. rsel broadcasts each slab's (1, rows)
        # position vector to its rows sublanes (one-hot copy matmul); dsel
        # extracts the per-row position column (one-hot row-sum).
        tbr = tblock * rows
        rr = jax.lax.broadcasted_iota(jnp.int32, (tbr, rows), 0)
        cc = jax.lax.broadcasted_iota(jnp.int32, (tbr, rows), 1)
        rmod = rr - (rr // rows) * rows
        excl_blk = (((rmod // a_dim) != (cc // a_dim)) | (rmod == cc)
                    | (live <= 0))                            # (TBr, rows)
        nb_blk = (jnp.sum(jnp.where(excl_blk, 0.0, 1.0), axis=-1,
                          keepdims=True) > 0).astype(jnp.float32)
        dsel = (rmod == cc).astype(jnp.float32)               # (TBr, rows)
        rsel = (jax.lax.broadcasted_iota(jnp.int32, (tbr, tblock), 1)
                == (jax.lax.broadcasted_iota(
                    jnp.int32, (tbr, tblock), 0) // rows)).astype(
                        jnp.float32)                          # (TBr, TB)

    wh = wh_ref[:]
    bi = bi_ref[:].astype(jnp.float32)
    bh = bh_ref[:].astype(jnp.float32)
    wiv = wiv_ref[:].astype(jnp.float32)                  # (2, 3d)
    # heads packed (by the wrapper) into one (d, 4) matmul:
    # [score | gate | delta_x | delta_y], applied per step — the batched
    # form's (P, 1) <-> (T, rows) column reshapes are lane<->sublane moves
    heads_w = heads_w_ref[:]
    heads_b = heads_b_ref[:].astype(jnp.float32)

    def dec_step(t, _):
        # iteration-invariant dec_h projection (+bias), one step at a time:
        # batched (T*rows, 3d) ops unroll into ~6x more native instructions
        # (tile count), and TOTAL unrolled-instruction count is what blows
        # Mosaic's compile time past the cliff
        dec_t = dec_ref[0, 0, pl.ds(t, 1)][0]             # (rows, d)
        gi_dec_scr[pl.ds(t, 1)] = (_mm(dec_t, wid_ref[:], cd, precision)
                                   + bi)[None]
        if msg_in:
            # pass-invariant social messages (see _msg_inkernel_default):
            # reproduce the XLA dense exactly — f32 MXU accumulate rounded
            # to the compute dtype, then a compute-dtype bias add
            msg_scr[pl.ds(t, 1)] = (
                _mm(dec_t, msg_ref[:], cd, precision).astype(cd)
                + bmsg_ref[:].astype(cd))[None]
        return 0

    def compute_gi(t, ip):
        """Per-step input gates for ALL kc lanes at once: block-diagonal
        social attention + tent-bilinear scene pooling + velocity block,
        all projected and summed -> (rows, 3d). ip carries the
        refine-pass index (unchanged) for the social_freeze branch."""
        x = x_scr[pl.ds(t, 1)]                            # (1, rows)
        y = y_scr[pl.ds(t, 1)]
        xT = jnp.swapaxes(x, 0, 1)                        # (rows, 1)
        yT = jnp.swapaxes(y, 0, 1)

        def attend():
            if msg_in:
                mt = msg_scr[pl.ds(t, 1)][0].astype(jnp.float32)
            else:
                mt = msg_ref[0, 0, pl.ds(t, 1)][0].astype(jnp.float32)
            if band:
                # narrow (rows, A) distance/softmax + one-hot re-expansion
                # (bitwise-equal to the full form — _social_band_default)
                xb = _sel(xT * gt)                        # (rows, A)
                yb = _sel(yT * gt)
                sqb = xb * xb + yb * yb
                gramb = xT * xb + yT * yb
                d2 = (xT * xT + yT * yT) + sqb - 2.0 * gramb
                logits = jnp.where(exclband, -1e9, -d2 / tau)
                w = jax.nn.softmax(logits, axis=-1) * nb_ok   # (rows, A)
                wf = _mm(w, gexp, cd, precision) * bsel   # (rows, rows)
                return _mm(wf, mt, cd, precision)         # (rows, d)
            if kcb:
                # lane-block-batched (_social_kc_default): kc x fewer VPU
                # elements than the dense (rows, rows) form, same math
                # (cross-block exp(-1e9) underflows to exactly 0 there)
                dm = mt.shape[-1]
                mt_a = mt.reshape(kc, a_dim, dm)          # leading split
                xa = xT.reshape(kc, a_dim, 1)
                ya = yT.reshape(kc, a_dim, 1)
                xat = jnp.swapaxes(xa, 1, 2)              # (kc, 1, A)
                yat = jnp.swapaxes(ya, 1, 2)
                sqa = xa * xa + ya * ya                   # (kc, A, 1)
                d2 = (sqa + jnp.swapaxes(sqa, 1, 2)
                      - 2.0 * (xa * xat + ya * yat))      # (kc, A, A)
                logits = jnp.where(excl_a, -1e9, -d2 / tau)
                w = jax.nn.softmax(logits, axis=-1) * nb_ok_a
                pooled = jax.lax.dot_general(
                    w.astype(cd), mt_a.astype(cd),
                    (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                    precision=precision)                  # (kc, A, d)
                return pooled.reshape(rows, dm)
            sq = x * x + y * y                            # (1, rows)
            gram = xT * x + yT * y                        # (rows, rows)
            d2 = jnp.swapaxes(sq, 0, 1) + sq - 2.0 * gram
            logits = jnp.where(excl, -1e9, -d2 / tau)
            w = jax.nn.softmax(logits, axis=-1) * nb_ok
            # cross-block weights are exactly 0 -> one matmul pools all lanes
            return _mm(w, mt, cd, precision)              # (rows, d)

        if ablate == "social":                  # bench-only decomposition
            soc_t = None
        elif tblock > 1:
            # pooled messages staged by the T-block pre-loop (soc_block);
            # under social_freeze the pass-0 staging is simply not redone
            soc_t = soc_scr[pl.ds(t, 1)][0]
        elif social_freeze:
            # attend ONCE at the pass-0 (initial SGM) positions; later
            # passes reuse the pooled block (config.py social_freeze)
            @pl.when(ip == 0)
            def _():
                soc_scr[pl.ds(t, 1)] = attend()[None]
            soc_t = soc_scr[pl.ds(t, 1)][0]
        else:
            soc_t = attend()
        tp = jnp.maximum(t - 1, 0)
        vx = jnp.swapaxes(x - x_scr[pl.ds(tp, 1)], 0, 1)  # (rows, 1); 0 @t=0
        vy = jnp.swapaxes(y - y_scr[pl.ds(tp, 1)], 0, 1)
        gi = (vx * wiv[0:1] + vy * wiv[1:2]
              + gi_dec_scr[pl.ds(t, 1)][0])
        if ablate != "scene":
            gi = gi + _mm(scene_step(xT, yT), wis_ref[:], cd, precision)
        if soc_t is not None:
            gi = gi + _mm(soc_t, wio_ref[:], cd, precision)
        return gi

    def gru_update(gi_t):
        # recurrent state via h_scr, not a fori carry (loop-carried vector
        # values interact badly with Mosaic's layout search)
        h = h_scr[:]
        gh = _mm(h, wh, cd, precision) + bh
        i_r, i_z, i_n = jnp.split(gi_t, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(i_r + h_r)
        z = jax.nn.sigmoid(i_z + h_z)
        n = jnp.tanh(i_n + r * h_n)
        h = (1.0 - z) * n + z * h
        h_scr[:] = h
        return h

    if fused_loop:
        # gi[t] has no dependence on h, so the feat and GRU loops fuse
        # into ONE T-loop per pass (no (T, rows, 3d) gi staging scratch) —
        # and two more T-loops fold into the same loop's first/last pass:
        # the pass-invariant dec projection (write-then-read of
        # gi_dec_scr[t] inside pass-0 iteration t, same pattern as the
        # frozen-attention scratch) and the final re-score accumulation
        # (psi[t] needs only hs[t], ascending-t f32 adds — identical
        # accumulation order to the staged score loop). Per grid cell at
        # flagship shapes that is 192 -> 108 serial step-iterations, the
        # kernel's dominant cost on v5e (see _fused_loop_default).
        def fused_step(t, ip):
            if not (tblock > 1 and msg_in):
                # tblock>1 + msg_in stages dec/msg in its own pass-0
                # pre-loop (soc_block reads msg_scr before this loop runs)
                @pl.when(ip == 0)
                def _():
                    dec_step(t, 0)
            h = gru_update(compute_gi(t, ip))
            hs_scr[pl.ds(t, 1)] = h[None]

            @pl.when(ip == num_refine)
            def _():
                out = _mm(h, heads_w, cd, precision) + heads_b  # (rows, 4)
                psi = jnp.swapaxes(out[:, 0:1], 0, 1)           # (1, rows)
                out_sc_ref[0, 0] = (out_sc_ref[0, 0]
                                    + psi * fmask_scr[pl.ds(t, 1)])
            return ip

        def soc_block(ib, ip):
            """Attention for tblock consecutive steps on ONE (TB*rows,
            rows) tile -> pooled messages into soc_scr. Bitwise-equal to
            the per-step attend(): position broadcast/extraction are
            exact one-hot copies, and sq/gram/d2/softmax/nb-zeroing use
            the identical ops in the identical order."""
            s = ib * tblock
            xb = x_scr[pl.ds(s, tblock)]                      # (TB, rows)
            yb = y_scr[pl.ds(s, tblock)]
            hp = jax.lax.Precision.HIGHEST       # exact for one-hot copies
            xc = jnp.dot(rsel, xb, preferred_element_type=jnp.float32,
                         precision=hp)                        # (TBr, rows)
            yc = jnp.dot(rsel, yb, preferred_element_type=jnp.float32,
                         precision=hp)
            xr = jnp.sum(xc * dsel, axis=-1, keepdims=True)   # (TBr, 1)
            yr = jnp.sum(yc * dsel, axis=-1, keepdims=True)
            sqc = xc * xc + yc * yc
            sqr = xr * xr + yr * yr
            gram = xr * xc + yr * yc
            d2 = sqr + sqc - 2.0 * gram
            logits = jnp.where(excl_blk, -1e9, -d2 / tau)
            w = jax.nn.softmax(logits, axis=-1) * nb_blk      # (TBr, rows)
            for j in range(tblock):              # static unroll, TB small
                if msg_in:
                    mt = msg_scr[pl.ds(s + j, 1)][0].astype(jnp.float32)
                else:
                    mt = msg_ref[0, 0, pl.ds(s + j, 1)][0].astype(
                        jnp.float32)
                wj = jax.lax.slice(w, (j * rows, 0), ((j + 1) * rows, rows))
                soc_scr[pl.ds(s + j, 1)] = _mm(wj, mt, cd, precision)[None]
            return ip

        def fuse_and_gru(ip):
            """One full pass at (x_scr, y_scr) positions -> hs_scr filled."""
            if tblock > 1 and ablate != "social":
                if msg_in:
                    @pl.when(ip == 0)
                    def _():
                        jax.lax.fori_loop(0, t_len, dec_step, 0)
                if social_freeze:
                    @pl.when(ip == 0)
                    def _():
                        jax.lax.fori_loop(
                            0, t_len // tblock, soc_block, ip)
                else:
                    jax.lax.fori_loop(0, t_len // tblock, soc_block, ip)
            h_scr[:] = jnp.zeros((rows, d), jnp.float32)
            jax.lax.fori_loop(0, t_len, fused_step, ip)
    else:
        def feat_step(t, ip):
            gi_scr[pl.ds(t, 1)] = compute_gi(t, ip)[None]
            return ip

        def gru_step(t, _):
            hs_scr[pl.ds(t, 1)] = gru_update(
                gi_scr[pl.ds(t, 1)][0])[None]
            return 0

        def fuse_and_gru(ip):
            """One full pass at (x_scr, y_scr) positions -> hs_scr filled."""
            jax.lax.fori_loop(0, t_len, feat_step, ip)
            h_scr[:] = jnp.zeros((rows, d), jnp.float32)
            jax.lax.fori_loop(0, t_len, gru_step, 0)

    def delta_step(t, _):
        out = _mm(hs_scr[pl.ds(t, 1)][0], heads_w, cd,
                  precision) + heads_b                    # (rows, 4)
        gate = jax.nn.sigmoid(out[:, 1:2])
        dx = jnp.swapaxes(jnp.tanh(out[:, 2:3]) * gate, 0, 1)  # (1, rows)
        dy = jnp.swapaxes(jnp.tanh(out[:, 3:4]) * gate, 0, 1)
        m = fmask_scr[pl.ds(t, 1)] * delta_scale
        x_scr[pl.ds(t, 1)] = x_scr[pl.ds(t, 1)] + dx * m
        y_scr[pl.ds(t, 1)] = y_scr[pl.ds(t, 1)] + dy * m
        return 0

    def score_step(t, acc):
        out = _mm(hs_scr[pl.ds(t, 1)][0], heads_w, cd,
                  precision) + heads_b                    # (rows, 4)
        psi = jnp.swapaxes(out[:, 0:1], 0, 1)             # (1, rows)
        return acc + psi * fmask_scr[pl.ds(t, 1)]

    x_scr[:] = tx_ref[0, 0].astype(jnp.float32)
    y_scr[:] = ty_ref[0, 0].astype(jnp.float32)
    fmask_scr[:] = fmask_ref[0].astype(jnp.float32)
    if fused_loop:
        out_sc_ref[0, 0] = jnp.zeros((1, rows), jnp.float32)
    else:
        jax.lax.fori_loop(0, t_len, dec_step, 0)

    # num_refine+1 passes with ONE fuse_and_gru instantiation: the final
    # pass skips the delta application (= ioc_forward's re-score of the
    # frozen refined trajectory). Two call sites double the kernel body
    # and push Mosaic's compile time over a cliff.
    def refine_iter(i, carry):
        fuse_and_gru(i)

        @pl.when(i < num_refine)
        def _():
            jax.lax.fori_loop(0, t_len, delta_step, 0)
            if collect_iters:
                # per-iteration trajectories (deep-supervision targets of
                # the trainable path): traj AFTER iteration i's deltas —
                # dynamic store on a leading (untiled) dim
                out_xi_ref[0, 0, pl.ds(i, 1)] = x_scr[:][None]
                out_yi_ref[0, 0, pl.ds(i, 1)] = y_scr[:][None]
        return carry

    jax.lax.fori_loop(0, num_refine + 1, refine_iter, 0)
    if not fused_loop:
        # hs_scr holds the final pass -> accumulate the scores from it
        # (the fused loop accumulated them in-pass instead)
        out_sc_ref[0, 0] = jax.lax.fori_loop(
            0, t_len, score_step, jnp.zeros((1, rows), jnp.float32))
    out_x_ref[0, 0] = x_scr[:]
    out_y_ref[0, 0] = y_scr[:]


def _fwd_vmem_limit():
    """Scoped-VMEM cap for the inference-forward pallas_call
    (DESIRE_IOC_VMEM_MB, default 64). The backward kernel has run at 100M
    and the SGM sampler at 96M on v5e since round 3; the forward was the
    only kernel still compiled under the ~16M default, which is what
    rejected the 640/1280-row chunk probes in round 4 (grid cells run
    serially, so fewer+bigger chunks are the measured perf frontier —
    _pick_chunk docstring)."""
    return int(os.environ.get("DESIRE_IOC_VMEM_MB", "64")) * 2**20


def _pick_chunk(k, a_pad, max_rows=None, social_freeze=False,
                fused_loop=True, conservative=False):
    """Largest divisor of K whose chunk keeps rows = KC*A_pad <= max_rows
    (VMEM budget: the (T, rows, 3d) gate scratch is the biggest buffer).

    max_rows is a perf lever, not just a memory cap: grid cells run
    SERIALLY on the v5e tensorcore, so bigger chunks mean fewer, larger
    matmuls (better MXU shapes) at the cost of VMEM. Overridable via
    DESIRE_IOC_MAX_ROWS for on-chip sweeps; the r4 sweep measured
    59/94/142 ms fwd at 320/128/64 rows, and 640/1280-row probes AOT-OOM
    (19.2M/23.4M scoped vs the v5e 16M limit) — 320 is the frontier.

    social_freeze carries two extra frozen-attention operand blocks
    (bf16 (T, rows, d) each) through the kernel; at rows=320 that put
    the staged-loop kernel's scoped VMEM 300K over the limit (measured
    16.30M at B=64 A=60 K=20 d=48), hence the 256-row clamp. The fused
    loop frees the 2.2 MB (T, rows, 3d) gi scratch and the r4 on-chip
    probe CONFIRMED the 320-row fused freeze INFERENCE forward compiles,
    so the clamp now applies only to the unprobed configurations
    (conservative=True): the staged loop, the backward kernel, and the
    collect_iters training forward — their extra buffers could tip the
    margin, and an AOT OOM killed a full training queue once already."""
    if max_rows is None:
        # Round-5 finding: the r4 640/1280-row "AOT-OOM at the 16M limit"
        # was against the compiler's DEFAULT scoped-vmem cap — the forward
        # pallas_call never raised vmem_limit_bytes the way the backward
        # (100M) and the SGM sampler (96M) do. With _fwd_vmem_limit() the
        # r5 on-chip sweep measured the INFERENCE forward at
        # 59.2 / 60.6 / 53.1 ms for 320 / 640 / 1280 rows (B=64 A=60
        # K=20): one whole-K chunk wins 10% (single-pass setup amortized;
        # the non-monotonic middle is the dense social's rows^2 growth) —
        # 1280 is the inference default. Training/backward configurations
        # (conservative=True) keep 320 until their own sweep lands
        # (/tmp/r5_matrix.jsonl): the dense backward attention scratch is
        # (T, rows, rows) — 78 MB at 1280 rows — so big-row training needs
        # DESIRE_SOCIAL_KC.
        # (freeze inference: 49.6 ms at 640 rows dense; 44.35 ms at 1280
        # rows with the batched social — the dense 1280 freeze is unprobed,
        # so the bigger default rides the DESIRE_SOCIAL_KC flag)
        if conservative:
            default = 320
        elif social_freeze:
            default = 1280 if _social_kc_default() else 640
        else:
            # 1600 only matters for K > 20 (K=20 tops out at the whole-K
            # 1280-row chunk): K=50 measured 130.9 ms at kc=25/1600 rows
            # (batched social) vs 135.4 at kc=10/640 dense
            default = 1600 if _social_kc_default() else 1280
        max_rows = int(os.environ.get("DESIRE_IOC_MAX_ROWS", default))
    if social_freeze and (conservative or not fused_loop):
        max_rows = min(max_rows, 256)
    best = 1
    for kc in range(1, k + 1):
        if k % kc == 0 and kc * a_pad <= max_rows:
            best = kc
    return best


def ioc_refine_fused(p_ioc, p_scf, traj, dec_h, msg, feat_map, live,
                     fut_mask, *, num_refine, delta_scale, interpret=False,
                     collect_iters=False, social_freeze=False):
    """Fused rank-and-refine. Shapes follow models/ioc.ioc_forward:

    traj (B, A, K, T, 2) f32; dec_h/msg (B, A, K, T, d) compute dtype;
    feat_map (B, G, G, C); live (B, A); fut_mask (B, A, T).
    msg may be None (inference only): the kernel then computes the social
    messages in-pass from dec_h and p_scf['soc_msg'] — see
    _msg_inkernel_default for what that deletes from the XLA glue.
    Returns (refined_traj (B, A, K, T, 2) f32, scores (B, A, K) f32); with
    collect_iters also the per-iteration trajectories
    (num_refine, B, A, K, T, 2) — ioc_forward's per_iter list, stacked
    (the trainable path's deep-supervision targets).
    """
    b, a, k, t, _ = traj.shape
    msg_in = msg is None
    assert not (msg_in and collect_iters), (
        "in-kernel msg is inference-only: the trainable path's backward "
        "kernel consumes msg as an operand")
    # pad the agent axis to a sublane multiple (see module docstring)
    a_orig = a
    a_pad = max(-(-a // 8) * 8, 8)
    if a_pad != a:
        pad = [(0, 0)] * 5
        pad[1] = (0, a_pad - a)
        traj = jnp.pad(traj, pad)
        dec_h = jnp.pad(dec_h, pad)
        if not msg_in:
            msg = jnp.pad(msg, pad)
        live = jnp.pad(live, ((0, 0), (0, a_pad - a)))
        fut_mask = jnp.pad(fut_mask, ((0, 0), (0, a_pad - a), (0, 0)))
        a = a_pad
    d = dec_h.shape[-1]
    g = feat_map.shape[1]
    c = feat_map.shape[-1]
    gp = p_ioc["gru"][0]
    cd = dec_h.dtype
    fused_loop = _fused_loop_default()
    # T-blocked social attention (see _social_tb_default): inference-only
    # (the trainable forward keeps the path the backward kernel's parity
    # claims were measured against), fused-loop only, and mutually
    # exclusive with the band variant / the social ablation
    tblock = 1
    tb_req = _social_tb_default()
    if (tb_req > 1 and fused_loop and not collect_iters
            and not _social_band_default() and _ablate_default() != "social"):
        tblock = max(dv for dv in range(1, min(tb_req, t) + 1)
                     if t % dv == 0)
    kc = _pick_chunk(k, a, social_freeze=social_freeze,
                     fused_loop=fused_loop, conservative=collect_iters)
    # lane-block-batched social attention (_social_kc_default): applies to
    # the inference AND collect_iters forwards (ioc_bwd mirrors it in the
    # backward recompute/adjoint); mutually exclusive with band/T-block/
    # ablation. kc >= 8 guard: the r5 matrix measured the batched form
    # WINNING at kc=20 (51.65 vs 53.07 ms) and losing at kc=5 (60.5 vs
    # 59.2) — the batched-dot overhead needs a big enough element saving.
    kcb = (_social_kc_default() and kc >= 8
           and not _social_band_default() and tblock == 1
           and _ablate_default() != "social")
    chunks = k // kc
    rows = kc * a
    fmap_flat = feat_map.reshape(b, g * g, c)
    ltau = p_scf["soc_logtau"].reshape(1, 1).astype(jnp.float32)

    def to_chunk_major(arr):
        """(B, A, K, T, ·) -> (B, chunks, T, KC*A, ·) — lane-chunk-major
        rows; XLA does these transposes once, outside the refine loop."""
        trailing = arr.shape[4:]
        arr = arr.reshape(b, a, chunks, kc, t, *trailing)
        arr = jnp.moveaxis(arr, (2, 4, 3, 1), (1, 2, 3, 4))
        return arr.reshape(b, chunks, t, rows, *trailing)

    tkta = to_chunk_major(traj.astype(jnp.float32))       # (B,Ch,T,rows,2)
    tx, ty = tkta[..., 0], tkta[..., 1]
    dec_cm = to_chunk_major(dec_h)
    if msg_in:
        # the msg input slot carries the soc_msg weight; bias rides behind
        msg_op = p_scf["soc_msg"]["w"]                    # (d, d)
        bmsg_op = p_scf["soc_msg"]["b"][None]             # (1, d)
    else:
        msg_op = to_chunk_major(msg)
    # per-row masks, tiled across the KC lanes of a chunk in XLA (the
    # kernel must not concatenate along lanes)
    live_t = jnp.tile(live, (1, kc))[:, None, :]          # (B, 1, rows)
    fmask_t = jnp.tile(jnp.swapaxes(fut_mask, 1, 2), (1, 1, kc))  # (B,T,rows)

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
        delta_scale=float(delta_scale), grid_g=int(g), cd=cd,
        a_dim=a, kc=kc, collect_iters=bool(collect_iters),
        tent_mm=_tent_mm_default(), tent_bf16=_tent_bf16_default(),
        ablate=_ablate_default(), social_freeze=bool(social_freeze),
        fused_loop=fused_loop, band=_social_band_default(), msg_in=msg_in,
        tblock=tblock, kcb=kcb)

    def bk(shape, imap):
        return pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM)

    plane = lambda bi, ci: (bi, ci, 0, 0)     # (B, Ch, T, rows) planes
    block5 = lambda bi, ci: (bi, ci, 0, 0, 0)
    per_b = lambda bi, ci: (bi, 0, 0)
    nr = int(num_refine)
    extra_out_specs, extra_out_shapes = [], []
    if collect_iters:
        extra_out_specs = [bk((1, 1, nr, t, rows), block5)] * 2
        extra_out_shapes = [
            jax.ShapeDtypeStruct((b, chunks, nr, t, rows), jnp.float32)] * 2
    outs = pl.pallas_call(
        kernel,
        grid=(b, chunks),
        in_specs=[
            bk((1, 1, t, rows), plane),                      # traj x
            bk((1, 1, t, rows), plane),                      # traj y
            bk((1, 1, t, rows, d), block5),                  # dec_h
            # msg slot: precomputed messages, or the soc_msg weight
            (bk(None, None) if msg_in
             else bk((1, 1, t, rows, d), block5)),
            bk((1, g * g, c), per_b),                        # feat_map
            bk((1, 1, rows), per_b),                         # live (tiled)
            bk((1, t, rows), per_b),                         # fut_mask
            bk(None, None),                                  # wi_v
            bk(None, None),                                  # wi_s
            bk(None, None),                                  # wi_o
            bk(None, None),                                  # wi_d
            bk(None, None),                                  # wh
            bk(None, None),                                  # bi
            bk(None, None),                                  # bh
            bk(None, None),                                  # heads_w
            bk(None, None),                                  # heads_b
            pl.BlockSpec((1, 1), lambda bi, ci: (0, 0),
                         memory_space=pltpu.SMEM),           # log-tau
        ] + ([bk(None, None)] if msg_in else []),            # soc_msg bias
        out_specs=[
            bk((1, 1, t, rows), plane),
            bk((1, 1, t, rows), plane),
            bk((1, 1, 1, rows), lambda bi, ci: (bi, ci, 0, 0)),  # scores
        ] + extra_out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((b, chunks, t, rows), jnp.float32),
            jax.ShapeDtypeStruct((b, chunks, t, rows), jnp.float32),
            jax.ShapeDtypeStruct((b, chunks, 1, rows), jnp.float32),
        ] + extra_out_shapes,
        scratch_shapes=([] if fused_loop else [
            pltpu.VMEM((t, rows, 3 * d), jnp.float32),  # staged input gates
        ]) + [
            pltpu.VMEM((t, rows, d), jnp.float32),     # GRU hiddens
            pltpu.VMEM((t, rows), jnp.float32),        # x plane
            pltpu.VMEM((t, rows), jnp.float32),        # y plane
            pltpu.VMEM((t, rows), jnp.float32),        # future mask
            pltpu.VMEM((rows, d), jnp.float32),        # GRU state
            pltpu.VMEM((t, rows, 3 * d), jnp.float32),  # dec_h projection
        ] + ([pltpu.VMEM((t, rows, d), jnp.float32)]    # pooled social
             if (social_freeze or tblock > 1) else [])  # (frozen/T-block)
          + ([pltpu.VMEM((t, rows, d), cd)]             # in-kernel messages
             if msg_in else []),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_fwd_vmem_limit()),
        interpret=interpret,
    )(tx, ty, dec_cm, msg_op, fmap_flat, live_t, fmask_t,
      wi_v, wi_s, wi_o, wi_d, gp["wh"], gp["bi"], gp["bh"],
      heads_w, heads_b, ltau,
      *([bmsg_op] if msg_in else []))
    out_x, out_y, scores = outs[:3]

    def from_chunk_major(arr):
        """(B, chunks, T, KC*A, ·) -> (B, A, K, T, ·)."""
        trailing = arr.shape[4:]
        arr = arr.reshape(b, chunks, t, kc, a, *trailing)
        arr = jnp.moveaxis(arr, (4, 1, 3, 2), (1, 2, 3, 4))
        return arr.reshape(b, a, k, t, *trailing)

    refined = from_chunk_major(jnp.stack([out_x, out_y], axis=-1))
    sc = scores.reshape(b, chunks, kc, a)                 # (B, Ch, KC, A)
    sc = jnp.moveaxis(sc, 3, 1).reshape(b, a, k)
    if not collect_iters:
        return refined[:, :a_orig], sc[:, :a_orig]

    def iters_from_chunk_major(arr):
        """(B, Ch, R, T, KC*A) -> (R, B, A, K, T) — same lane ordering as
        from_chunk_major (k = chunk_index * KC + lane_in_chunk)."""
        arr = arr.reshape(b, chunks, nr, t, kc, a)
        arr = jnp.transpose(arr, (2, 0, 5, 1, 4, 3))     # (R, b, a, Ch, KC, t)
        return arr.reshape(nr, b, a, k, t)

    iters = jnp.stack([iters_from_chunk_major(outs[3]),
                       iters_from_chunk_major(outs[4])], axis=-1)
    return refined[:, :a_orig], sc[:, :a_orig], iters[:, :, :a_orig]


def make_trainable_fused_ioc(cfg, interpret=False, backward="xla"):
    """TRAINABLE fused rank-and-refine (VERDICT r2 item 3).

    Forward = the fused Pallas kernel (collect_iters=True, so the
    deep-supervision targets come out too); backward = one XLA recompute of
    models/ioc.ioc_forward under jax.vjp. Gradients are therefore EXACTLY
    the XLA path's gradients (same program, same stop_gradients) — the only
    difference training sees is that downstream losses consume the kernel's
    forward values (parity-tested to ~1e-5 in interpret mode). Net effect on
    the train step: the forward half of the IOC stage stops paying the
    unfused ~9 GB/iteration social-attention traffic; the backward half is
    remat-style recompute (which cfg.remat already chose to pay).

    Returns fn(p_ioc, p_scf, traj, dec_h, feat_map, live, fut_mask) ->
    (refined (B,A,K,T,2) f32, scores (B,A,K) f32,
     per_iter (R,B,A,K,T,2) f32).
    """
    from desire_tpu.models import ioc as ioc_mod
    from desire_tpu.models import scf as scf_mod
    num_refine = max(int(cfg.num_refine), 1)

    def xla_fn(p_ioc, p_scf, traj, dec_h, feat_map, live, fut_mask):
        refined, scores, per_iter = ioc_mod.ioc_forward(
            p_ioc, p_scf, cfg, traj, dec_h, feat_map, live, fut_mask)
        return refined, scores, jnp.stack(per_iter)

    @jax.custom_vjp
    def fn(p_ioc, p_scf, traj, dec_h, feat_map, live, fut_mask):
        msg = scf_mod.social_messages(p_scf, dec_h)
        refined, scores, iters = ioc_refine_fused(
            p_ioc, p_scf, traj, dec_h, msg, feat_map, live, fut_mask,
            num_refine=num_refine, delta_scale=ioc_mod._DELTA_SCALE,
            interpret=interpret, collect_iters=True,
            social_freeze=cfg.social_freeze)
        # primal output dtypes must equal xla_fn's (custom_vjp cotangents
        # are checked against them): the XLA path emits scores in the
        # compute dtype, the kernel accumulates them in f32
        return refined, scores.astype(dec_h.dtype), iters

    def fwd(*args):
        out = fn(*args)
        if backward == "pallas":
            return out, (args, out[2])     # keep the per-iter planes
        return out, args

    def bwd_xla(args, cts):
        _, vjp_fn = jax.vjp(xla_fn, *args)
        return vjp_fn(cts)

    def bwd_pallas(res, cts):
        """Full Pallas backward (ops/ioc_bwd.py): in-kernel recompute +
        reverse accumulation; no XLA replay of the forward."""
        from desire_tpu.ops.ioc_bwd import ioc_refine_bwd
        (p_ioc, p_scf, traj, dec_h, feat_map, live, fut_mask), iters = res
        d_refined, d_scores, d_iters = cts
        msg = scf_mod.social_messages(p_scf, dec_h)
        (d_traj, d_dec, d_msg, d_fmap, g_gru, g_heads,
         d_ltau) = ioc_refine_bwd(
            p_ioc, p_scf, traj.astype(jnp.float32), dec_h, msg, feat_map,
            live, fut_mask, iters, d_refined, d_scores, d_iters,
            num_refine=num_refine, delta_scale=ioc_mod._DELTA_SCALE,
            interpret=interpret, social_freeze=cfg.social_freeze)
        # chain msg = dec_h @ W + b back into dec_h and the scf params
        w_msg = p_scf["soc_msg"]["w"]
        d_dec_total = d_dec + jnp.einsum(
            "...o,io->...i", d_msg.astype(jnp.float32),
            w_msg.astype(jnp.float32)).astype(d_dec.dtype)
        dm = d_msg.astype(jnp.float32)
        dh32 = dec_h.astype(jnp.float32)
        d_wmsg = jnp.einsum("baktd,bakto->do", dh32, dm).astype(w_msg.dtype)
        d_bmsg = jnp.sum(dm, axis=(0, 1, 2, 3)).astype(w_msg.dtype)
        d_p_ioc = {
            "gru": [dict(g_gru)],
            "score": g_heads["score"],
            "gate": g_heads["gate"],
            "delta": g_heads["delta"],
        }
        d_p_scf = jax.tree_util.tree_map(jnp.zeros_like, p_scf)
        d_p_scf["soc_msg"] = {"w": d_wmsg, "b": d_bmsg}
        d_p_scf["soc_logtau"] = jnp.asarray(
            d_ltau, p_scf["soc_logtau"].dtype).reshape(
            p_scf["soc_logtau"].shape)
        return (d_p_ioc, d_p_scf, d_traj.astype(traj.dtype),
                d_dec_total.astype(dec_h.dtype), d_fmap,
                jnp.zeros_like(live), jnp.zeros_like(fut_mask))

    fn.defvjp(fwd, bwd_pallas if backward == "pallas" else bwd_xla)
    return fn


def make_trainable_fused_ioc_sharded(cfg, mesh, interpret=False):
    """TRAINABLE fused rank-and-refine under a (data, k) mesh (VERDICT r3
    item 4 — multi-chip training previously forfeited the measured 1.4x
    fused-kernel win and fell back to XLA).

    Same decomposition as ioc_refine_fused_sharded: every (batch row, lane)
    is independent (the social attention is per-lane block-diagonal), so the
    FORWARD needs no collectives — each device runs the Pallas kernel on its
    (B/mesh_data, A, K/mesh_k) block. The BACKWARD runs the Pallas reverse
    kernel (ops/ioc_bwd.py) per-shard, then reduces the per-shard PARAMETER
    gradients with one psum over both mesh axes *inside* the shard_map
    (riding ICI — exactly the all-reduce jit would emit for the XLA path),
    while data gradients (d_traj, d_dec_h) stay sharded and d_feat_map
    psums over the lane axis only (feat_map is data-sharded, every lane
    shard contributes to it). Gradient parity vs the XLA path is tested
    under an 8-device CPU mesh in interpret mode (tests/test_kernels.py).
    """
    from jax.sharding import PartitionSpec as P

    from desire_tpu.models import ioc as ioc_mod
    from desire_tpu.models import scf as scf_mod
    from desire_tpu.parallel.mesh import DATA_AXIS, K_AXIS

    num_refine = max(int(cfg.num_refine), 1)
    delta_scale = ioc_mod._DELTA_SCALE
    lane5 = P(DATA_AXIS, None, K_AXIS, None, None)     # (B, A, K, T, ·)
    lane3 = P(DATA_AXIS, None, K_AXIS)                 # (B, A, K)
    iters_spec = P(None, DATA_AXIS, None, K_AXIS, None, None)
    data_only = P(DATA_AXIS)
    both_axes = (DATA_AXIS, K_AXIS)

    def rep(tree):
        return jax.tree_util.tree_map(lambda _: P(), tree)

    @jax.custom_vjp
    def fn(p_ioc, p_scf, traj, dec_h, feat_map, live, fut_mask):
        msg = scf_mod.social_messages(p_scf, dec_h)

        def local_fwd(p_ioc, p_scf, traj, dec_h, msg, feat_map, live,
                      fut_mask):
            return ioc_refine_fused(
                p_ioc, p_scf, traj, dec_h, msg, feat_map, live, fut_mask,
                num_refine=num_refine, delta_scale=delta_scale,
                interpret=interpret, collect_iters=True,
                social_freeze=cfg.social_freeze)

        refined, scores, iters = jax.shard_map(
            local_fwd, mesh=mesh,
            in_specs=(rep(p_ioc), rep(p_scf), lane5, lane5, lane5,
                      data_only, data_only, data_only),
            out_specs=(lane5, lane3, iters_spec),
            check_vma=False)(p_ioc, p_scf, traj, dec_h, msg, feat_map,
                             live, fut_mask)
        # same dtype contract as make_trainable_fused_ioc: scores follow
        # the compute dtype (custom_vjp checks cotangents against primals)
        return refined, scores.astype(dec_h.dtype), iters

    def fwd(*args):
        out = fn(*args)
        return out, (args, out[2])

    def bwd(res, cts):
        from desire_tpu.ops.ioc_bwd import ioc_refine_bwd
        (p_ioc, p_scf, traj, dec_h, feat_map, live, fut_mask), iters = res
        d_refined, d_scores, d_iters = cts
        msg = scf_mod.social_messages(p_scf, dec_h)

        def local_bwd(p_ioc, p_scf, traj, dec_h, msg, feat_map, live,
                      fut_mask, iters, d_refined, d_scores, d_iters):
            (d_traj, d_dec, d_msg, d_fmap, g_gru, g_heads,
             d_ltau) = ioc_refine_bwd(
                p_ioc, p_scf, traj.astype(jnp.float32), dec_h, msg,
                feat_map, live, fut_mask, iters, d_refined, d_scores,
                d_iters, num_refine=num_refine, delta_scale=delta_scale,
                interpret=interpret, social_freeze=cfg.social_freeze)
            # chain msg = dec_h @ W + b locally (same math as the
            # single-device bwd_pallas in make_trainable_fused_ioc)
            w_msg = p_scf["soc_msg"]["w"]
            dm = d_msg.astype(jnp.float32)
            d_dec_total = d_dec + jnp.einsum(
                "...o,io->...i", dm,
                w_msg.astype(jnp.float32)).astype(d_dec.dtype)
            d_wmsg = jnp.einsum("baktd,bakto->do",
                                dec_h.astype(jnp.float32), dm)
            d_p_ioc = {
                "gru": [dict(g_gru)],
                "score": g_heads["score"],
                "gate": g_heads["gate"],
                "delta": g_heads["delta"],
            }
            d_p_scf = jax.tree_util.tree_map(jnp.zeros_like, p_scf)
            d_p_scf["soc_msg"] = {
                "w": d_wmsg.astype(w_msg.dtype),
                "b": jnp.sum(dm, axis=(0, 1, 2, 3)).astype(w_msg.dtype)}
            d_p_scf["soc_logtau"] = jnp.asarray(
                d_ltau, p_scf["soc_logtau"].dtype).reshape(
                p_scf["soc_logtau"].shape)
            # parameter grads: one ICI all-reduce over both mesh axes;
            # feat_map grads: lane shards sum into the data-sharded map
            d_p_ioc, d_p_scf = jax.tree_util.tree_map(
                lambda g: jax.lax.psum(g, both_axes), (d_p_ioc, d_p_scf))
            d_fmap = jax.lax.psum(d_fmap, K_AXIS)
            return (d_p_ioc, d_p_scf, d_traj.astype(traj.dtype),
                    d_dec_total.astype(dec_h.dtype), d_fmap,
                    jnp.zeros_like(live), jnp.zeros_like(fut_mask))

        return jax.shard_map(
            local_bwd, mesh=mesh,
            in_specs=(rep(p_ioc), rep(p_scf), lane5, lane5, lane5,
                      data_only, data_only, data_only, iters_spec,
                      lane5, lane3, iters_spec),
            out_specs=(rep(p_ioc), rep(p_scf), lane5, lane5, data_only,
                       data_only, data_only),
            check_vma=False)(p_ioc, p_scf, traj, dec_h, msg, feat_map,
                             live, fut_mask, iters, d_refined, d_scores,
                             d_iters)

    fn.defvjp(fwd, bwd)
    return fn


def ioc_refine_fused_sharded(mesh, p_ioc, p_scf, traj, dec_h, msg, feat_map,
                             live, fut_mask, *, num_refine, delta_scale,
                             interpret=False, social_freeze=False):
    """The fused kernel under a (data, k) device mesh, via shard_map.

    XLA's SPMD partitioner cannot split a pallas_call, so under a mesh the
    kernel runs per-shard: the batch dim shards over 'data', the hypothesis
    lanes over 'k', and — because every (batch row, lane) is independent in
    this kernel (the social attention is per-lane block-diagonal) — no
    collectives are needed; each device runs the identical kernel on its
    (B/mesh_data, A, K/mesh_k) block. Requires B % mesh_data == 0 and
    K % mesh_k == 0 (checked by the caller, models/desire.py).
    """
    from jax.sharding import PartitionSpec as P

    from desire_tpu.parallel.mesh import DATA_AXIS, K_AXIS
    shard_map = jax.shard_map

    lane5 = P(DATA_AXIS, None, K_AXIS, None, None)   # (B, A, K, T, ·)
    data_only = P(DATA_AXIS)
    rep = jax.tree_util.tree_map(lambda _: P(), (p_ioc, p_scf))

    def local(p_ioc, p_scf, traj, dec_h, msg, feat_map, live, fut_mask):
        return ioc_refine_fused(p_ioc, p_scf, traj, dec_h, msg, feat_map,
                                live, fut_mask, num_refine=num_refine,
                                delta_scale=delta_scale, interpret=interpret,
                                social_freeze=social_freeze)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(rep[0], rep[1], lane5, lane5, lane5, data_only,
                  data_only, data_only),
        out_specs=(lane5, P(DATA_AXIS, None, K_AXIS)),
        # the pallas_call inside doesn't annotate varying-mesh-axes metadata
        check_vma=False)
    return fn(p_ioc, p_scf, traj, dec_h, msg, feat_map, live, fut_mask)
