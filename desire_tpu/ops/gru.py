"""Pallas TPU kernels: fused GRU sequence scan.

STATUS — validated but opt-in, NOT dispatched by the model by default.
Final measurements at the flagship shapes (M=76800, H=48, T=12, bf16, v5e):
XLA's lax.scan runs at 1.7-5.3 ms (noisy remote timing) and the fused
kernels at 4.5-4.9 ms forward / 12.3 ms backward vs XLA's 8.1 ms — at this
tiny hidden size the serialized per-tile recurrence does not beat XLA's
pipelined scan. The kernels are kept (with interpret-mode + gradient parity
tests) for larger-H configurations, where weights-resident recurrence wins.

Design: the entire T-step recurrence for a tile of rows runs in one kernel
launch with weights and state VMEM-resident — zero intermediate HBM traffic.

Gate math matches layers.gru_step exactly ([r|z|n] layout,
h' = (1-z)*n + z*h, n = tanh(i_n + r*h_n)) — the kernel and the XLA path
consume the same parameter tree.

Custom VJP: the backward kernel re-materializes the gates from the saved
per-step hidden states (classic rematerialized BPTT) and runs the reverse
loop in one launch too, accumulating dW across both the time loop (VMEM
scratch) and the row-tile grid (output-block revisiting).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 512        # forward rows per program
_BTILE = 256       # backward rows per program (2x the live blocks of fwd)


def _precision_for(dtype):
    return (jax.lax.Precision.HIGHEST if dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)


def _gates(x, h, wi, wh, bi, bh, d, precision):
    gi = jnp.dot(x, wi, preferred_element_type=jnp.float32,
                 precision=precision) + bi
    gh = jnp.dot(h, wh, preferred_element_type=jnp.float32,
                 precision=precision) + bh
    r = jax.nn.sigmoid(gi[:, :d] + gh[:, :d])
    z = jax.nn.sigmoid(gi[:, d:2 * d] + gh[:, d:2 * d])
    hn = gh[:, 2 * d:]
    n = jnp.tanh(gi[:, 2 * d:] + r * hn)
    return r, z, n, hn


def _fwd_kernel(wi_ref, wh_ref, bi_ref, bh_ref, h0_ref, xs_ref, hs_ref,
                *, t_len, d, precision):
    wi = wi_ref[:].astype(jnp.float32)
    wh = wh_ref[:].astype(jnp.float32)
    bi = bi_ref[0].astype(jnp.float32)
    bh = bh_ref[0].astype(jnp.float32)

    def step(t, h):
        x = xs_ref[t].astype(jnp.float32)
        r, z, n, _ = _gates(x, h, wi, wh, bi, bh, d, precision)
        h = (1.0 - z) * n + z * h
        hs_ref[t] = h.astype(hs_ref.dtype)
        return h

    jax.lax.fori_loop(0, t_len, step, h0_ref[:].astype(jnp.float32))


def _bwd_kernel(wi_ref, wh_ref, bi_ref, bh_ref, h0_ref, xs_ref, hs_ref,
                ghs_ref,
                dwi_ref, dwh_ref, dbi_ref, dbh_ref, dh0_ref, dxs_ref,
                dwi_acc, dwh_acc, db_acc,
                *, t_len, d, precision):
    wi = wi_ref[:].astype(jnp.float32)
    wh = wh_ref[:].astype(jnp.float32)
    bi = bi_ref[0].astype(jnp.float32)
    bh = bh_ref[0].astype(jnp.float32)

    dwi_acc[:] = jnp.zeros_like(dwi_acc)
    dwh_acc[:] = jnp.zeros_like(dwh_acc)
    db_acc[:] = jnp.zeros_like(db_acc)

    def step(i, dh):
        t = t_len - 1 - i
        h_prev = jnp.where(t == 0, h0_ref[:].astype(jnp.float32),
                           hs_ref[jnp.maximum(t - 1, 0)].astype(jnp.float32))
        x = xs_ref[t].astype(jnp.float32)
        r, z, n, hn = _gates(x, h_prev, wi, wh, bi, bh, d, precision)

        dh = dh + ghs_ref[t].astype(jnp.float32)   # upstream grad on hs[t]
        dn = dh * (1.0 - z)
        dz = dh * (h_prev - n)
        dh_carry = dh * z

        dan = dn * (1.0 - n * n)
        dar = dan * hn * r * (1.0 - r)
        daz = dz * z * (1.0 - z)

        dgi = jnp.concatenate([dar, daz, dan], axis=-1)           # (TILE, 3d)
        dgh = jnp.concatenate([dar, daz, dan * r], axis=-1)

        dxs_ref[t] = jnp.dot(dgi, wi.T, preferred_element_type=jnp.float32,
                             precision=precision).astype(dxs_ref.dtype)
        dh_carry = dh_carry + jnp.dot(dgh, wh.T,
                                      preferred_element_type=jnp.float32,
                                      precision=precision)
        dwi_acc[:] += jnp.dot(x.T, dgi, preferred_element_type=jnp.float32,
                              precision=precision)
        dwh_acc[:] += jnp.dot(h_prev.T, dgh,
                              preferred_element_type=jnp.float32,
                              precision=precision)
        db_acc[0] += jnp.sum(dgi, axis=0)
        db_acc[1] += jnp.sum(dgh, axis=0)
        return dh_carry

    dh0 = jax.lax.fori_loop(0, t_len, step, jnp.zeros_like(dh0_ref, jnp.float32))
    dh0_ref[:] = dh0.astype(dh0_ref.dtype)

    # accumulate weight grads across the row-tile grid
    @pl.when(pl.program_id(0) == 0)
    def _():
        dwi_ref[:] = jnp.zeros_like(dwi_ref)
        dwh_ref[:] = jnp.zeros_like(dwh_ref)
        dbi_ref[:] = jnp.zeros_like(dbi_ref)
        dbh_ref[:] = jnp.zeros_like(dbh_ref)

    dwi_ref[:] += dwi_acc[:].astype(dwi_ref.dtype)
    dwh_ref[:] += dwh_acc[:].astype(dwh_ref.dtype)
    dbi_ref[0] += db_acc[0].astype(dbi_ref.dtype)
    dbh_ref[0] += db_acc[1].astype(dbh_ref.dtype)


def _pad_rows(a, tile, axis):
    m = a.shape[axis]
    pad = (-m) % tile
    if pad:
        widths = [(0, 0)] * a.ndim
        widths[axis] = (0, pad)
        a = jnp.pad(a, widths)
    return a, m, pad


def _fwd_call(wi, wh, bi, bh, h0, xs, interpret=False):
    t_len, m, in_dim = xs.shape
    d = h0.shape[-1]
    xs_p, m0, pad = _pad_rows(xs, _TILE, 1)
    h0_p, _, _ = _pad_rows(h0, _TILE, 0)
    mt = xs_p.shape[1] // _TILE
    prec = _precision_for(wi.dtype)
    hs = pl.pallas_call(
        functools.partial(_fwd_kernel, t_len=t_len, d=d, precision=prec),
        grid=(mt,),
        in_specs=[
            pl.BlockSpec((in_dim, 3 * d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 3 * d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t_len, _TILE, in_dim), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((t_len, _TILE, d), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_len, xs_p.shape[1], d), h0.dtype),
        interpret=interpret,
    )(wi, wh, bi.reshape(1, -1), bh.reshape(1, -1), h0_p, xs_p)
    return hs[:, :m0] if pad else hs


def _bwd_call(wi, wh, bi, bh, h0, xs, hs, ghs, interpret=False):
    t_len, m, in_dim = xs.shape
    d = h0.shape[-1]
    xs_p, m0, pad = _pad_rows(xs, _BTILE, 1)
    h0_p, _, _ = _pad_rows(h0, _BTILE, 0)
    hs_p, _, _ = _pad_rows(hs, _BTILE, 1)
    ghs_p, _, _ = _pad_rows(ghs, _BTILE, 1)
    mt = xs_p.shape[1] // _BTILE
    prec = _precision_for(wi.dtype)
    f32 = jnp.float32
    dwi, dwh, dbi, dbh, dh0, dxs = pl.pallas_call(
        functools.partial(_bwd_kernel, t_len=t_len, d=d, precision=prec),
        grid=(mt,),
        in_specs=[
            pl.BlockSpec((in_dim, 3 * d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 3 * d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_BTILE, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t_len, _BTILE, in_dim), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t_len, _BTILE, d), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t_len, _BTILE, d), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((in_dim, 3 * d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 3 * d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_BTILE, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t_len, _BTILE, in_dim), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((in_dim, 3 * d), f32),
            jax.ShapeDtypeStruct((d, 3 * d), f32),
            jax.ShapeDtypeStruct((1, 3 * d), f32),
            jax.ShapeDtypeStruct((1, 3 * d), f32),
            jax.ShapeDtypeStruct((h0_p.shape[0], d), f32),
            jax.ShapeDtypeStruct((t_len, xs_p.shape[1], in_dim), f32),
        ),
        scratch_shapes=[
            pltpu.VMEM((in_dim, 3 * d), f32),
            pltpu.VMEM((d, 3 * d), f32),
            pltpu.VMEM((2, 3 * d), f32),
        ],
        interpret=interpret,
    )(wi, wh, bi.reshape(1, -1), bh.reshape(1, -1), h0_p, xs_p, hs_p, ghs_p)
    if pad:
        dh0 = dh0[:m0]
        dxs = dxs[:, :m0]
    return dwi, dwh, dbi.reshape(-1), dbh.reshape(-1), dh0, dxs


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def gru_seq_pallas(p, h0, xs, interpret=False):
    """Fused GRU over a full sequence.

    p: layers.init_gru param dict; h0 (M, H); xs (T, M, in).
    Returns hs (T, M, H) — all hidden states (hs[-1] is the final state).
    """
    return _fwd_call(p["wi"], p["wh"], p["bi"], p["bh"], h0, xs, interpret)


# ---------------------------------------------------------------------------
# Split formulation: the input-gate half (x @ Wi for every step) is time-
# parallel — one large MXU matmul outside the kernel — and only the serial
# h @ Wh recurrence runs inside. Inference-only (no VJP): the training path
# keeps the XLA scan, whose backward is faster than a kernel BPTT here.
# ---------------------------------------------------------------------------

def _rec_kernel(wh_ref, bh_ref, h0_ref, gi_ref, hs_ref, *, t_len, d,
                precision):
    wh = wh_ref[:].astype(jnp.float32)
    bh = bh_ref[0].astype(jnp.float32)

    def step(t, h):
        gi = gi_ref[t].astype(jnp.float32)
        gh = jnp.dot(h, wh, preferred_element_type=jnp.float32,
                     precision=precision) + bh
        r = jax.nn.sigmoid(gi[:, :d] + gh[:, :d])
        z = jax.nn.sigmoid(gi[:, d:2 * d] + gh[:, d:2 * d])
        n = jnp.tanh(gi[:, 2 * d:] + r * gh[:, 2 * d:])
        h = (1.0 - z) * n + z * h
        hs_ref[t] = h.astype(hs_ref.dtype)
        return h

    jax.lax.fori_loop(0, t_len, step, h0_ref[:].astype(jnp.float32))


def gru_seq_pallas_infer(p, h0, xs, interpret=False):
    """Inference-only fused GRU: XLA does the (T*M, in)@(in, 3H) input-gate
    matmul in one shot; the kernel runs just the recurrence."""
    t_len, m, _ = xs.shape
    d = h0.shape[-1]
    gi = jnp.dot(xs, p["wi"].astype(xs.dtype),
                 preferred_element_type=xs.dtype) + p["bi"].astype(xs.dtype)
    gi_p, m0, pad = _pad_rows(gi, _TILE, 1)
    h0_p, _, _ = _pad_rows(h0, _TILE, 0)
    mt = gi_p.shape[1] // _TILE
    prec = _precision_for(p["wh"].dtype)
    hs = pl.pallas_call(
        functools.partial(_rec_kernel, t_len=t_len, d=d, precision=prec),
        grid=(mt,),
        in_specs=[
            pl.BlockSpec((d, 3 * d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t_len, _TILE, 3 * d), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((t_len, _TILE, d), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_len, gi_p.shape[1], d), h0.dtype),
        interpret=interpret,
    )(p["wh"], p["bh"].reshape(1, -1), h0_p, gi_p)
    return hs[:, :m0] if pad else hs


def _vjp_fwd(p, h0, xs, interpret):
    hs = _fwd_call(p["wi"], p["wh"], p["bi"], p["bh"], h0, xs, interpret)
    return hs, (p, h0, xs, hs)


def _vjp_bwd(interpret, res, ghs):
    p, h0, xs, hs = res
    dwi, dwh, dbi, dbh, dh0, dxs = _bwd_call(
        p["wi"], p["wh"], p["bi"], p["bh"], h0, xs, hs, ghs, interpret)
    dp = {"wi": dwi.astype(p["wi"].dtype), "wh": dwh.astype(p["wh"].dtype),
          "bi": dbi.astype(p["bi"].dtype), "bh": dbh.astype(p["bh"].dtype)}
    return dp, dh0.astype(h0.dtype), dxs.astype(xs.dtype)


gru_seq_pallas.defvjp(_vjp_fwd, _vjp_bwd)
