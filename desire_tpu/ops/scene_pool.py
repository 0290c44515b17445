"""Pallas TPU kernel: bilinear scene-feature pooling.

Replaces the XLA gather in ``scf.bilinear_pool`` (4x take_along_axis), which
lowers to a serialized row-gather on TPU — measured 35 ms per IOC refinement
iteration at flagship shapes (the single largest cost in the model, ~60% of
inference). Here the gather becomes a *4-hot matmul*: for a tile of P points,
build a (P, G*G) sparse weight matrix holding the four bilinear corner
weights of each point, and multiply by the VMEM-resident (G*G, C) feature
map on the MXU. One matmul yields the interpolated features directly —
no gather instruction at all.

Backward (custom VJP, also Pallas):
  d_feat = W^T @ g                      (transposed 4-hot matmul; accumulated
                                         across point tiles by output-block
                                         revisiting)
  d_pos  = via two derivative-weight matmuls (dW/dfx, dW/dfy) contracted
           with g — positions get gradients because the IOC loop refines
           them through this pooling.

VMEM budget per program: feature block G*G x C (32x32 grid, 32 ch, f32 =
128 KB) + 4-hot tile (TILE x G*G f32 = 2 MB at TILE=512) — well under 16 MB.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 512


def _precision_for(dtype):
    """bf16 inputs: single-pass MXU (matches the bf16 pipeline's semantics);
    f32 inputs: exact 3-pass so the kernel is bit-comparable to the XLA
    reference in tests."""
    if dtype == jnp.float32:
        return jax.lax.Precision.HIGHEST
    return jax.lax.Precision.DEFAULT


def _corner_data(pos_tile, g):
    """pos (TILE, 2) in [0,1] -> corner cells + bilinear weights (all (TILE,))."""
    xy = jnp.clip(pos_tile, 0.0, 1.0) * (g - 1)
    x0f = jnp.floor(xy[:, 0])
    y0f = jnp.floor(xy[:, 1])
    fx = xy[:, 0] - x0f
    fy = xy[:, 1] - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, g - 1)
    y1 = jnp.minimum(y0 + 1, g - 1)
    cells = (y0 * g + x0, y0 * g + x1, y1 * g + x0, y1 * g + x1)
    w = ((1 - fx) * (1 - fy), fx * (1 - fy), (1 - fx) * fy, fx * fy)
    return cells, w, fx, fy


def _four_hot(cells, weights, tile, g2, dtype=jnp.float32):
    """Build the (TILE, G*G) sparse weight matrix on the VPU.

    dtype matters a lot: a float32 weight matrix forces the MXU off its
    native-bf16 path (measured 8.3 ms vs 0.12 ms for the forward at flagship
    shapes) — so the matrix is built in the feature dtype.
    """
    cols = jax.lax.broadcasted_iota(jnp.int32, (tile, g2), 1)
    m = jnp.zeros((tile, g2), dtype)
    for cell, w in zip(cells, weights):
        m = m + jnp.where(cols == cell[:, None], w[:, None], 0.0).astype(dtype)
    return m


def _fwd_kernel(fm_ref, pos_ref, out_ref, *, g, precision):
    tile = pos_ref.shape[1]          # blocks carry a leading (1, ...) dim
    cells, w, _, _ = _corner_data(pos_ref[0].astype(jnp.float32), g)
    wmat = _four_hot(cells, w, tile, g * g, fm_ref.dtype)
    out = jnp.dot(wmat, fm_ref[0],
                  preferred_element_type=jnp.float32,
                  precision=precision)
    out_ref[0] = out.astype(out_ref.dtype)


def _bwd_kernel(fm_ref, pos_ref, gout_ref, dfm_ref, dpos_ref, *, g, precision):
    tile = pos_ref.shape[1]          # blocks carry a leading (1, ...) dim
    pos = pos_ref[0].astype(jnp.float32)
    cells, w, fx, fy = _corner_data(pos, g)
    g2 = g * g
    dt = fm_ref.dtype
    wmat = _four_hot(cells, w, tile, g2, dt)
    gout = gout_ref[0].astype(dt)

    # d_feat: accumulate W^T @ g across the point tiles of this batch row
    dfm = jnp.dot(wmat.T, gout, preferred_element_type=jnp.float32,
                  precision=precision)

    @pl.when(pl.program_id(1) == 0)
    def _():
        dfm_ref[0] = jnp.zeros_like(dfm_ref[0])

    dfm_ref[0] += dfm.astype(dfm_ref.dtype)

    # d_pos via derivative weight matrices
    fm = fm_ref[0]
    dw_dfx = (-(1 - fy), (1 - fy), -fy, fy)
    dw_dfy = (-(1 - fx), -fx, (1 - fx), fx)
    gx = jnp.dot(_four_hot(cells, dw_dfx, tile, g2, dt), fm,
                 preferred_element_type=jnp.float32,
                 precision=precision)
    gy = jnp.dot(_four_hot(cells, dw_dfy, tile, g2, dt), fm,
                 preferred_element_type=jnp.float32,
                 precision=precision)
    dfx = jnp.sum(gx * gout.astype(jnp.float32), axis=-1)
    dfy = jnp.sum(gy * gout.astype(jnp.float32), axis=-1)
    # chain: xy = clip(pos,0,1)*(g-1); clip zeroes gradient outside [0,1]
    in01 = jnp.logical_and(pos >= 0.0, pos <= 1.0)
    dpos = jnp.stack([dfx, dfy], axis=-1) * (g - 1) * in01.astype(jnp.float32)
    dpos_ref[0] = dpos.astype(dpos_ref.dtype)


def _pad_points(pos, tile):
    b, p, _ = pos.shape
    pad = (-p) % tile
    if pad:
        pos = jnp.pad(pos, ((0, 0), (0, pad), (0, 0)))
    return pos, p, pad


def _fwd_call(fm, pos, interpret=False):
    b, g, _, c = fm.shape
    pos_p, p, pad = _pad_points(pos, _TILE)
    pt = pos_p.shape[1] // _TILE
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, g=g, precision=_precision_for(fm.dtype)),
        grid=(b, pt),
        in_specs=[
            pl.BlockSpec((1, g * g, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TILE, 2), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _TILE, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, pos_p.shape[1], c), fm.dtype),
        interpret=interpret,
    )(fm.reshape(b, g * g, c), pos_p)
    return out[:, :p] if pad else out


def _bwd_call(fm, pos, gout, interpret=False):
    b, g, _, c = fm.shape
    pos_p, p, pad = _pad_points(pos, _TILE)
    if pad:
        gout = jnp.pad(gout, ((0, 0), (0, pad), (0, 0)))
    pt = pos_p.shape[1] // _TILE
    dfm, dpos = pl.pallas_call(
        functools.partial(_bwd_kernel, g=g, precision=_precision_for(fm.dtype)),
        grid=(b, pt),
        in_specs=[
            pl.BlockSpec((1, g * g, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TILE, 2), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TILE, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, g * g, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TILE, 2), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, g * g, c), jnp.float32),
            jax.ShapeDtypeStruct((b, pos_p.shape[1], 2), jnp.float32),
        ),
        interpret=interpret,
    )(fm.reshape(b, g * g, c), pos_p, gout)
    if pad:
        dpos = dpos[:, :p]
    return dfm.reshape(b, g, g, c), dpos


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def bilinear_pool_pallas(fm, pos, interpret=False):
    """fm (B, G, G, C), pos (B, P, 2) in [0,1] -> (B, P, C)."""
    return _fwd_call(fm, pos, interpret)


def _vjp_fwd(fm, pos, interpret):
    return _fwd_call(fm, pos, interpret), (fm, pos)


def _vjp_bwd(interpret, res, gout):
    fm, pos = res
    dfm, dpos = _bwd_call(fm, pos, gout, interpret)
    return dfm.astype(fm.dtype), dpos.astype(pos.dtype)


bilinear_pool_pallas.defvjp(_vjp_fwd, _vjp_bwd)
