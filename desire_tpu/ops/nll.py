"""Pallas TPU kernel: fused bivariate-Gaussian NLL + per-lane masked
reduction (SURVEY §7.2 kernel (c)).

Computes, in one pass over a row tile, the per-(row, lane) *summed* negative
log-likelihood of the target trajectory under the decoder's per-step
bivariate Gaussians — the reference's ``get_reconstr_loss`` semantics
(-log(max(pdf, 1e-20)) summed over steps, model/model.py:525-550) — without
materializing the (N, K, T) intermediates XLA's unfused path writes.

Layouts: the five gaussian channels arrive as (N, K*T) planes with lanes
ordered k-major (k0t0..k0tT, k1t0..). In-kernel shape changes are expressed
as tiny matmuls against iota-built selector matrices (broadcast (T)->(K*T),
reduce (K*T)->(K)) — Mosaic-friendly: no lane reshapes, everything VPU/MXU.

Custom VJP with the analytic gradients; rows where the log floor is active
get zero gradient, matching ``jnp.maximum``'s subgradient in the XLA path.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 256
_LOG_FLOOR = math.log(1e-20)
_LOG_2PI = math.log(2.0 * math.pi)
_LOG_SIGMA_MIN = -9.0
_LOG_SIGMA_MAX = 6.0
_RHO_MAX = 0.999


def _expand_t(x, k, t):
    """(TILE, T) -> (TILE, K*T), k-major lanes, via selector matmul."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (t, k * t), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (t, k * t), 1)
    sel = (cols % t == rows).astype(x.dtype)
    return jnp.dot(x, sel, preferred_element_type=x.dtype)


def _expand_k(x, k, t):
    """(TILE, K) -> (TILE, K*T), k-major lanes."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (k, k * t), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (k, k * t), 1)
    sel = (cols // t == rows).astype(x.dtype)
    return jnp.dot(x, sel, preferred_element_type=x.dtype)


def _reduce_t(x, k, t):
    """(TILE, K*T) -> (TILE, K): sum over each lane's T steps."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (k * t, k), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (k * t, k), 1)
    sel = (rows // t == cols).astype(x.dtype)
    return jnp.dot(x, sel, preferred_element_type=x.dtype)


def _common(mux, muy, lsx, lsy, rraw, tx, ty):
    sx = jnp.exp(jnp.clip(lsx, _LOG_SIGMA_MIN, _LOG_SIGMA_MAX))
    sy = jnp.exp(jnp.clip(lsy, _LOG_SIGMA_MIN, _LOG_SIGMA_MAX))
    rho = jnp.tanh(rraw) * _RHO_MAX
    nx = (tx - mux) / sx
    ny = (ty - muy) / sy
    omr = 1.0 - rho * rho
    z = nx * nx + ny * ny - 2.0 * rho * nx * ny
    logp = (-z / (2.0 * omr) - _LOG_2PI - jnp.log(sx) - jnp.log(sy)
            - 0.5 * jnp.log(omr))
    return sx, sy, rho, nx, ny, omr, z, logp


def _load(refs, k, t):
    f32 = jnp.float32
    mux, muy, lsx, lsy, rraw = (r[:].astype(f32) for r in refs[:5])
    tx = _expand_t(refs[5][:].astype(f32), k, t)
    ty = _expand_t(refs[6][:].astype(f32), k, t)
    m = _expand_t(refs[7][:].astype(f32), k, t)
    return mux, muy, lsx, lsy, rraw, tx, ty, m


def _fwd_kernel(*refs, k, t):
    mux, muy, lsx, lsy, rraw, tx, ty, m = _load(refs[:8], k, t)
    out_ref = refs[8]
    *_, logp = _common(mux, muy, lsx, lsy, rraw, tx, ty)
    nll = -jnp.maximum(logp, _LOG_FLOOR) * m          # (TILE, K*T)
    out_ref[:] = _reduce_t(nll, k, t)


def _bwd_kernel(*refs, k, t):
    (mux_r, muy_r, lsx_r, lsy_r, rho_r, tx_r, ty_r, m_r, g_r,
     dmux_r, dmuy_r, dlsx_r, dlsy_r, drho_r) = refs
    f32 = jnp.float32
    mux, muy, lsx, lsy, rraw, tx, ty, m = _load(
        (mux_r, muy_r, lsx_r, lsy_r, rho_r, tx_r, ty_r, m_r), k, t)
    sx, sy, rho, nx, ny, omr, z, logp = _common(mux, muy, lsx, lsy, rraw,
                                                tx, ty)
    active = (logp > _LOG_FLOOR).astype(f32)
    g = _expand_k(g_r[:].astype(f32), k, t)           # (TILE, K*T)
    # d total / d logp_t = -g * m * active
    w = -g * m * active
    dmux_r[:] = (w * (nx - rho * ny) / (sx * omr)).astype(dmux_r.dtype)
    dmuy_r[:] = (w * (ny - rho * nx) / (sy * omr)).astype(dmuy_r.dtype)
    in_x = ((lsx > _LOG_SIGMA_MIN) & (lsx < _LOG_SIGMA_MAX)).astype(f32)
    in_y = ((lsy > _LOG_SIGMA_MIN) & (lsy < _LOG_SIGMA_MAX)).astype(f32)
    dlsx_r[:] = (w * (nx * (nx - rho * ny) / omr - 1.0) * in_x
                 ).astype(dlsx_r.dtype)
    dlsy_r[:] = (w * (ny * (ny - rho * nx) / omr - 1.0) * in_y
                 ).astype(dlsy_r.dtype)
    dlogp_drho = nx * ny / omr - z * rho / (omr * omr) + rho / omr
    dtanh = (1.0 - jnp.square(jnp.tanh(rraw))) * _RHO_MAX
    drho_r[:] = (w * dlogp_drho * dtanh).astype(drho_r.dtype)


def _split_planes(raw5, n, k, t):
    """(N, K, T, 5) -> five (N, K*T) planes (k-major lanes)."""
    r = raw5.reshape(n, k * t, 5)
    return tuple(r[..., i] for i in range(5))


def _pad(a, tile):
    n = a.shape[0]
    p = (-n) % tile
    if p:
        a = jnp.pad(a, ((0, p),) + ((0, 0),) * (a.ndim - 1))
    return a


def _spec(width, tile=_TILE):
    return pl.BlockSpec((tile, width), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


def _fwd_call(raw5, target, step_mask, interpret=False):
    n, k, t, _ = raw5.shape
    arrs = [*_split_planes(raw5, n, k, t),
            target[..., 0], target[..., 1], step_mask]
    arrs = [_pad(a, _TILE) for a in arrs]
    np_ = arrs[0].shape[0]
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, k=k, t=t),
        grid=(np_ // _TILE,),
        in_specs=[_spec(k * t)] * 5 + [_spec(t)] * 3,
        out_specs=_spec(k),
        out_shape=jax.ShapeDtypeStruct((np_, k), jnp.float32),
        interpret=interpret,
    )(*arrs)
    return out[:n]


def _bwd_call(raw5, target, step_mask, g, interpret=False):
    n, k, t, _ = raw5.shape
    arrs = [*_split_planes(raw5, n, k, t),
            target[..., 0], target[..., 1], step_mask, g]
    arrs = [_pad(a, _TILE) for a in arrs]
    np_ = arrs[0].shape[0]
    f32 = jnp.float32
    grads = pl.pallas_call(
        functools.partial(_bwd_kernel, k=k, t=t),
        grid=(np_ // _TILE,),
        in_specs=[_spec(k * t)] * 5 + [_spec(t)] * 3 + [_spec(k)],
        out_specs=tuple([_spec(k * t)] * 5),
        out_shape=tuple(jax.ShapeDtypeStruct((np_, k * t), f32)
                        for _ in range(5)),
        interpret=interpret,
    )(*arrs)
    draw5 = jnp.stack([gr[:n] for gr in grads], axis=-1)
    return draw5.reshape(n, k, t, 5).astype(raw5.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def bivariate_nll_pallas(raw5, target, step_mask, interpret=False):
    """Fused per-lane summed NLL.

    raw5 (N, K, T, 5) [mu_x, mu_y, log_sx, log_sy, rho_raw];
    target (N, T, 2); step_mask (N, T). Returns (N, K) float32 — the
    step-summed floored NLL per hypothesis lane (reference C14 semantics:
    exactly losses.bivariate_nll summed over steps).
    Gradients flow to raw5 only (targets/masks are data).
    """
    return _fwd_call(raw5, target, step_mask, interpret)


def _vjp_fwd(raw5, target, step_mask, interpret):
    return (_fwd_call(raw5, target, step_mask, interpret),
            (raw5, target, step_mask))


def _vjp_bwd(interpret, res, g):
    raw5, target, step_mask = res
    draw5 = _bwd_call(raw5, target, step_mask, g.astype(jnp.float32),
                      interpret)
    return draw5, None, None


bivariate_nll_pallas.defvjp(_vjp_fwd, _vjp_bwd)
