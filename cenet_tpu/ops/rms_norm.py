"""Fused Pallas RMSNorm kernel (TPU).

TPU-native replacement for the reference's optional apex FusedRMSNorm fast path
(``multihead_diffattn.py:7-11``), with the same fp32-statistics semantics as
``rms_norm.py:15-22``. Forward is a single VMEM-resident kernel; backward uses a
custom VJP computed in fp32 (the analytic RMSNorm gradient, one fused kernel's
worth of elementwise/reduce work — left to XLA which fuses it fully).

Falls back to the plain XLA implementation off-TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _rms_kernel(x_ref, o_ref, *, eps: float):
    x = x_ref[:].astype(jnp.float32)
    inv = jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=-1, keepdims=True) + eps)
    o_ref[:] = (x * inv).astype(o_ref.dtype)


def _rms_weight_kernel(x_ref, w_ref, o_ref, *, eps: float):
    x = x_ref[:].astype(jnp.float32)
    inv = jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=-1, keepdims=True) + eps)
    o_ref[:] = (x * inv * w_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def _xla_rms(x, weight, eps):
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt(jnp.mean(jnp.square(xf), axis=-1, keepdims=True) + eps)
    if weight is not None:
        y = y * weight.astype(jnp.float32)
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def rms_norm(x: jnp.ndarray, weight, eps: float = 1e-5) -> jnp.ndarray:
    return _rms_fwd_impl(x, weight, eps)


def _rms_fwd_impl(x, weight, eps):
    if jax.default_backend() in ("cpu", "gpu"):
        return _xla_rms(x, weight, eps)
    orig_shape = x.shape
    d = orig_shape[-1]
    rows = 1
    for s in orig_shape[:-1]:
        rows *= s
    x2 = x.reshape(rows, d)
    block_rows = min(rows, 1024)
    pad = (-rows) % block_rows
    if pad:
        x2 = jnp.concatenate([x2, jnp.zeros((pad, d), x2.dtype)], axis=0)
    grid = (x2.shape[0] // block_rows,)
    if weight is None:
        out = pl.pallas_call(
            functools.partial(_rms_kernel, eps=eps),
            out_shape=jax.ShapeDtypeStruct(x2.shape, x.dtype),
            grid=grid,
            in_specs=[pl.BlockSpec((block_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((block_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        )(x2)
    else:
        out = pl.pallas_call(
            functools.partial(_rms_weight_kernel, eps=eps),
            out_shape=jax.ShapeDtypeStruct(x2.shape, x.dtype),
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((block_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        )(x2, weight)
    if pad:
        out = out[:rows]
    return out.reshape(orig_shape)


def _rms_fwd(eps, x, weight):
    return _rms_fwd_impl(x, weight, eps), (x, weight)


def _rms_bwd(eps, res, g):
    x, weight = res
    xf = x.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    d = x.shape[-1]
    ms = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) + eps
    inv = jax.lax.rsqrt(ms)
    if weight is not None:
        gw = jnp.sum((gf * xf * inv).reshape(-1, d), axis=0).astype(weight.dtype)
        gf = gf * weight.astype(jnp.float32)
    else:
        gw = None
    # d/dx [x * inv]: inv * g - x * inv^3 / d * sum(g * x)
    dot = jnp.sum(gf * xf, axis=-1, keepdims=True)
    dx = (gf * inv - xf * (inv**3) * dot / d).astype(x.dtype)
    return dx, gw


rms_norm.defvjp(
    lambda x, weight, eps: (_rms_fwd_impl(x, weight, eps), (x, weight)),
    _rms_bwd,
)
