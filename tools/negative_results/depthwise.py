"""Fused Pallas depthwise 3×3 convolution (stride 1, symmetric padding, dilation).

Depthwise convs are the model's most common primitive after matmuls: every PVT
MLP block carries a DWConv (reference ``pvtv2.py:359-370``), CFAM's channel MLP
a k=3 dwconv (``cfam.py:118-134``), and each MultiOrderDWConv branch a dilated
depthwise (``cfam.py:162-241`` via SepConvBN). XLA lowers them as generic
convolutions at a fraction of the VPU bound; here the whole (H, W, C) map sits in
VMEM and the 9 taps are shifted multiply-adds.

Forward-only fusion surface (bias handled by the caller); custom VJP:
* dx = depthwise conv of dout with the spatially flipped kernel (same kernel);
* dw = per-tap reduction Σ_{y,x} x_shifted ∘ dout, accumulated over batch.

Falls back to ``lax.conv_general_dilated`` off-TPU or for shapes that do not fit
VMEM (see :func:`depthwise_conv`).

STATUS: UNROUTED — measured negative (round 2, PERF_NOTES). XLA's depthwise
lowering already runs at the elementwise/HBM floor at every model shape
(lax ≈ pallas ≈ same-shape elementwise on chip), so routing this kernel buys
nothing. Kept as a tested, documented negative result; do not re-route without
a new profile showing the dw stage hot.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_96M = pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024)


def _lax_depthwise(x, w, dilation: int):
    c = x.shape[-1]
    pad = dilation
    return jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(1, 1),
        padding=((pad, pad), (pad, pad)),
        rhs_dilation=(dilation, dilation),
        feature_group_count=c,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _fwd_kernel(x_ref, w_ref, o_ref, scratch, *, dilation: int):
    h, wd, c = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]
    r = dilation
    scratch[:] = jnp.zeros_like(scratch)
    scratch[r : r + h, r : r + wd] = x_ref[0]
    acc = jnp.zeros((h, wd, c), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            tap = w_ref[dy, dx]  # (C,)
            acc += scratch[dy * r : dy * r + h, dx * r : dx * r + wd].astype(jnp.float32) * tap
    o_ref[0] = acc.astype(o_ref.dtype)


def _dw_kernel(x_ref, g_ref, dw_ref, scratch, *, dilation: int):
    h, wd, c = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]
    r = dilation
    scratch[:] = jnp.zeros_like(scratch)
    scratch[r : r + h, r : r + wd] = x_ref[0]
    g = g_ref[0].astype(jnp.float32)
    first = pl.program_id(0) == 0
    taps = []
    for dy in range(3):
        for dx in range(3):
            taps.append(
                jnp.sum(scratch[dy * r : dy * r + h, dx * r : dx * r + wd].astype(jnp.float32) * g, axis=(0, 1))
            )
    dwv = jnp.stack(taps).reshape(3, 3, c)

    @pl.when(first)
    def _():
        dw_ref[:, :, :] = dwv

    @pl.when(jnp.logical_not(first))
    def _():
        dw_ref[:, :, :] += dwv


def _pallas_depthwise_fwd(x, w, dilation: int, interpret: bool = False):
    b, h, wd, c = x.shape
    w33 = w.reshape(3, 3, c).astype(jnp.float32)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, dilation=dilation),
        out_shape=jax.ShapeDtypeStruct((b, h, wd, c), x.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, wd, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, c), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, wd, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((h + 2 * dilation, wd + 2 * dilation, c), x.dtype)],
        compiler_params=_VMEM_96M,
        interpret=interpret,
    )(x, w33)


def _pallas_depthwise_dw(x, g, dilation: int, interpret: bool = False):
    b, h, wd, c = x.shape
    dw = pl.pallas_call(
        functools.partial(_dw_kernel, dilation=dilation),
        out_shape=jax.ShapeDtypeStruct((3, 3, c), jnp.float32),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, wd, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, wd, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, 3, c), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((h + 2 * dilation, wd + 2 * dilation, c), x.dtype)],
        compiler_params=_VMEM_96M,
        interpret=interpret,
    )(x, g)
    return dw


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _depthwise_pallas(x, w, dilation):
    return _pallas_depthwise_fwd(x, w, dilation)


def _dp_fwd(x, w, dilation):
    return _pallas_depthwise_fwd(x, w, dilation), (x, w)


def _dp_bwd(dilation, res, g):
    x, w = res
    c = x.shape[-1]
    # dx: depthwise conv of g with the spatially flipped kernel
    wf = jnp.flip(jnp.flip(w.reshape(3, 3, c), 0), 1)
    dx = _pallas_depthwise_fwd(g, wf, dilation)
    dw = _pallas_depthwise_dw(x, g, dilation).reshape(w.shape)
    return dx, dw.astype(w.dtype)


_depthwise_pallas.defvjp(_dp_fwd, _dp_bwd)


def depthwise_conv3x3(x: jnp.ndarray, w: jnp.ndarray, dilation: int = 1) -> jnp.ndarray:
    """Depthwise 3×3, stride 1, padding=dilation (shape-preserving), NHWC.

    ``w``: (3, 3, 1, C) HWIO (the Conv2d grouped layout). Pallas on TPU when the
    padded map fits VMEM; exact ``lax.conv_general_dilated`` fallback elsewhere.
    """
    b, h, wd, c = x.shape
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    # VMEM: (H+2r, W+2r, C) fp32 padded copy + fp32 accumulator + in/out blocks
    r = dilation
    fits = (h + 2 * r) * (wd + 2 * r) * c * 4 * 2 <= 48 * 1024 * 1024
    if on_tpu and fits and h >= 2 and wd >= 2:
        try:
            return _depthwise_pallas(x, w, dilation)
        except Exception:
            pass
    return _lax_depthwise(x, w, dilation)
