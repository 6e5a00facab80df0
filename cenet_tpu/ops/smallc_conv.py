"""Pallas small-channel KxK convolution via tap-packed MXU matmuls.

The OutHead image path convolves the raw 224² input at 32 channels with 5×5
kernels (reference ``out.py:39-44``). XLA's strided-conv lowering runs this at
~15% MFU because the 32-channel contraction wastes 3/4 of each 128-lane MXU pass.
Here the convolution is Σ_taps shift(x)·W[tap], with ``g = ⌊128/C_in⌋`` taps
CONCATENATED along the contraction dim so every MXU pass is full:

    acc += [shift_1(x) | … | shift_g(x)] @ [W_1; …; W_g]     (K = g·C_in ≈ 128)

One grid program per image keeps the padded map and all shifted views in VMEM.
Custom VJP: dx is the same kernel with the spatially-flipped, in/out-swapped
weights; dw packs the same shifted views against dout with a revisited fp32
accumulator over the batch.

Requirements: stride 1, square kernel, symmetric padding, fits VMEM. Exact
``lax.conv_general_dilated`` fallback elsewhere (:func:`conv_small_c`).

STATUS: UNROUTED — routing reverted (round 2, PERF_NOTES): Mosaic compile time
exploded (>25 min for the OutHead instance; giant unrolled shifted-concat IR)
and the runtime win was never measured. Kept as a tested experiment. Revisit
only with a streamed/blocked formulation that keeps the kernel IR small.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_96M = pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024)


def _lax_conv(x, w, padding: int):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), ((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _tap_groups(k: int, cin: int):
    """Group the k² taps so each group's packed contraction is ≤ 128 wide."""
    per = max(1, 128 // cin)
    taps = [(dy, dx) for dy in range(k) for dx in range(k)]
    return [taps[i : i + per] for i in range(0, len(taps), per)], per


def _fwd_kernel(x_ref, w_ref, o_ref, scratch, *, k: int, padding: int, groups, h: int, wd: int):
    cin = x_ref.shape[3]
    cout = o_ref.shape[3]
    p = padding
    scratch[:] = jnp.zeros_like(scratch)
    scratch[p : p + h, p : p + wd] = x_ref[0]
    n = h * wd
    acc = jnp.zeros((n, cout), jnp.float32)
    for gi, taps in enumerate(groups):
        xg = jnp.concatenate(
            [scratch[dy : dy + h, dx : dx + wd].reshape(n, cin) for (dy, dx) in taps], axis=-1
        )
        wg = w_ref[gi, : len(taps) * cin]
        acc += jax.lax.dot_general(xg, wg, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    o_ref[0] = acc.reshape(h, wd, cout).astype(o_ref.dtype)


def _dw_kernel(x_ref, g_ref, dw_ref, scratch, *, padding: int, groups, per: int, h: int, wd: int):
    cin = x_ref.shape[3]
    cout = g_ref.shape[3]
    p = padding
    scratch[:] = jnp.zeros_like(scratch)
    scratch[p : p + h, p : p + wd] = x_ref[0]
    n = h * wd
    g = g_ref[0].reshape(n, cout)
    first = pl.program_id(0) == 0
    parts = []
    for taps in groups:
        xg = jnp.concatenate(
            [scratch[dy : dy + h, dx : dx + wd].reshape(n, cin) for (dy, dx) in taps], axis=-1
        )
        dwg = jax.lax.dot_general(xg, g, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        if dwg.shape[0] < per * cin:  # zero-pad the remainder group
            dwg = jnp.concatenate([dwg, jnp.zeros((per * cin - dwg.shape[0], cout), jnp.float32)])
        parts.append(dwg)
    dwv = jnp.stack(parts)  # (ng, per*cin, cout)

    @pl.when(first)
    def _():
        dw_ref[:, :, :] = dwv

    @pl.when(jnp.logical_not(first))
    def _():
        dw_ref[:, :, :] += dwv


def _pallas_conv_fwd(x, w, padding: int, interpret: bool = False):
    b, h, wd, cin = x.shape
    k = w.shape[0]
    cout = w.shape[3]
    groups, per = _tap_groups(k, cin)
    ng = len(groups)
    # packed weights (ng, per*cin, cout), zero-padded in the last group
    wm = jnp.zeros((ng, per * cin, cout), jnp.float32)
    wflat = w.reshape(k, k, cin, cout)
    for gi, taps in enumerate(groups):
        for ti, (dy, dx) in enumerate(taps):
            wm = wm.at[gi, ti * cin : (ti + 1) * cin].set(wflat[dy, dx])
    wm = wm.astype(x.dtype)

    return pl.pallas_call(
        functools.partial(_fwd_kernel, k=k, padding=padding, groups=groups, h=h, wd=wd),
        out_shape=jax.ShapeDtypeStruct((b, h, wd, cout), x.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, wd, cin), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ng, per * cin, cout), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, wd, cout), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((h + 2 * padding, wd + 2 * padding, cin), x.dtype)],
        compiler_params=_VMEM_96M,
        interpret=interpret,
    )(x, wm)


def _pallas_conv_dw(x, g, k: int, padding: int, interpret: bool = False):
    """dw (k, k, cin, cout) fp32: ONE pallas_call over all tap groups, batch-accumulated."""
    b, h, wd, cin = x.shape
    cout = g.shape[3]
    groups, per = _tap_groups(k, cin)
    ng = len(groups)
    part = pl.pallas_call(
        functools.partial(_dw_kernel, padding=padding, groups=groups, per=per, h=h, wd=wd),
        out_shape=jax.ShapeDtypeStruct((ng, per * cin, cout), jnp.float32),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, wd, cin), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, wd, cout), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ng, per * cin, cout), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((h + 2 * padding, wd + 2 * padding, cin), x.dtype)],
        compiler_params=_VMEM_96M,
        interpret=interpret,
    )(x, g)
    dw = jnp.zeros((k, k, cin, cout), jnp.float32)
    for gi, taps in enumerate(groups):
        for ti, (dy, dx) in enumerate(taps):
            dw = dw.at[dy, dx].set(part[gi, ti * cin : (ti + 1) * cin])
    return dw


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _conv_small_c_pallas(x, w, padding):
    return _pallas_conv_fwd(x, w, padding)


def _csc_fwd(x, w, padding):
    return _pallas_conv_fwd(x, w, padding), (x, w)


def _csc_bwd(padding, res, g):
    x, w = res
    k = w.shape[0]
    # dx: SAME-geometry conv of g with flipped, in/out-swapped weights. Valid for
    # the shape-preserving case padding == k//2 (enforced by the dispatcher).
    wt = jnp.flip(jnp.flip(w, 0), 1).transpose(0, 1, 3, 2)
    dx = _pallas_conv_fwd(g, wt, padding)  # k-1-p == p for odd k at SAME padding
    dw = _pallas_conv_dw(x, g, k, padding)
    return dx, dw.astype(w.dtype)


_conv_small_c_pallas.defvjp(_csc_fwd, _csc_bwd)


def conv_small_c(x: jnp.ndarray, w: jnp.ndarray, padding: int) -> jnp.ndarray:
    """Stride-1 KxK conv, NHWC, HWIO weights; Pallas tap-packed path on TPU for
    small channel counts at shape-preserving padding; lax fallback elsewhere."""
    b, h, wd, cin = x.shape
    k = w.shape[0]
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    vmem_need = ((h + 2 * padding) * (wd + 2 * padding) * cin * 2  # scratch bf16
                 + h * wd * max(1, 128 // cin) * cin * 4           # packed group fp32-ish
                 + h * wd * w.shape[3] * 4)                        # accumulator
    ok = (
        on_tpu and w.shape[0] == w.shape[1] and padding == k // 2
        and 8 <= cin <= 32 and cin * k * k <= 2048
        and h * wd >= 4096 and (h * wd) % 8 == 0  # Mosaic reshape alignment + worth it
        and vmem_need <= 80 * 1024 * 1024 and h >= k and wd >= k
    )
    if ok:
        try:
            return _conv_small_c_pallas(x, w, padding)
        except Exception:
            pass
    return _lax_conv(x, w, padding)
