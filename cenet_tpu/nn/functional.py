"""Functional spatial ops with exact PyTorch/scipy semantics, designed for TPU.

The reference (xmindflow/cenet) leans on three resampling families:

* ``F.interpolate(mode='bilinear')`` with both ``align_corners`` conventions
  (e.g. FEA edge extraction at ``modules/dseb.py:63-69``, up-blocks at
  ``modules/blocks.py:195,210``, image-pool branch ``modules/cfam.py:217``);
* ``scipy.ndimage.zoom`` (cubic spline, order 3 / nearest, order 0) on the data and
  eval paths (``datasets/dataset_synapse.py:111``, ``utils/utils_synapse.py:58-71``);
* ``nn.Upsample(scale_factor=2)`` nearest (EUCB, ``modules/blocks.py:304``).

Rather than gather loops (which map poorly to TPU), every 1-D resampling operator is
expressed as a dense interpolation matrix applied separably:  ``out = W_h @ x @ W_w^T``.
The matrices are tiny (≤ 512×512) host-side numpy constants, the application is batched
MXU matmuls — bit-exact linear-operator semantics (incl. scipy's global spline
prefilter, which is linear) at matmul speed.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# 1-D interpolation operator matrices (host-side, cached)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def torch_bilinear_matrix(
    in_size: int, out_size: int, align_corners: bool, scale: Optional[float] = None
) -> np.ndarray:
    """(out, in) matrix replicating torch ``F.interpolate`` linear sampling on one axis.

    torch (antialias=False) samples the input with bilinear interpolation at
    ``src = o * (in-1)/(out-1)`` (align_corners) or ``max((o+0.5)/s - 0.5, 0)`` where
    ``s`` is the *caller-provided* scale_factor when one was given
    (recompute_scale_factor=False), else ``out/in``.
    """
    s = scale if scale is not None else out_size / in_size
    w = np.zeros((out_size, in_size), dtype=np.float64)
    for o in range(out_size):
        if align_corners:
            src = 0.0 if out_size == 1 else o * (in_size - 1) / (out_size - 1)
        else:
            src = max((o + 0.5) / s - 0.5, 0.0)
        i0 = int(np.floor(src))
        i0 = min(i0, in_size - 1)
        i1 = min(i0 + 1, in_size - 1)
        lam = src - i0
        w[o, i0] += 1.0 - lam
        w[o, i1] += lam
    return w.astype(np.float32)


@functools.lru_cache(maxsize=None)
def scipy_zoom_matrix(in_size: int, out_size: int, order: int) -> np.ndarray:
    """(out, in) matrix replicating 1-D ``scipy.ndimage.zoom(..., order=order)``.

    Built by pushing the identity through scipy itself, so the operator (including the
    global spline prefilter) is reproduced exactly; zoom is linear in its input.
    """
    from scipy.ndimage import zoom as _zoom

    eye = np.eye(in_size, dtype=np.float64)
    cols = _zoom(eye, (1.0, out_size / in_size), order=order)
    assert cols.shape == (in_size, out_size), (cols.shape, in_size, out_size)
    return np.ascontiguousarray(cols.T).astype(np.float32)


@functools.lru_cache(maxsize=None)
def adaptive_avg_pool_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) averaging matrix for torch ``AdaptiveAvgPool1d`` bucket semantics."""
    w = np.zeros((out_size, in_size), dtype=np.float64)
    for o in range(out_size):
        start = (o * in_size) // out_size
        end = -((-(o + 1) * in_size) // out_size)  # ceil
        w[o, start:end] = 1.0 / (end - start)
    return w.astype(np.float32)


# ---------------------------------------------------------------------------
# Separable application (NHWC)
# ---------------------------------------------------------------------------


def _apply_separable(x: jnp.ndarray, wh: np.ndarray, ww: np.ndarray) -> jnp.ndarray:
    """Apply per-axis operator matrices to an NHWC tensor via batched matmuls."""
    dtype = x.dtype
    wh_j = jnp.asarray(wh, dtype=dtype)
    ww_j = jnp.asarray(ww, dtype=dtype)
    # (B,H,W,C): contract H then W. HIGHEST precision: these small interpolation
    # matmuls define data/eval-path parity and must not drop to bf16 on the MXU.
    x = jnp.einsum("oh,bhwc->bowc", wh_j, x, precision=jax.lax.Precision.HIGHEST)
    x = jnp.einsum("pw,bowc->bopc", ww_j, x, precision=jax.lax.Precision.HIGHEST)
    return x


def resize_bilinear(x: jnp.ndarray, out_hw: tuple[int, int], align_corners: bool = False) -> jnp.ndarray:
    """torch ``F.interpolate(x, size=out_hw, mode='bilinear', align_corners=...)`` (NHWC)."""
    h, w = x.shape[1], x.shape[2]
    oh, ow = out_hw
    if (oh, ow) == (h, w):
        return x
    return _apply_separable(
        x,
        torch_bilinear_matrix(h, oh, align_corners),
        torch_bilinear_matrix(w, ow, align_corners),
    )


def resize_bilinear_by_scale(x: jnp.ndarray, scale: float, align_corners: bool = False) -> jnp.ndarray:
    """torch ``F.interpolate(x, scale_factor=scale, mode='bilinear')``: out = floor(in*s),
    with the given scale (not out/in) used in the coordinate mapping."""
    h, w = x.shape[1], x.shape[2]
    oh, ow = int(h * scale), int(w * scale)
    if (oh, ow) == (h, w) and align_corners:
        return x
    return _apply_separable(
        x,
        torch_bilinear_matrix(h, oh, align_corners, scale),
        torch_bilinear_matrix(w, ow, align_corners, scale),
    )


def zoom_resize(x: jnp.ndarray, out_hw: tuple[int, int], order: int = 3) -> jnp.ndarray:
    """``scipy.ndimage.zoom`` to ``out_hw`` with spline ``order``, batched on device (NHWC)."""
    h, w = x.shape[1], x.shape[2]
    oh, ow = out_hw
    if (oh, ow) == (h, w):
        return x
    return _apply_separable(x, scipy_zoom_matrix(h, oh, order), scipy_zoom_matrix(w, ow, order))


@functools.lru_cache(maxsize=None)
def _zoom_nearest_indices(in_size: int, out_size: int) -> tuple[np.ndarray, np.ndarray]:
    """Output→input index map (+validity) of 1-D scipy zoom with order=0.

    Derived from the identity-matrix push-through so scipy's fp boundary behaviour
    (coordinates landing infinitesimally outside → cval 0) is reproduced exactly.
    """
    m = scipy_zoom_matrix(in_size, out_size, order=0)
    idx = np.argmax(m, axis=1).astype(np.int32)
    valid = m.sum(axis=1) > 0
    return idx, valid


def zoom_nearest(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """``scipy.ndimage.zoom(..., order=0)`` (nearest) for any dtype, incl. int labels."""
    h, w = x.shape[1], x.shape[2]
    oh, ow = out_hw
    if (oh, ow) == (h, w):
        return x
    idx_h, valid_h = _zoom_nearest_indices(h, oh)
    idx_w, valid_w = _zoom_nearest_indices(w, ow)
    x = jnp.take(x, jnp.asarray(idx_h), axis=1)
    x = jnp.take(x, jnp.asarray(idx_w), axis=2)
    valid = jnp.asarray(np.logical_and.outer(valid_h, valid_w))[None, :, :, None]
    return jnp.where(valid, x, jnp.zeros_like(x))


def upsample_nearest(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """torch ``nn.Upsample(scale_factor=f)`` (nearest) on NHWC."""
    x = jnp.repeat(x, factor, axis=1)
    x = jnp.repeat(x, factor, axis=2)
    return x


def adaptive_avg_pool2d(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """torch ``AdaptiveAvgPool2d(out_hw)`` on NHWC."""
    h, w = x.shape[1], x.shape[2]
    return _apply_separable(x, adaptive_avg_pool_matrix(h, out_hw[0]), adaptive_avg_pool_matrix(w, out_hw[1]))


def max_pool2d(x: jnp.ndarray, kernel: int = 2, stride: int = 2) -> jnp.ndarray:
    """torch ``MaxPool2d(kernel, stride)`` (no padding) on NHWC."""
    return jax.lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        jax.lax.max,
        window_dimensions=(1, kernel, kernel, 1),
        window_strides=(1, stride, stride, 1),
        padding="VALID",
    )


def channel_shuffle(x: jnp.ndarray, groups: int) -> jnp.ndarray:
    """torch-style channel shuffle on NHWC (reference ``modules/blocks.py:285-294``)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, groups, c // groups)
    x = jnp.swapaxes(x, 3, 4)
    return x.reshape(b, h, w, c)


# ---------------------------------------------------------------------------
# Activations with exact torch semantics
# ---------------------------------------------------------------------------


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """GELU with torch ``nn.GELU()`` (exact erf) semantics in fp32.

    Under the bf16 training policy the tanh approximation is used instead: its max
    deviation from erf-GELU (~1e-3 absolute) is below bf16 resolution, and erf is
    markedly more expensive on the TPU VPU (measured ~0.5 ms per 12.8M-element
    tensor). fp32 paths (parity eval, checkpoint comparison) keep exact erf.
    """
    if x.dtype == jnp.bfloat16:
        return jax.nn.gelu(x, approximate=True)
    return jax.nn.gelu(x, approximate=False)


def leaky_relu(x: jnp.ndarray, negative_slope: float = 0.2) -> jnp.ndarray:
    return jax.nn.leaky_relu(x, negative_slope)


def silu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.silu(x)


def relu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.relu(x)


def hardswish(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.hard_swish(x)


def relu6(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.minimum(jax.nn.relu(x), 6.0)


def softmax_fp32(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Softmax computed in float32 and cast back (reference ``multihead_diffattn.py:108``)."""
    y = jax.nn.softmax(x.astype(jnp.float32), axis=axis)
    return y.astype(x.dtype)


def conv5x5_packed(x: "jnp.ndarray", w: "jnp.ndarray") -> "jnp.ndarray":
    """Exact 5×5 stride-1 SAME conv computed as a 3×3 conv on 2×2 space-to-depth
    packed data (pure XLA).

    For small channel counts the direct 5×5 conv uses a fraction of the MXU's
    128 contraction lanes; packing 2×2 spatial phases into channels makes the
    packed conv (3, 3, 4·Cin, 4·Cout) — identical math (the restructured kernel
    is the same taps with zeros), ~4× fewer MXU output tiles. Requires even H, W.
    """
    b, h, wd, cin = x.shape
    cout = w.shape[-1]
    xp = x.reshape(b, h // 2, 2, wd // 2, 2, cin).transpose(0, 1, 3, 2, 4, 5)
    xp = xp.reshape(b, h // 2, wd // 2, 4 * cin)
    w3 = jnp.zeros((3, 3, 2, 2, cin, 2, 2, cout), w.dtype)
    for qy in range(2):
        for ky in range(5):
            iy = qy - 2 + ky
            py = iy % 2
            dy = (iy - py) // 2 + 1
            for qx in range(2):
                for kx in range(5):
                    ix = qx - 2 + kx
                    px = ix % 2
                    dx = (ix - px) // 2 + 1
                    w3 = w3.at[dy, dx, py, px, :, qy, qx, :].set(w[ky, kx])
    w3 = w3.reshape(3, 3, 4 * cin, 4 * cout)
    yp = jax.lax.conv_general_dilated(
        xp, w3, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    y = yp.reshape(b, h // 2, wd // 2, 2, 2, cout).transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(b, h, wd, cout)


# ---------------------------------------------------------------------------
# space-to-depth residency helpers (round 3)
#
# The OutHead image branch (reference ``out.py:41-44``: UnetResBlock(k=5) on the
# raw 224² image, then MaxPool 2×2/2) runs its 5×5 convs at ≤32 channels — <1/4
# MXU lane utilization per tap matmul. Living in 2×2 space-to-depth space makes
# the convs (3, 3, 4·Cin, 4·Cout) — MXU-dense — with ONE tiny pack of the
# 1-channel input and NO unpack: the trailing 2×2/2 maxpool is exactly a max
# over the four phase channels of one packed pixel (:func:`depth_phase_max`).
# Per-conv S2D packing was a measured negative (round 2: the pack/unpack
# transposes ate the MXU win); block-level residency amortizes one pack over
# the whole branch. Phase layout everywhere: channel (py·2+px)·C + c.
# ---------------------------------------------------------------------------


def space_to_depth2(x: "jnp.ndarray") -> "jnp.ndarray":
    """(B, H, W, C) → (B, H/2, W/2, 4·C), phase-major ((py·2+px)·C + c)."""
    b, h, w, c = x.shape
    xp = x.reshape(b, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return xp.reshape(b, h // 2, w // 2, 4 * c)


@jax.custom_vjp
def _phase_max4(x5: "jnp.ndarray") -> "jnp.ndarray":
    """Max over axis 3 (the 4-phase axis) with argmax-pinned backward routing.

    The stock reduce-max VJP masks on ``x == max`` where jit may rematerialize
    ``x`` with different fusion/reassociation than the forward — near-ties then
    route gradients to a different phase (measured: %-level conv-wgrad
    deviations under jit when a train-mode BN feeds the pool). Pinning the
    backward to a forward-computed integer argmax fixes that, and first-max tie
    semantics match torch's MaxPool2d (window raster order == phase order).

    Implemented as a ``custom_vjp`` rather than ``take_along_axis(argmax)``:
    the gather that take_along_axis lowers to ran at ~52 ms/step on the real
    chip (the round-3 d794de3 regression, caught by the round-4 profile — 61%%
    of the train step). Here the forward is a plain reduce-max and the backward
    is an elementwise one-hot multiply; no gather/scatter anywhere."""
    return jnp.max(x5, axis=3)


def _phase_max4_fwd(x5):
    # uint8 residual: values 0..3; 4x smaller than int32 over (B,H/2,W/2,C)
    return jnp.max(x5, axis=3), jnp.argmax(x5, axis=3).astype(jnp.uint8)


def _phase_max4_bwd(idx, g):
    sel = idx[:, :, :, None, :] == jnp.arange(4, dtype=jnp.uint8)[:, None]
    return (jnp.where(sel, g[:, :, :, None, :], jnp.zeros((), g.dtype)),)


_phase_max4.defvjp(_phase_max4_fwd, _phase_max4_bwd)


def depth_phase_max(x: "jnp.ndarray") -> "jnp.ndarray":
    """Max over the 4 spatial phases of an S2D tensor — exactly MaxPool 2×2/2 of
    the unpacked map: the pool window (2h..2h+1, 2w..2w+1) IS the four phases
    of packed pixel (h, w). Backward routing is argmax-pinned (``_phase_max4``)."""
    b, h2, w2, c4 = x.shape
    return _phase_max4(x.reshape(b, h2, w2, 4, c4 // 4))


@functools.lru_cache(maxsize=None)
def _s2d_tap_idx_5x5() -> np.ndarray:
    """(3,3,2,2,2,2) map (dy,dx,py,px,qy,qx) → raster 5×5 tap index, 25 = zero.

    Inverse of the forward mapping in :func:`conv5x5_packed`: iy = qy-2+ky,
    py = iy%2, dy = (iy-py)//2+1  ⇒  ky = 2·dy + py - qy (valid iff 0 ≤ ky < 5).
    """
    idx = np.full((3, 3, 2, 2, 2, 2), 25, np.int32)
    for dy in range(3):
        for dx in range(3):
            for py in range(2):
                for px in range(2):
                    for qy in range(2):
                        for qx in range(2):
                            ky = 2 * dy + py - qy
                            kx = 2 * dx + px - qx
                            if 0 <= ky < 5 and 0 <= kx < 5:
                                idx[dy, dx, py, px, qy, qx] = ky * 5 + kx
    return idx


def repack_s2d_5x5(w: "jnp.ndarray") -> "jnp.ndarray":
    """(5,5,cin,cout) → (3,3,4·cin,4·cout): the exact S2D kernel (same taps,
    zeros elsewhere; identical math to :func:`conv5x5_packed`'s loop-built
    kernel but as one constant-index gather — differentiable and cheap)."""
    cin, cout = w.shape[2], w.shape[3]
    wext = jnp.concatenate([w.reshape(25, cin, cout), jnp.zeros((1, cin, cout), w.dtype)])
    idx = jnp.asarray(_s2d_tap_idx_5x5().reshape(-1))
    w3 = jnp.take(wext, idx, axis=0).reshape(3, 3, 2, 2, 2, 2, cin, cout)
    w3 = w3.transpose(0, 1, 2, 3, 6, 4, 5, 7)  # (dy,dx,py,px,ci,qy,qx,co)
    return w3.reshape(3, 3, 4 * cin, 4 * cout)


def repack_s2d_1x1(w: "jnp.ndarray") -> "jnp.ndarray":
    """(1,1,cin,cout) → (1,1,4·cin,4·cout): phase-diagonal 1×1 kernel."""
    cin, cout = w.shape[2], w.shape[3]
    eye = jnp.eye(4, dtype=w.dtype)
    w4 = jnp.einsum("pq,io->piqo", eye, w[0, 0])
    return w4.reshape(1, 4 * cin, 4 * cout)[None]
