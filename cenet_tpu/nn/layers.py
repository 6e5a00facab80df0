"""Core layers with exact PyTorch numerical semantics, in flax.linen / NHWC.

Parameter naming/shapes are chosen so the torch→JAX checkpoint converter
(`cenet_tpu/convert/torch2jax.py`) is a pure name-map + transpose:

* ``Conv2d.weight``: HWIO  (torch OIHW → transpose (2,3,1,0))
* ``ConvTranspose2d.weight``: HWOI-from-torch-(I,O,kh,kw) → transpose (2,3,1,0)
* ``Dense.weight``: (in, out)  (torch (out,in) → transpose)
* norm params: ``weight``/``bias``; BatchNorm running stats in the ``batch_stats``
  collection as ``mean``/``var`` (torch ``running_mean``/``running_var``).

Mixed precision: parameters live in fp32; compute runs in the input dtype (bf16 under
the TPU policy) except normalization statistics / RMSNorm, which are fp32 islands,
mirroring the reference's AMP behaviour (``main_synapse.py:224-233``) and its explicit
fp32 pins (``rms_norm.py:19``, ``multihead_diffattn.py:108``).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from cenet_tpu.nn import functional as F

Dtype = Any


# ---------------------------------------------------------------------------
# Initializers (torch semantics)
# ---------------------------------------------------------------------------


def torch_default_conv_init(key, shape, dtype=jnp.float32):
    """torch Conv2d/Linear default: kaiming_uniform(a=√5) → U(±1/√fan_in).

    For HWIO conv weights fan_in = kh*kw*I; for (in,out) dense weights fan_in = in.
    """
    if len(shape) == 4:
        fan_in = shape[0] * shape[1] * shape[2]
    else:
        fan_in = shape[0]
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_bias_init_for(fan_in: int):
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def normal_init(std: float = 0.02):
    return nn.initializers.normal(stddev=std)


def trunc_normal_init(std: float = 0.02):
    return nn.initializers.truncated_normal(stddev=std)


def fan_out_conv_init(key, shape, dtype=jnp.float32):
    """Reference PVT conv init: N(0, sqrt(2/fan_out)), fan_out = kh*kw*O/groups.

    Group count can't be recovered from an HWIO shape alone; callers needing grouped
    fan-out pass a closure via `fan_out_conv_init_grouped`.
    """
    kh, kw, _, o = shape
    std = math.sqrt(2.0 / (kh * kw * o))
    return jax.random.normal(key, shape, dtype) * std


def fan_out_conv_init_grouped(groups: int):
    def init(key, shape, dtype=jnp.float32):
        kh, kw, _, o = shape
        std = math.sqrt(2.0 / (kh * kw * (o // groups)))
        return jax.random.normal(key, shape, dtype) * std

    return init


def shifted_normal_init(shift: float, std: float = 1.0):
    """``torch.randn(shape) + shift`` (FEA/OutHead learnable gates)."""

    def init(key, shape, dtype=jnp.float32):
        return jax.random.normal(key, shape, dtype) * std + shift

    return init


# ---------------------------------------------------------------------------
# Conv / Dense
# ---------------------------------------------------------------------------


def _pair(v) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else tuple(v)


class Conv2d(nn.Module):
    """2-D convolution on NHWC with torch padding/group semantics."""

    in_channels: int
    out_channels: int
    kernel_size: Union[int, Tuple[int, int]] = 3
    stride: Union[int, Tuple[int, int]] = 1
    padding: Union[int, Tuple[int, int]] = 0
    dilation: Union[int, Tuple[int, int]] = 1
    groups: int = 1
    use_bias: bool = True
    weight_init: Optional[Callable] = None
    bias_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = _pair(self.kernel_size)
        sh, sw = _pair(self.stride)
        ph, pw = _pair(self.padding)
        dh, dw = _pair(self.dilation)
        w_init = self.weight_init or torch_default_conv_init
        weight = self.param(
            "weight", w_init, (kh, kw, self.in_channels // self.groups, self.out_channels), jnp.float32
        )
        H, W = x.shape[1], x.shape[2]
        patch_conv = (
            kh == sh and kw == sw and ph == pw == 0 and dh == dw == 1
            and self.groups == 1 and H % kh == 0 and W % kw == 0 and kh * kw > 1
        )
        if patch_conv:
            # kernel == stride, no padding ⇒ non-overlapping patches: identical math
            # as space-to-depth + matmul, which XLA schedules far better than the
            # strided-conv backward (PVT SRA's sr conv measured 3×0.57 ms/step in
            # wgrad fusions; the MXU matmul form removes that)
            b = x.shape[0]
            xb = x.reshape(b, H // kh, kh, W // kw, kw, x.shape[3])
            xb = xb.transpose(0, 1, 3, 2, 4, 5).reshape(b, H // kh, W // kw, kh * kw * x.shape[3])
            wm = weight.reshape(kh * kw * (self.in_channels // self.groups), self.out_channels)
            y = jnp.einsum("bhwi,io->bhwo", xb, wm.astype(x.dtype))
        else:
            # NB: two alternative small-channel conv paths exist with MEASURED
            # NEGATIVE results (PERF_NOTES) and are deliberately not routed:
            # tools/negative_results/smallc_conv.py (Pallas tap-packing: VPU operand rearrangement
            # outweighs the MXU saving) and nn/functional.conv5x5_packed
            # (PER-CONV space-to-depth repack; the pack/unpack transposes ate
            # the win). Lane-starved full-res sites are instead handled at the
            # BLOCK level by space-to-depth residency (blocks.UnetResBlockS2D).
            y = jax.lax.conv_general_dilated(
                x,
                weight.astype(x.dtype),
                window_strides=(sh, sw),
                padding=((ph, ph), (pw, pw)),
                rhs_dilation=(dh, dw),
                feature_group_count=self.groups,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if self.use_bias:
            fan_in = kh * kw * self.in_channels // self.groups
            b_init = self.bias_init or torch_bias_init_for(fan_in)
            bias = self.param("bias", b_init, (self.out_channels,), jnp.float32)
            y = y + bias.astype(y.dtype)
        return y


class ConvTranspose2d(nn.Module):
    """torch ``nn.ConvTranspose2d`` semantics on NHWC (incl. output_padding)."""

    in_channels: int
    out_channels: int
    kernel_size: Union[int, Tuple[int, int]] = 3
    stride: Union[int, Tuple[int, int]] = 2
    padding: Union[int, Tuple[int, int]] = 1
    output_padding: Union[int, Tuple[int, int]] = 1
    use_bias: bool = True
    weight_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = _pair(self.kernel_size)
        sh, sw = _pair(self.stride)
        ph, pw = _pair(self.padding)
        oph, opw = _pair(self.output_padding)
        # Stored HWIO with I=in, O=out (converter maps torch (I,O,kh,kw)→(kh,kw,I,O)).
        w_init = self.weight_init or torch_default_conv_init
        weight = self.param("weight", w_init, (kh, kw, self.in_channels, self.out_channels), jnp.float32)
        # conv_transpose(x, W, s, p, op) == conv(x dilated by s, spatially-flipped W,
        # padding (k-1-p, k-1-p+op)); the stored HWIO layout already contracts over C_in.
        w = jnp.flip(weight, axis=(0, 1))
        y = jax.lax.conv_general_dilated(
            x,
            w.astype(x.dtype),
            window_strides=(1, 1),
            padding=((kh - 1 - ph, kh - 1 - ph + oph), (kw - 1 - pw, kw - 1 - pw + opw)),
            lhs_dilation=(sh, sw),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            fan_in = kh * kw * self.out_channels  # torch uses weight.size(1)*k*k
            bias = self.param("bias", torch_bias_init_for(fan_in), (self.out_channels,), jnp.float32)
            y = y + bias.astype(y.dtype)
        return y


class Dense(nn.Module):
    """Linear layer; weight stored (in, out)."""

    in_features: int
    out_features: int
    use_bias: bool = True
    weight_init: Optional[Callable] = None
    bias_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        w_init = self.weight_init or torch_default_conv_init
        weight = self.param("weight", w_init, (self.in_features, self.out_features), jnp.float32)
        y = x @ weight.astype(x.dtype)
        if self.use_bias:
            b_init = self.bias_init or torch_bias_init_for(self.in_features)
            bias = self.param("bias", b_init, (self.out_features,), jnp.float32)
            y = y + bias.astype(y.dtype)
        return y


# ---------------------------------------------------------------------------
# Norms
# ---------------------------------------------------------------------------


class BatchNorm(nn.Module):
    """torch BatchNorm (1d/2d) semantics over the trailing channel axis.

    Normalizes with biased batch variance; running stats updated with the *unbiased*
    variance and torch's ``momentum=0.1`` convention. Stats are fp32. Under pjit with
    a sharded batch, the reductions are global → sync-BN across data-parallel replicas.
    """

    features: int
    eps: float = 1e-5
    momentum: float = 0.1
    affine: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((self.features,), jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((self.features,), jnp.float32))
        xf = x.astype(jnp.float32)
        reduce_axes = tuple(range(x.ndim - 1))
        if train:
            mean = jnp.mean(xf, axis=reduce_axes)
            var = jnp.mean(jnp.square(xf), axis=reduce_axes) - jnp.square(mean)
            n = int(np.prod([x.shape[a] for a in reduce_axes]))
            var_unbiased = var * (n / max(n - 1, 1))
            if not self.is_initializing():
                ra_mean.value = (1.0 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1.0 - self.momentum) * ra_var.value + self.momentum * var_unbiased
        else:
            mean, var = ra_mean.value, ra_var.value
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        if self.affine:
            weight = self.param("weight", nn.initializers.ones, (self.features,), jnp.float32)
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y * weight + bias
        return y.astype(x.dtype)


class LayerNorm(nn.Module):
    """torch ``nn.LayerNorm`` over the trailing axis (fp32 stats)."""

    features: int
    eps: float = 1e-5
    affine: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        if self.affine:
            weight = self.param("weight", nn.initializers.ones, (self.features,), jnp.float32)
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y * weight + bias
        return y.astype(x.dtype)


# The reference's channels-first LayerNorm2d (``modules/cfam.py:57-83``) normalizes over
# the channel axis with explicit mean/var — on NHWC that is exactly LayerNorm above.
LayerNorm2d = LayerNorm


class RMSNorm(nn.Module):
    """fp32 RMSNorm matching reference ``modules/rms_norm.py:15-22``."""

    features: int
    eps: float = 1e-5
    affine: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        xf = x.astype(jnp.float32)
        y = xf * jax.lax.rsqrt(jnp.mean(jnp.square(xf), axis=-1, keepdims=True) + self.eps)
        if self.affine:
            weight = self.param("weight", nn.initializers.ones, (self.features,), jnp.float32)
            y = y * weight
        return y.astype(x.dtype)


class GroupNorm(nn.Module):
    """torch ``nn.GroupNorm`` on NHWC (per-group stats over H,W,C_group)."""

    num_groups: int
    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        g = self.num_groups
        xf = x.astype(jnp.float32).reshape(b, h, w, g, c // g)
        mean = jnp.mean(xf, axis=(1, 2, 4), keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=(1, 2, 4), keepdims=True)
        y = ((xf - mean) * jax.lax.rsqrt(var + self.eps)).reshape(b, h, w, c)
        weight = self.param("weight", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return (y * weight + bias).astype(x.dtype)


# ---------------------------------------------------------------------------
# Regularization / activation helpers
# ---------------------------------------------------------------------------


class DropPath(nn.Module):
    """Per-sample stochastic depth (timm semantics: scale by 1/keep)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


class Dropout(nn.Module):
    rate: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        if self.rate == 0.0 or deterministic:
            return x
        rng = self.make_rng("dropout")
        keep = 1.0 - self.rate
        mask = jax.random.bernoulli(rng, keep, x.shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


def get_act(name: Optional[str], neg_slope: float = 0.2) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Activation factory mirroring the reference ``act_layer`` (``modules/blocks.py:76-93``)."""
    if name is None:
        return lambda x: x
    name = name.lower()
    if name == "relu":
        return F.relu
    if name == "relu6":
        return F.relu6
    if name == "leakyrelu":
        return lambda x: F.leaky_relu(x, neg_slope)
    if name == "gelu":
        return F.gelu
    if name == "silu":
        return F.silu
    if name == "hswish":
        return F.hardswish
    if name == "sigmoid":
        return jax.nn.sigmoid
    raise NotImplementedError(f"activation layer [{name}] is not found")
