"""Conv/up/down block library (single canonical copy).

The reference keeps three near-identical copies of these blocks
(``networks/cenet/modules/blocks.py``, ``networks/cenet_org/modules/blocks.py``,
``networks/shared/``); this module is the one library all models share.

Cited reference lines document the exact semantics each block replicates.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from cenet_tpu.nn import functional as F
from cenet_tpu.nn.layers import (
    BatchNorm,
    Conv2d,
    ConvTranspose2d,
    get_act,
    normal_init,
    trunc_normal_init,
)


def _unet_padding(kernel_size: int, stride: int) -> int:
    """monai padding rule (reference ``modules/unet.py:16-28``): (k - s + 1) // 2."""
    p = (kernel_size - stride + 1) // 2
    assert p >= 0
    return p


class SepConvBN(nn.Module):
    """Dilated depthwise-separable conv + BN (reference ``modules/blocks.py:131-185``).

    depth_activation=True:  dw → BN → relu → pw → BN → relu
    depth_activation=False: relu → dw → BN → pw → BN
    """

    in_channels: int
    filters: int
    kernel_size: int = 3
    stride: int = 1
    rate: int = 1
    depth_activation: bool = False
    epsilon: float = 1e-3

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        k_eff = self.kernel_size + (self.kernel_size - 1) * (self.rate - 1)
        padding = (k_eff - 1) // 2
        if not self.depth_activation:
            x = F.relu(x)
        x = Conv2d(
            self.in_channels,
            self.in_channels,
            self.kernel_size,
            stride=self.stride,
            padding=padding,
            dilation=self.rate,
            groups=self.in_channels,
            use_bias=False,
            weight_init=normal_init(0.02),
            name="depthwise",
        )(x)
        x = BatchNorm(self.in_channels, eps=self.epsilon, name="depthwise_bn")(x, train)
        if self.depth_activation:
            x = F.relu(x)
        x = Conv2d(
            self.in_channels,
            self.filters,
            1,
            use_bias=False,
            weight_init=normal_init(0.02),
            name="pointwise",
        )(x)
        x = BatchNorm(self.filters, eps=self.epsilon, name="pointwise_bn")(x, train)
        if self.depth_activation:
            x = F.relu(x)
        return x


class UnetResBlock(nn.Module):
    """monai-style residual block (reference ``modules/unet.py:123-214``):

    conv1(k,s) → BN → lrelu(.01) → conv2(k,1) → BN, shortcut 1×1+BN when shape
    changes, add, lrelu. Convs bias-free; init trunc_normal(.02) unless overridden
    by a parent block's 'normal' re-init (``modules/blocks.py:198``).
    """

    in_channels: int
    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    init_scheme: str = "trunc_normal"  # 'trunc_normal' | 'normal'

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        w_init = trunc_normal_init(0.02) if self.init_scheme == "trunc_normal" else normal_init(0.02)
        act = get_act("leakyrelu", neg_slope=0.01)
        out = Conv2d(
            self.in_channels,
            self.out_channels,
            self.kernel_size,
            stride=self.stride,
            padding=_unet_padding(self.kernel_size, self.stride),
            use_bias=False,
            weight_init=w_init,
            name="conv1",
        )(x)
        out = BatchNorm(self.out_channels, name="norm1")(out, train)
        out = act(out)
        out = Conv2d(
            self.out_channels,
            self.out_channels,
            self.kernel_size,
            stride=1,
            padding=_unet_padding(self.kernel_size, 1),
            use_bias=False,
            weight_init=w_init,
            name="conv2",
        )(out)
        out = BatchNorm(self.out_channels, name="norm2")(out, train)
        residual = x
        downsample = (self.in_channels != self.out_channels) or (self.stride != 1)
        if downsample:
            residual = Conv2d(
                self.in_channels,
                self.out_channels,
                1,
                stride=self.stride,
                padding=0,
                use_bias=False,
                weight_init=w_init,
                name="conv3",
            )(residual)
            residual = BatchNorm(self.out_channels, name="norm3")(residual, train)
        return act(out + residual)


class _ConvWeight(nn.Module):
    """Bare conv weight param, path-compatible with :class:`Conv2d` (``<name>/weight``)."""

    shape: tuple
    init: object

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        return self.param("weight", self.init, self.shape, jnp.float32)


class UnetResBlockS2D(nn.Module):
    """Space-to-depth-resident :class:`UnetResBlock` (k=5, stride 1) for
    lane-starved full-resolution sites (the OutHead image branch, reference
    ``out.py:41-44``).

    Identical math and an IDENTICAL param/batch-stats tree to
    ``UnetResBlock(in, out, 5, 1)`` — converter/checkpoints interchange freely —
    but the whole block runs on 2×2 space-to-depth tensors: the 5×5 convs
    become (3,3,4·Cin,4·Cout) MXU-dense convs (same taps, structural zeros;
    ``F.repack_s2d_5x5``), BatchNorm sees a (B,H/2,W/2,4,C) phase view (the
    reduction covers exactly the original value set, so torch BN semantics and
    running stats are preserved), and the output STAYS packed — the caller's
    MaxPool 2×2/2 is ``F.depth_phase_max`` (a lane-group max), so nothing is
    ever unpacked. Requires even H, W.

    Why: at 224²×32ch XLA runs the 5×5 as 25 k=32/n=32 matmuls (~7% MFU);
    per-conv S2D repacking was a measured round-2 negative (pack/unpack
    transposes ate the win) and Pallas tap-packing a measured round-3 negative
    (VPU rearrangement outweighs the MXU saving) — block-level S2D residency
    pays one tiny pack of the raw input for three dense convs. PERF_NOTES r3.
    """

    in_channels: int
    out_channels: int
    kernel_size: int = 5
    init_scheme: str = "trunc_normal"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        assert self.kernel_size == 5, "S2D residency is specialized to the k=5 branch"
        w_init = trunc_normal_init(0.02) if self.init_scheme == "trunc_normal" else normal_init(0.02)
        act = get_act("leakyrelu", neg_slope=0.01)
        cin, cout = self.in_channels, self.out_channels

        def phase_bn(name, y, train):
            b, h2, w2, c4 = y.shape
            y5 = y.reshape(b, h2, w2, 4, c4 // 4)
            return BatchNorm(c4 // 4, name=name)(y5, train).reshape(b, h2, w2, c4)

        def s2d_conv(y, w):
            return jnp.asarray(
                jax.lax.conv_general_dilated(
                    y, w.astype(y.dtype), (1, 1),
                    ((1, 1), (1, 1)) if w.shape[0] == 3 else ((0, 0), (0, 0)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
            )

        xs = F.space_to_depth2(x)
        w1 = _ConvWeight((5, 5, cin, cout), w_init, name="conv1")()
        y = s2d_conv(xs, F.repack_s2d_5x5(w1))
        y = phase_bn("norm1", y, train)
        y = act(y)
        w2 = _ConvWeight((5, 5, cout, cout), w_init, name="conv2")()
        y = s2d_conv(y, F.repack_s2d_5x5(w2))
        y = phase_bn("norm2", y, train)
        residual = xs
        if self.in_channels != self.out_channels:
            w3 = _ConvWeight((1, 1, cin, cout), w_init, name="conv3")()
            residual = s2d_conv(xs, F.repack_s2d_1x1(w3))
            residual = phase_bn("norm3", residual, train)
        return act(y + residual)


class UnetOutBlock(nn.Module):
    """1×1 output conv with bias (reference ``modules/unet.py:357-381``)."""

    in_channels: int
    out_channels: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return Conv2d(
            self.in_channels,
            self.out_channels,
            1,
            use_bias=True,
            weight_init=trunc_normal_init(0.02),
            bias_init=nn.initializers.zeros,
            name="conv",
        )(x)


class UpRb(nn.Module):
    """Bilinear ×2 (align_corners) + UnetResBlock (reference ``modules/blocks.py:188-204``)."""

    in_channels: int
    out_channels: int
    kernel_size: int = 3
    scale_factor: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = F.resize_bilinear_by_scale(x, float(self.scale_factor), align_corners=True)
        return UnetResBlock(
            self.in_channels, self.out_channels, self.kernel_size, 1, init_scheme="normal", name="rb"
        )(x, train)


class UpConv(nn.Module):
    """Bilinear ×2 (align_corners) + conv + BN + act (reference ``modules/blocks.py:206-221``)."""

    in_channels: int
    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    activation: str = "relu"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = F.resize_bilinear_by_scale(x, 2.0, align_corners=True)
        x = Conv2d(
            self.in_channels,
            self.out_channels,
            self.kernel_size,
            stride=self.stride,
            padding=self.kernel_size // 2,
            use_bias=False,
            weight_init=normal_init(0.02),
            name="conv",
        )(x)
        x = BatchNorm(self.out_channels, name="bn")(x, train)
        return get_act(self.activation)(x)


class UpTConv(nn.Module):
    """Transposed-conv upsample (reference ``modules/blocks.py:223-243``)."""

    in_channels: int
    out_channels: int
    kernel_size: int = 3
    stride: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        p = _unet_padding(self.kernel_size, self.stride)
        op = 2 * p + self.stride - self.kernel_size
        return ConvTranspose2d(
            self.in_channels,
            self.out_channels,
            self.kernel_size,
            stride=self.stride,
            padding=p,
            output_padding=op,
            use_bias=False,
            weight_init=normal_init(0.02),
            name="up",
        )(x)


class EUCB(nn.Module):
    """Efficient up-conv block (reference ``modules/blocks.py:297-321``):

    nearest ×2 → depthwise k (stride k//2) → BN → act → channel_shuffle(C) [no-op]
    → pointwise 1×1 (bias). Default act leakyrelu(0.2) in cenet, relu in cenet_org.
    """

    in_channels: int
    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    activation: str = "relu"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = F.upsample_nearest(x, 2)
        x = Conv2d(
            self.in_channels,
            self.in_channels,
            self.kernel_size,
            stride=self.stride,
            padding=self.kernel_size // 2,
            groups=self.in_channels,
            use_bias=False,
            weight_init=normal_init(0.02),
            name="up_dwc",
        )(x)
        x = BatchNorm(self.in_channels, name="bn")(x, train)
        x = get_act(self.activation)(x)
        x = F.channel_shuffle(x, self.in_channels)
        return Conv2d(
            self.in_channels,
            self.out_channels,
            1,
            use_bias=True,
            weight_init=normal_init(0.02),
            bias_init=nn.initializers.zeros,
            name="pwc",
        )(x)


class DownRb(nn.Module):
    """UnetResBlock + 2×2 max-pool (reference ``modules/blocks.py:261-279``)."""

    in_channels: int
    out_channels: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = UnetResBlock(
            self.in_channels, self.out_channels, self.kernel_size, 1, init_scheme="normal", name="rb"
        )(x, train)
        return F.max_pool2d(x, 2, 2)


UP_BLOCKS = {"uprb": UpRb, "eucb": EUCB, "upcn": UpConv, "uptc": UpTConv}


def make_up_block(kind: str, in_channels: int, out_channels: int, kernel_size: int = 3, name: Optional[str] = None):
    """Up-block factory mirroring reference dispatch (``decoders.py:53-62``, ``out.py:51-58``)."""
    if kind == "uprb":
        return UpRb(in_channels, out_channels, kernel_size, scale_factor=2, name=name)
    if kind == "eucb":
        return EUCB(in_channels, out_channels, kernel_size, stride=kernel_size // 2, activation="leakyrelu", name=name)
    if kind == "upcn":
        return UpConv(in_channels, out_channels, kernel_size, stride=1, activation="leakyrelu", name=name)
    if kind == "uptc":
        return UpTConv(in_channels, out_channels, kernel_size, stride=2, name=name)
    raise ValueError(f"Invalid up_block: {kind}")


class UnetBasicBlock(nn.Module):
    """Two conv+BN+lrelu stages, no residual (reference ``modules/unet.py:217-285``)."""

    in_channels: int
    out_channels: int
    kernel_size: int = 3
    stride: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        act = get_act("leakyrelu", neg_slope=0.01)
        x = Conv2d(self.in_channels, self.out_channels, self.kernel_size, stride=self.stride,
                   padding=_unet_padding(self.kernel_size, self.stride), use_bias=False,
                   weight_init=trunc_normal_init(0.02), name="conv1")(x)
        x = BatchNorm(self.out_channels, name="norm1")(x, train)
        x = act(x)
        x = Conv2d(self.out_channels, self.out_channels, self.kernel_size, stride=1,
                   padding=_unet_padding(self.kernel_size, 1), use_bias=False,
                   weight_init=trunc_normal_init(0.02), name="conv2")(x)
        x = BatchNorm(self.out_channels, name="norm2")(x, train)
        return act(x)


class UnetUpBlock(nn.Module):
    """Transposed-conv upsample + concat skip + UnetBasicBlock
    (reference ``modules/unet.py:288-354``)."""

    in_channels: int
    out_channels: int
    kernel_size: int = 3
    upsample_kernel_size: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray, skip: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        k = self.upsample_kernel_size
        p = _unet_padding(k, k)
        op = 2 * p + k - k
        x = ConvTranspose2d(self.in_channels, self.out_channels, k, stride=k, padding=p,
                            output_padding=op, use_bias=False,
                            weight_init=trunc_normal_init(0.02), name="transp_conv")(x)
        x = jnp.concatenate([x, skip], axis=-1)
        return UnetBasicBlock(self.out_channels * 2, self.out_channels, self.kernel_size, 1,
                              name="conv_block")(x, train)
