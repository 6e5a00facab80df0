"""ResNet backbones returning 4-stage pyramids (reference ``networks/cenet/resnet.py``).

Standard torchvision topology: 7×7/2 stem + 3×3/2 maxpool, then layer1..4 whose
outputs (strides 4/8/16/32) feed the decoder. Classifier head omitted — the reference
never uses it (``resnet.py:175-177``).
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from cenet_tpu.nn import functional as F
from cenet_tpu.nn.layers import BatchNorm, Conv2d, fan_out_conv_init_grouped


def _max_pool_3x3_s2_p1(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )


class BasicBlock(nn.Module):
    in_planes: int
    planes: int
    stride: int = 1
    expansion: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        init = fan_out_conv_init_grouped(1)
        out = Conv2d(self.in_planes, self.planes, 3, stride=self.stride, padding=1, use_bias=False, weight_init=init, name="conv1")(x)
        out = BatchNorm(self.planes, name="bn1")(out, train)
        out = F.relu(out)
        out = Conv2d(self.planes, self.planes, 3, stride=1, padding=1, use_bias=False, weight_init=init, name="conv2")(out)
        out = BatchNorm(self.planes, name="bn2")(out, train)
        if self.stride != 1 or self.in_planes != self.planes * self.expansion:
            x = Conv2d(self.in_planes, self.planes * self.expansion, 1, stride=self.stride, use_bias=False, weight_init=init, name="downsample_conv")(x)
            x = BatchNorm(self.planes * self.expansion, name="downsample_bn")(x, train)
        return F.relu(out + x)


class Bottleneck(nn.Module):
    in_planes: int
    planes: int
    stride: int = 1
    expansion: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        init = fan_out_conv_init_grouped(1)
        out = Conv2d(self.in_planes, self.planes, 1, use_bias=False, weight_init=init, name="conv1")(x)
        out = BatchNorm(self.planes, name="bn1")(out, train)
        out = F.relu(out)
        out = Conv2d(self.planes, self.planes, 3, stride=self.stride, padding=1, use_bias=False, weight_init=init, name="conv2")(out)
        out = BatchNorm(self.planes, name="bn2")(out, train)
        out = F.relu(out)
        out = Conv2d(self.planes, self.planes * self.expansion, 1, use_bias=False, weight_init=init, name="conv3")(out)
        out = BatchNorm(self.planes * self.expansion, name="bn3")(out, train)
        if self.stride != 1 or self.in_planes != self.planes * self.expansion:
            x = Conv2d(self.in_planes, self.planes * self.expansion, 1, stride=self.stride, use_bias=False, weight_init=init, name="downsample_conv")(x)
            x = BatchNorm(self.planes * self.expansion, name="downsample_bn")(x, train)
        return F.relu(out + x)


class ResNet(nn.Module):
    block: str  # 'basic' | 'bottleneck'
    layers: Sequence[int]
    in_chans: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        blk = BasicBlock if self.block == "basic" else Bottleneck
        expansion = 1 if self.block == "basic" else 4
        init = fan_out_conv_init_grouped(1)
        x = Conv2d(self.in_chans, 64, 7, stride=2, padding=3, use_bias=False, weight_init=init, name="conv1")(x)
        x = BatchNorm(64, name="bn1")(x, train)
        x = F.relu(x)
        x = _max_pool_3x3_s2_p1(x)
        features = []
        in_planes = 64
        for li, (planes, n_blocks) in enumerate(zip((64, 128, 256, 512), self.layers)):
            stride = 1 if li == 0 else 2
            for bi in range(n_blocks):
                x = blk(in_planes, planes, stride if bi == 0 else 1, name=f"layer{li+1}_{bi}")(x, train)
                in_planes = planes * expansion
            features.append(x)
        return features


RESNET_VARIANTS = {
    "resnet18": ("basic", (2, 2, 2, 2)),
    "resnet34": ("basic", (3, 4, 6, 3)),
    "resnet50": ("bottleneck", (3, 4, 6, 3)),
    "resnet101": ("bottleneck", (3, 4, 23, 3)),
    "resnet152": ("bottleneck", (3, 8, 36, 3)),
}


def make_resnet(variant: str, in_chans: int = 3, **kw) -> ResNet:
    block, layers = RESNET_VARIANTS[variant]
    return ResNet(block=block, layers=layers, in_chans=in_chans, **kw)
