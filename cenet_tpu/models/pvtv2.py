"""PVTv2 pyramid vision transformer backbone (reference ``networks/cenet/pvtv2.py``).

Four stages of OverlapPatchEmbed → N×(SRA attention + DWConv-MLP) → LayerNorm,
returning NHWC feature maps at strides 4/8/16/32. Variants b0–b5 with the reference
hyperparameters (``pvtv2.py:384-431``).

TPU-first notes: tokens stay (B, N, C) with C-minor layout; softmax is an fp32
island; the attention core is pluggable (XLA einsum or fused Pallas kernel).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from cenet_tpu.nn import functional as F
from cenet_tpu.nn.attention import SRAAttention
from cenet_tpu.nn.layers import (
    Conv2d,
    Dense,
    Dropout,
    DropPath,
    LayerNorm,
    fan_out_conv_init_grouped,
    trunc_normal_init,
)


class DWConv(nn.Module):
    """3×3 depthwise conv applied on tokens via NHWC detour (reference ``pvtv2.py:359-370``)."""

    dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
        B, N, C = x.shape
        y = x.reshape(B, H, W, C)
        y = Conv2d(
            C, C, 3, stride=1, padding=1, groups=C, use_bias=True,
            weight_init=fan_out_conv_init_grouped(C), bias_init=nn.initializers.zeros,
            name="dwconv",
        )(y)
        return y.reshape(B, N, C)


class MixFFN(nn.Module):
    """fc1 → DWConv → GELU → fc2 (reference ``pvtv2.py:12-47``)."""

    in_features: int
    hidden_features: int
    drop: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, H: int, W: int, deterministic: bool = True) -> jnp.ndarray:
        x = Dense(self.in_features, self.hidden_features, weight_init=trunc_normal_init(0.02), bias_init=nn.initializers.zeros, name="fc1")(x)
        x = DWConv(self.hidden_features, name="dwconv")(x, H, W)
        x = F.gelu(x)
        x = Dropout(self.drop)(x, deterministic)
        x = Dense(self.hidden_features, self.in_features, weight_init=trunc_normal_init(0.02), bias_init=nn.initializers.zeros, name="fc2")(x)
        x = Dropout(self.drop)(x, deterministic)
        return x


class PVTBlock(nn.Module):
    """Pre-norm SRA attention + MixFFN with stochastic depth (reference ``pvtv2.py:112-149``)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    sr_ratio: int = 1
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, x: jnp.ndarray, H: int, W: int, deterministic: bool = True) -> jnp.ndarray:
        dp = DropPath(self.drop_path)
        y = LayerNorm(self.dim, eps=1e-6, name="norm1")(x)
        y = SRAAttention(
            self.dim, num_heads=self.num_heads, qkv_bias=self.qkv_bias,
            attn_drop=self.attn_drop, proj_drop=self.drop, sr_ratio=self.sr_ratio,
            attn_impl=self.attn_impl, name="attn",
        )(y, H, W, deterministic)
        x = x + dp(y, deterministic)
        y = LayerNorm(self.dim, eps=1e-6, name="norm2")(x)
        y = MixFFN(self.dim, int(self.dim * self.mlp_ratio), self.drop, name="mlp")(y, H, W, deterministic)
        x = x + dp(y, deterministic)
        return x


class OverlapPatchEmbed(nn.Module):
    """Strided-conv patch embedding + LayerNorm (reference ``pvtv2.py:152-191``)."""

    patch_size: int
    stride: int
    in_chans: int
    embed_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, int, int]:
        x = Conv2d(
            self.in_chans, self.embed_dim, self.patch_size, stride=self.stride,
            padding=self.patch_size // 2, use_bias=True,
            weight_init=fan_out_conv_init_grouped(1), bias_init=nn.initializers.zeros,
            name="proj",
        )(x)
        B, H, W, C = x.shape
        x = x.reshape(B, H * W, C)
        x = LayerNorm(C, eps=1e-5, name="norm")(x)  # plain nn.LayerNorm default eps
        return x, H, W


class PVTv2(nn.Module):
    """Backbone returning the four NHWC stage feature maps (reference ``pvtv2.py:194-356``)."""

    embed_dims: Sequence[int] = (64, 128, 320, 512)
    num_heads: Sequence[int] = (1, 2, 5, 8)
    mlp_ratios: Sequence[float] = (8, 8, 4, 4)
    qkv_bias: bool = True
    depths: Sequence[int] = (3, 4, 6, 3)
    sr_ratios: Sequence[int] = (8, 4, 2, 1)
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    attn_impl: str = "xla"
    remat: bool = False  # rematerialize each transformer block (jax.checkpoint)

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths))
        cur = 0
        outs = []
        in_chans = x.shape[-1]
        block_cls = nn.remat(PVTBlock, static_argnums=(2, 3, 4)) if self.remat else PVTBlock
        patch_cfg = [(7, 4, in_chans), (3, 2, self.embed_dims[0]), (3, 2, self.embed_dims[1]), (3, 2, self.embed_dims[2])]
        for stage in range(4):
            ps, st, ic = patch_cfg[stage]
            tokens, H, W = OverlapPatchEmbed(ps, st, ic, self.embed_dims[stage], name=f"patch_embed{stage+1}")(x if stage == 0 else outs[-1])
            for i in range(self.depths[stage]):
                tokens = block_cls(
                    self.embed_dims[stage],
                    num_heads=self.num_heads[stage],
                    mlp_ratio=self.mlp_ratios[stage],
                    qkv_bias=self.qkv_bias,
                    drop=self.drop_rate,
                    attn_drop=self.attn_drop_rate,
                    drop_path=float(dpr[cur + i]),
                    sr_ratio=self.sr_ratios[stage],
                    attn_impl=self.attn_impl,
                    name=f"block{stage+1}_{i}",
                )(tokens, H, W, deterministic)
            tokens = LayerNorm(self.embed_dims[stage], eps=1e-6, name=f"norm{stage+1}")(tokens)
            outs.append(tokens.reshape(tokens.shape[0], H, W, self.embed_dims[stage]))
            cur += self.depths[stage]
        return outs


# Variant registry (reference ``pvtv2.py:384-431``)
PVT_VARIANTS = {
    "pvt_v2_b0": dict(embed_dims=(32, 64, 160, 256), depths=(2, 2, 2, 2)),
    "pvt_v2_b1": dict(embed_dims=(64, 128, 320, 512), depths=(2, 2, 2, 2)),
    "pvt_v2_b2": dict(embed_dims=(64, 128, 320, 512), depths=(3, 4, 6, 3)),
    "pvt_v2_b3": dict(embed_dims=(64, 128, 320, 512), depths=(3, 4, 18, 3)),
    "pvt_v2_b4": dict(embed_dims=(64, 128, 320, 512), depths=(3, 8, 27, 3)),
    "pvt_v2_b5": dict(embed_dims=(64, 128, 320, 512), depths=(3, 6, 40, 3), mlp_ratios=(4, 4, 4, 4)),
}


def make_pvt(variant: str, attn_impl: str = "xla", drop_path_rate: float = 0.1, remat: bool = False, **kw) -> PVTv2:
    cfg = dict(PVT_VARIANTS[variant])
    cfg.setdefault("mlp_ratios", (8, 8, 4, 4))
    return PVTv2(
        embed_dims=cfg["embed_dims"],
        depths=cfg["depths"],
        mlp_ratios=cfg["mlp_ratios"],
        num_heads=(1, 2, 5, 8),
        sr_ratios=(8, 4, 2, 1),
        qkv_bias=True,
        drop_path_rate=drop_path_rate,
        attn_impl=attn_impl,
        remat=remat,
        **kw,
    )
