"""CENet and CENetOrg top-level models.

CENet (reference ``networks/cenet/net.py``): grayscale→3ch replication, encoder →
Decoder → OutHead.

CENetOrg (reference ``networks/cenet_org/net.py``): learned 1→3 conv stem,
encoder → DecoderOrg → inlined output head (enc/up/rb/out).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from cenet_tpu.nn import functional as F
from cenet_tpu.nn.blocks import UnetOutBlock, UnetResBlock
from cenet_tpu.nn.layers import BatchNorm, Conv2d
from cenet_tpu.models.decoder import Decoder, DecoderOrg
from cenet_tpu.models.encoder import get_encoder_channels, make_encoder


class CENet(nn.Module):
    input_channels: int = 1
    num_classes: int = 9
    scale_factors: Sequence[float] = (0.8, 0.4)
    diffatt_num_heads: Sequence[int] = (2, 2, 2)
    encoder: str = "pvt_v2_b2"
    skip_mode: str = "cat"
    dec_up_block: str = "eucb"
    out_merge_mode: str = "cat"
    out_up_block: str = "eucb"
    out_up_ks: int = 3
    skip_use_command: str = "dat-fea"
    attn_impl: str = "pallas"
    drop_path_rate: float = 0.1
    remat: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False, deterministic: bool = True) -> jnp.ndarray:
        # grayscale → 3 channels by replication (net.py:55)
        y = jnp.concatenate([x, x, x], axis=-1) if x.shape[-1] == 1 else x

        backbone, channels = make_encoder(
            self.encoder, input_channels=y.shape[-1], attn_impl=self.attn_impl,
            drop_path_rate=self.drop_path_rate, name="backbone", remat=self.remat,
        )
        if self.encoder.startswith("pvt"):
            x1, x2, x3, x4 = backbone(y, deterministic)
        else:
            x1, x2, x3, x4 = backbone(y, train)

        dec = Decoder(
            channels=tuple(channels),
            scale_factors=self.scale_factors,
            skip_mode=self.skip_mode,
            num_heads=self.diffatt_num_heads,
            up_block=self.dec_up_block,
            skip_use_command=self.skip_use_command,
            attn_impl=self.attn_impl,
            name="decoder",
        )(x4, [x3, x2, x1], train, deterministic)

        from cenet_tpu.models.out_head import OutHead

        return OutHead(
            dec_in_channels=channels[-1],
            x_in_channels=self.input_channels,
            out_channels=self.num_classes,
            merge_mode=self.out_merge_mode,
            up_block=self.out_up_block,
            up_ks=self.out_up_ks,
            name="out",
        )(dec, x, train)


class CENetOrg(nn.Module):
    input_channels: int = 1
    num_classes: int = 9
    scale_factors: Sequence[float] = (0.6, 0.3)
    num_heads: Sequence[int] = (2, 2, 2)
    encoder: str = "pvt_v2_b2"
    skip_mode: str = "cat"
    attn_impl: str = "pallas"
    drop_path_rate: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False, deterministic: bool = True) -> jnp.ndarray:
        # learned 1→3 channel stem (cenet_org/net.py:23-28)
        if self.input_channels == 1:
            y = Conv2d(1, 3, 1, use_bias=True, name="conv_stem")(x)
            y = BatchNorm(3, name="conv_stem_bn")(y, train)
            y = F.relu(y)
        else:
            y = x

        backbone, channels = make_encoder(
            self.encoder, input_channels=3, attn_impl=self.attn_impl,
            drop_path_rate=self.drop_path_rate, name="backbone",
        )
        if self.encoder.startswith("pvt"):
            x1, x2, x3, x4 = backbone(y, deterministic)
        else:
            x1, x2, x3, x4 = backbone(y, train)

        deco = DecoderOrg(
            channels=tuple(channels),
            scale_factors=self.scale_factors,
            skip_mode=self.skip_mode,
            num_heads=self.num_heads,
            attn_impl=self.attn_impl,
            name="decoder",
        )(x4, [x3, x2, x1], train, deterministic)

        fine = channels[-1] // 2  # 32 for b2

        # enc: raw input → rb → maxpool → 112×112×32 (cenet_org/net.py:105)
        enc = UnetResBlock(self.input_channels, fine, 3, 1, name="enc_rb")(x, train)
        enc = F.max_pool2d(enc, 2, 2)
        # up: decoder 56 → 112 ×32 (cenet_org/net.py:106-107)
        up = F.resize_bilinear_by_scale(deco, 2.0, align_corners=True)
        up = UnetResBlock(channels[-1], fine, 3, 1, name="up_rb")(up, train)

        z = jnp.concatenate([up, enc], axis=-1)
        z = UnetResBlock(fine * 2, fine * 2, 3, 1, name="rb")(z, train)
        z = UnetOutBlock(fine * 2, self.num_classes, name="out")(z)
        return F.resize_bilinear_by_scale(z, 2.0, align_corners=False)
