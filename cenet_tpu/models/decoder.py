"""CENet decoders: the refactored cenet cascade and the cenet_org variant.

cenet (reference ``networks/cenet/decoders.py:35-105``):
    dec4 → up3 → DSEB3 → dec3 → up2 → DSEB2 → dec2 → up1 → DSEB1 → dec1
with per-level CFAM dilation rates and configurable up-block.

cenet_org (reference ``networks/cenet_org/decoders.py:148-197``): fixed EUCB
up-blocks (ReLU act), SkipEnhancer skips, CFAM with fixed rates [6,12,18] and ReLU
image-pool branch.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from cenet_tpu.nn.blocks import EUCB, make_up_block
from cenet_tpu.nn.cfam import CFAModule
from cenet_tpu.nn.dseb import DSEBlock, SkipEnhancer

# Per-level MCA dilation rates, decoder levels 56/28/14/7 (reference ``decoders.py:64``).
MCA_RATES_LIST = [[2, 3, 5], [1, 2, 4], [1, 2, 3], [1, 2, 2]]


class Decoder(nn.Module):
    channels: Sequence[int] = (512, 320, 128, 64)
    input_size: Sequence[int] = (14, 28, 56, 112)
    scale_factors: Sequence[float] = (0.8, 0.4)
    skip_mode: str = "add"
    num_heads: Sequence[int] = (2, 2, 2)
    up_block: str = "eucb"
    skip_use_command: str = "dat-fea"
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, x: jnp.ndarray, skips, train: bool = False, deterministic: bool = True) -> jnp.ndarray:
        ch = self.channels

        def cfam(dim, rates, name):
            return CFAModule(
                dim, ffn_ratio=4, drop_rate=0.0, drop_path_rate=0.0, act_type="gelu",
                norm_type="BN", init_value=1e-6, attn_act_type="silu", mca_rates=rates,
                pool_act="leakyrelu_001", attn_impl=self.attn_impl, name=name,
            )

        def dseb(dim, heads, size, depth, name):
            return DSEBlock(
                dim, scale_factors=self.scale_factors, num_heads=heads, input_size=size,
                mode=self.skip_mode, use_command=self.skip_use_command, depth=depth,
                attn_impl=self.attn_impl, name=name,
            )

        d4 = cfam(ch[0], MCA_RATES_LIST[3], "dec4")(x, train, deterministic)

        d3 = make_up_block(self.up_block, ch[0], ch[1], 3, name="up3")(d4, train)
        s3 = dseb(ch[1], self.num_heads[0], self.input_size[0], 4, "skip_enhancer3")(skips[0], d3, train)
        d3 = cfam(ch[1], MCA_RATES_LIST[2], "dec3")(d3 + s3, train, deterministic)

        d2 = make_up_block(self.up_block, ch[1], ch[2], 3, name="up2")(d3, train)
        s2 = dseb(ch[2], self.num_heads[1], self.input_size[1], 3, "skip_enhancer2")(skips[1], d2, train)
        d2 = cfam(ch[2], MCA_RATES_LIST[1], "dec2")(d2 + s2, train, deterministic)

        d1 = make_up_block(self.up_block, ch[2], ch[3], 3, name="up1")(d2, train)
        s1 = dseb(ch[3], self.num_heads[2], self.input_size[2], 2, "skip_enhancer1")(skips[2], d1, train)
        d1 = cfam(ch[3], MCA_RATES_LIST[0], "dec1")(d1 + s1, train, deterministic)

        return d1


class DecoderOrg(nn.Module):
    """cenet_org decoder (reference ``cenet_org/decoders.py:148-197``)."""

    channels: Sequence[int] = (512, 320, 128, 64)
    input_size: Sequence[int] = (14, 28, 56, 112)
    scale_factors: Sequence[float] = (0.8, 0.4)
    skip_mode: str = "add"
    num_heads: Sequence[int] = (2, 2, 2)
    attn_force_fp32: bool = False
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, x: jnp.ndarray, skips, train: bool = False, deterministic: bool = True) -> jnp.ndarray:
        ch = self.channels

        def cfam(dim, name):
            return CFAModule(
                dim, ffn_ratio=4, drop_rate=0.0, drop_path_rate=0.0, act_type="gelu",
                norm_type="BN", init_value=1e-6, attn_act_type="silu",
                mca_rates=(6, 12, 18), attn_force_fp32=self.attn_force_fp32,
                pool_act="relu", attn_impl=self.attn_impl, name=name,
            )

        def skip_enh(dim, heads, size, name):
            return SkipEnhancer(
                dim, scale_factors=self.scale_factors, num_heads=heads, input_size=size,
                mode=self.skip_mode, attn_impl=self.attn_impl, name=name,
            )

        # cenet_org EUCB uses the default ReLU activation (cenet_org/decoders.py:86,171).
        def eucb(cin, cout, name):
            return EUCB(cin, cout, 3, stride=1, activation="relu", name=name)

        d4 = cfam(ch[0], "dec4")(x, train, deterministic)
        d3 = eucb(ch[0], ch[1], "eucb3")(d4, train)
        s3 = skip_enh(ch[1], self.num_heads[0], self.input_size[0], "skip_enhancer3")(skips[0], d3, train)
        d3 = cfam(ch[1], "dec3")(d3 + s3, train, deterministic)
        d2 = eucb(ch[1], ch[2], "eucb2")(d3, train)
        s2 = skip_enh(ch[2], self.num_heads[1], self.input_size[1], "skip_enhancer2")(skips[1], d2, train)
        d2 = cfam(ch[2], "dec2")(d2 + s2, train, deterministic)
        d1 = eucb(ch[2], ch[3], "eucb1")(d2, train)
        s1 = skip_enh(ch[3], self.num_heads[2], self.input_size[2], "skip_enhancer1")(skips[2], d1, train)
        d1 = cfam(ch[3], "dec1")(d1 + s1, train, deterministic)
        return d1
