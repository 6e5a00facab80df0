"""Output head (reference ``networks/cenet/out.py:10-75``).

Decoder 56×56 path upsampled ×2 to C/2; raw-image path UnetResBlock(k=5)+MaxPool
down to 112 with learnable gate w ~ N(0,1)+0.75; merge (cat/add) → UnetResBlock(k=3)
→ 1×1 out conv → bilinear ×2 to full resolution.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from cenet_tpu.nn import functional as F
from cenet_tpu.nn.blocks import UnetOutBlock, UnetResBlock, UnetResBlockS2D, make_up_block
from cenet_tpu.nn.layers import shifted_normal_init

# escape hatch for A/B numerics testing (tests only): forces the unpacked branch
_FORCE_NO_S2D = False


class OutHead(nn.Module):
    dec_in_channels: int
    x_in_channels: int
    out_channels: int
    merge_mode: str = "cat"  # 'cat' | 'add'
    up_block: str = "eucb"
    up_ks: int = 3

    @nn.compact
    def __call__(self, dec: jnp.ndarray, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        om_chs = self.dec_in_channels // 2
        w = self.param("w", shifted_normal_init(0.75), (om_chs,), jnp.float32)

        # raw-image branch: rb(k=5) + maxpool2 (out.py:41-44,59), gated by w (out.py:70).
        # Even-dim inputs take the space-to-depth-resident block (identical math
        # and param tree; MXU-dense convs, pool = phase max — see UnetResBlockS2D)
        if x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0 and not _FORCE_NO_S2D:
            rb_s = UnetResBlockS2D(self.x_in_channels, om_chs, 5, name="rb")(x, train)
            rb_x = F.depth_phase_max(rb_s)
        else:
            rb_x = UnetResBlock(self.x_in_channels, om_chs, 5, 1, name="rb")(x, train)
            rb_x = F.max_pool2d(rb_x, 2, 2)
        rb_x = w.astype(rb_x.dtype) * rb_x

        # decoder branch: configurable ×2 up-block (out.py:51-58)
        dec_ = make_up_block(self.up_block, self.dec_in_channels, om_chs, self.up_ks, name="up")(dec, train)

        z = jnp.concatenate([dec_, rb_x], axis=-1) if self.merge_mode == "cat" else dec_ + rb_x
        mix_chns = om_chs if self.merge_mode == "add" else om_chs * 2
        y = UnetResBlock(mix_chns, mix_chns, 3, 1, name="out_rb")(z, train)
        y = UnetOutBlock(mix_chns, self.out_channels, name="out_conv")(y)
        return F.resize_bilinear_by_scale(y, 2.0, align_corners=False)
