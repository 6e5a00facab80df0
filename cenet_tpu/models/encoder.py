"""Encoder factory (reference ``networks/cenet/encoder.py:6-88``).

Returns the backbone module and its 4-stage channel list (deepest first, matching the
decoder's expectation). Pretrained weights are loaded separately via the converter
(`cenet_tpu/convert/torch2jax.py`) rather than at construction time — in JAX,
parameters live outside the module.
"""

from __future__ import annotations

from typing import List, Tuple

import flax.linen as nn

from cenet_tpu.models.pvtv2 import PVT_VARIANTS, make_pvt
from cenet_tpu.models.resnet import RESNET_VARIANTS, make_resnet

ENCODER_CHANNELS = {
    "pvt_v2_b0": [256, 160, 64, 32],
    "pvt_v2_b1": [512, 320, 128, 64],
    "pvt_v2_b2": [512, 320, 128, 64],
    "pvt_v2_b3": [512, 320, 128, 64],
    "pvt_v2_b4": [512, 320, 128, 64],
    "pvt_v2_b5": [512, 320, 128, 64],
    "resnet18": [512, 256, 128, 64],
    "resnet34": [512, 256, 128, 64],
    "resnet50": [2048, 1024, 512, 256],
    "resnet101": [2048, 1024, 512, 256],
    "resnet152": [2048, 1024, 512, 256],
}


def get_encoder_channels(encoder: str) -> List[int]:
    if encoder not in ENCODER_CHANNELS:
        # Reference falls back to pvt_v2_b2 with a warning (encoder.py:48-52).
        return ENCODER_CHANNELS["pvt_v2_b2"]
    return ENCODER_CHANNELS[encoder]


def make_encoder(
    encoder: str,
    input_channels: int = 3,
    attn_impl: str = "xla",
    drop_path_rate: float = 0.1,
    name: str = None,
    remat: bool = False,
) -> Tuple[nn.Module, List[int]]:
    """Build the backbone module.

    For ResNets with ``input_channels != 3`` the stem conv is rebuilt for the given
    channel count (reference ``encoder.py:54-66``); PVT always sees 3 channels since
    CENet replicates grayscale inputs (``net.py:55``).
    """
    if encoder in PVT_VARIANTS:
        return make_pvt(encoder, attn_impl=attn_impl, drop_path_rate=drop_path_rate, name=name, remat=remat), ENCODER_CHANNELS[encoder]
    if encoder in RESNET_VARIANTS:
        return make_resnet(encoder, in_chans=input_channels, name=name), ENCODER_CHANNELS[encoder]
    return make_pvt("pvt_v2_b2", attn_impl=attn_impl, drop_path_rate=drop_path_rate, name=name), ENCODER_CHANNELS["pvt_v2_b2"]
