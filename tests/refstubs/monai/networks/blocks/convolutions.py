"""monai.networks.blocks.convolutions.Convolution — state-dict-faithful stub.

Real monai Convolution is an ``nn.Sequential`` that registers the conv under the
name ``conv`` (so UnetResBlock's conv1 state_dict key is ``conv1.conv.weight``).
The reference only ever constructs it with ``conv_only=True`` (see
``/root/reference/src/networks/cenet/modules/unet.py:50-81`` and
``modules/blocks.py:45-73``), so the ADN (act/dropout/norm) tail is not built;
we raise if a code path ever asks for it.
"""

import torch.nn as nn


def _same_padding(kernel_size, dilation=1):
    k = kernel_size if isinstance(kernel_size, (tuple, list)) else (kernel_size,)
    d = dilation if isinstance(dilation, (tuple, list)) else (dilation,) * len(k)
    pad = tuple((kk - 1) // 2 * dd for kk, dd in zip(k, d))
    return pad if len(pad) > 1 else pad[0]


class Convolution(nn.Sequential):
    def __init__(
        self,
        spatial_dims,
        in_channels,
        out_channels,
        strides=1,
        kernel_size=3,
        adn_ordering="NDA",
        act="PRELU",
        norm="INSTANCE",
        dropout=None,
        dropout_dim=1,
        dilation=1,
        groups=1,
        bias=True,
        conv_only=False,
        is_transposed=False,
        padding=None,
        output_padding=None,
    ):
        super().__init__()
        assert spatial_dims == 2, "stub covers 2D only (all reference uses are 2D)"
        if padding is None:
            padding = _same_padding(kernel_size, dilation)
        if is_transposed:
            if output_padding is None:
                output_padding = _same_padding(strides, 1)  # stride-1 padding, monai default
            conv = nn.ConvTranspose2d(
                in_channels,
                out_channels,
                kernel_size=kernel_size,
                stride=strides,
                padding=padding,
                output_padding=output_padding,
                groups=groups,
                bias=bias,
                dilation=dilation,
            )
        else:
            conv = nn.Conv2d(
                in_channels,
                out_channels,
                kernel_size=kernel_size,
                stride=strides,
                padding=padding,
                dilation=dilation,
                groups=groups,
                bias=bias,
            )
        self.add_module("conv", conv)
        if not conv_only:
            raise NotImplementedError("stub Convolution only supports conv_only=True")
