from cenet_tpu.nn import functional  # noqa: F401
from cenet_tpu.nn.layers import (  # noqa: F401
    BatchNorm,
    Conv2d,
    ConvTranspose2d,
    Dense,
    LayerNorm,
    LayerNorm2d,
    RMSNorm,
    DropPath,
    get_act,
)
