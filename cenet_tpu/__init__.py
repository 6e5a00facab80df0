"""cenet-tpu: a TPU-native (JAX/XLA/Pallas/pjit) medical image segmentation framework.

Re-designed from scratch with the capabilities of xmindflow/cenet (CENet, MICCAI 2025):
PVTv2 pyramid-transformer encoders, DSEB differential-attention skip enhancement, and
the multi-scale CFAM decoder, plus the four reference workloads (Synapse, ACDC,
HAM10000, PH2) with their training/eval protocols.

Layout convention: NHWC everywhere (TPU-native); the PyTorch checkpoint converter
handles NCHW/OIHW transposition.
"""

__version__ = "0.1.0"

from cenet_tpu.models.cenet import CENet, CENetOrg  # noqa: F401
