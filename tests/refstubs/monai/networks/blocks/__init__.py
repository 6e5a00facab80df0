from .convolutions import Convolution  # noqa: F401
