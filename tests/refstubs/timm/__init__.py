from . import layers, models  # noqa: F401
