class Act:
    """Name constants (only used as default argument values in the reference)."""

    PRELU = "prelu"
    RELU = "relu"
    LEAKYRELU = "leakyrelu"
    GELU = "gelu"


class Norm:
    INSTANCE = "instance"
    BATCH = "batch"
