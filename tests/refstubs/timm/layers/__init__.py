from .drop import DropPath  # noqa: F401
from .helpers import to_2tuple  # noqa: F401
from .weight_init import trunc_normal_, trunc_normal_tf_  # noqa: F401
