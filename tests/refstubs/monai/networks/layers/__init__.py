from .factories import Act, Norm  # noqa: F401
from .utils import get_act_layer, get_norm_layer  # noqa: F401
