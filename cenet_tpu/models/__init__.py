from cenet_tpu.models.cenet import CENet, CENetOrg  # noqa: F401
from cenet_tpu.models.encoder import get_encoder_channels  # noqa: F401
