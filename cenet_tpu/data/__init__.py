from cenet_tpu.data.loader import Loader, seeded_epoch_order  # noqa: F401
from cenet_tpu.data.synapse import SynapseDataset  # noqa: F401
from cenet_tpu.data.acdc import ACDCDataset  # noqa: F401
from cenet_tpu.data.skin import SkinDataset, prepare_skin_cache  # noqa: F401
