from cenet_tpu.core.config import (  # noqa: F401
    DataConfig,
    ExperimentConfig,
    ModelConfig,
    TrainConfig,
    get_preset,
)
from cenet_tpu.core.mesh import MeshConfig, make_mesh, shard_batch  # noqa: F401
