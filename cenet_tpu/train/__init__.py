from cenet_tpu.train.losses import Criterion, boundary_dou_loss, cross_entropy_loss, dice_loss  # noqa: F401
from cenet_tpu.train.optim import make_optimizer, make_schedule  # noqa: F401
