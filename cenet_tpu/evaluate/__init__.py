from cenet_tpu.evaluate.metrics import (  # noqa: F401
    assd,
    calculate_metric_percase,
    dice_coefficient,
    hd95,
    jaccard,
)
