"""Skin (HAM10000/PH2) validation and test loops (reference ``utils/utils_skin.py``).

val: per-image binary dice on argmax (``utils_skin.py:97-113``).
test: dice + pixel accuracy + IoU (``utils_skin.py:131-170``); optional
contour-overlay PNG export.
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable, Optional, Tuple

import numpy as np

from cenet_tpu.evaluate.metrics import iou_binary


def _batch_dice(pred: np.ndarray, gt: np.ndarray, smooth: float = 1e-5) -> float:
    """Per-batch binary dice on flattened masks (utils_skin.py:104-109 semantics)."""
    p = (pred > 0).astype(np.float64).reshape(-1)
    g = (gt > 0).astype(np.float64).reshape(-1)
    inter = (p * g).sum()
    return float((2 * inter + smooth) / (p.sum() + g.sum() + smooth))


def skin_val(predict_fn: Callable, batches: Iterable[Dict]) -> float:
    """Mean per-batch dice over the validation loader."""
    dices = []
    for batch in batches:
        probs = np.asarray(predict_fn(batch["image"]))
        pred = probs.argmax(-1)
        dices.append(_batch_dice(pred, np.asarray(batch["label"])))
    return float(np.mean(dices))


def skin_test(
    predict_fn: Callable,
    batches: Iterable[Dict],
    save_hook: Optional[Callable] = None,
) -> Tuple[float, float, float]:
    """Returns (mean dice, mean pixel accuracy, mean IoU) over batches."""
    dices, accs, ious = [], [], []
    for batch in batches:
        probs = np.asarray(predict_fn(batch["image"]))
        pred = probs.argmax(-1)
        gt = np.asarray(batch["label"])
        dices.append(_batch_dice(pred, gt))
        accs.append(float(((pred > 0) == (gt > 0)).mean()))
        ious.append(iou_binary(pred, gt))
        if save_hook is not None:
            save_hook(batch, pred)
    return float(np.mean(dices)), float(np.mean(accs)), float(np.mean(ious))
