"""Segmentation losses with exact reference semantics (``src/utils/core.py``).

Logits are NHWC ``(B, H, W, C)``; integer labels ``(B, H, W)``. All reductions are
whole-batch (the reference sums intersections over the entire batch per class, not
per sample).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def one_hot_labels(labels: jnp.ndarray, n_classes: int) -> jnp.ndarray:
    """(B, H, W) int → (B, H, W, K) float one-hot (reference ``core.py:49-55``)."""
    return jax.nn.one_hot(labels, n_classes, dtype=jnp.float32)


def cross_entropy_loss(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """torch ``CrossEntropyLoss`` (mean over all pixels), fp32."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None].astype(jnp.int32), axis=-1)[..., 0]
    return jnp.mean(nll)


def dice_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    n_classes: int,
    weight: Sequence[float] | None = None,
    softmax: bool = True,
) -> jnp.ndarray:
    """Reference ``DiceLoss`` (``core.py:44-80``): per-class whole-batch soft dice,
    smooth 1e-5, weighted sum / n_classes."""
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1) if softmax else logits.astype(jnp.float32)
    target = one_hot_labels(labels, n_classes)
    smooth = 1e-5
    intersect = jnp.sum(probs * target, axis=(0, 1, 2))
    y_sum = jnp.sum(target * target, axis=(0, 1, 2))
    z_sum = jnp.sum(probs * probs, axis=(0, 1, 2))
    dice = (2.0 * intersect + smooth) / (z_sum + y_sum + smooth)
    w = jnp.asarray(weight, jnp.float32) if weight is not None else jnp.ones((n_classes,), jnp.float32)
    return jnp.sum((1.0 - dice) * w) / n_classes


def _cross_neighbor_sum(t: jnp.ndarray) -> jnp.ndarray:
    """3×3 cross-kernel convolution (self + 4-neighbors), zero-padded.

    Equivalent to the reference's explicit conv2d with kernel [[0,1,0],[1,1,1],[0,1,0]]
    (``core.py:97-105``) but expressed as shifts — cheaper than a conv on TPU.
    """
    p = jnp.pad(t, ((0, 0), (1, 1), (1, 1)))
    return p[:, 1:-1, 1:-1] + p[:, :-2, 1:-1] + p[:, 2:, 1:-1] + p[:, 1:-1, :-2] + p[:, 1:-1, 2:]


def boundary_dou_loss(logits: jnp.ndarray, labels: jnp.ndarray, n_classes: int) -> jnp.ndarray:
    """Reference ``BoundaryDoULoss`` (``core.py:83-131``).

    Per class: boundary fraction α from the cross-kernel interior count, truncated at
    0.8; DoU loss (z+y−2i+s)/(z+y−(1+α)i+s); mean over classes.
    """
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    target_oh = one_hot_labels(labels, n_classes)
    smooth = 1e-5

    def per_class(score, target):
        y = _cross_neighbor_sum(target) * target
        y = jnp.where(y == 5.0, 0.0, y)
        c = jnp.sum(y != 0.0)
        s = jnp.sum(target != 0.0)
        alpha = 1.0 - (c + smooth) / (s + smooth)
        alpha = 2.0 * alpha - 1.0
        alpha = jnp.minimum(alpha, 0.8)
        intersect = jnp.sum(score * target)
        y_sum = jnp.sum(target * target)
        z_sum = jnp.sum(score * score)
        return (z_sum + y_sum - 2.0 * intersect + smooth) / (
            z_sum + y_sum - (1.0 + alpha) * intersect + smooth
        )

    losses = [per_class(probs[..., i], target_oh[..., i]) for i in range(n_classes)]
    return jnp.sum(jnp.stack(losses)) / n_classes


def jaccard_loss(logits: jnp.ndarray, labels: jnp.ndarray, ignore_index: int = 255, smooth: float = 1.0) -> jnp.ndarray:
    """Reference ``JaccardLoss`` (``core.py:134-158``) with ignore-index masking."""
    n_classes = logits.shape[-1]
    probs = jax.nn.softmax(logits.astype(jnp.float32).reshape(-1, n_classes), axis=-1)
    flat = labels.reshape(-1)
    valid = (flat != ignore_index).astype(jnp.float32)
    losses = []
    for c in range(n_classes):
        t = (flat == c).astype(jnp.float32) * valid
        p = probs[:, c] * valid
        inter = jnp.sum(p * t)
        union = jnp.sum(p + t) - inter
        losses.append(1.0 - (inter + smooth) / (union + smooth))
    return jnp.mean(jnp.stack(losses))


class Criterion:
    """Weighted loss combo (reference ``Criterion``, ``core.py:161-188``).

    ``loss_type`` / ``loss_weights`` are comma-separated, e.g. "dice,ce" / "0.5,0.5".
    """

    def __init__(self, num_classes: int, loss_type: str = "dice,ce", loss_weights: str = "0.5,0.5"):
        self.num_classes = num_classes
        self.names = [s.strip() for s in loss_type.split(",")]
        self.weights = [float(s) for s in loss_weights.split(",")]
        assert len(self.names) == len(self.weights)
        for n in self.names:
            if n not in ("dice", "ce", "boundary", "jaccard"):
                raise NotImplementedError(f"Loss {n} not implemented")

    def __call__(self, logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
        total = jnp.asarray(0.0, jnp.float32)
        for name, w in zip(self.names, self.weights):
            if name == "ce":
                total = total + w * cross_entropy_loss(logits, labels)
            elif name == "dice":
                total = total + w * dice_loss(logits, labels, self.num_classes, softmax=True)
            elif name == "boundary":
                total = total + w * boundary_dou_loss(logits, labels, self.num_classes)
            elif name == "jaccard":
                total = total + w * jaccard_loss(logits, labels)
        return total
