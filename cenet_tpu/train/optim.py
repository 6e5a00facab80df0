"""Optimizers and LR schedules with torch semantics, built on optax.

Reference surface: ``get_optimizer`` (Adam/AdamW/SGD-momentum-0.9, ``core.py:12-24``)
and ``get_scheduler`` (cosine/poly/exp/step/custom, stepped **per iteration**,
``core.py:27-41``, ``main_synapse.py:275-276``).
"""

from __future__ import annotations

import math
from typing import Callable

import optax


def make_schedule(
    name: str,
    base_lr: float,
    max_iterations: int,
    max_epochs: int = 0,
    iters_per_epoch: int = 1,
) -> Callable[[int], float]:
    name = name.lower()
    if name == "poly":
        # (1 - t/T)^0.9 per iteration (core.py:31). Clamped at 0 past T: the
        # reference would raise a negative fractional power (NaN) if stepped
        # beyond max_iterations; a framework must stay finite there (e.g. bench
        # loops and resumed over-runs).
        import jax.numpy as _jnp

        return lambda step: base_lr * _jnp.maximum(1.0 - step / max_iterations, 0.0) ** 0.9
    if name == "cosine":
        return optax.cosine_decay_schedule(base_lr, max_iterations)
    if name == "exp":
        return lambda step: base_lr * (0.95**step)
    if name == "step":
        return lambda step: base_lr * (0.5 ** (step // 200))
    if name == "custom":
        # Two-phase schedule (core.py:191-212): linear high phase then cosine low phase,
        # driven by epoch index.
        t_first = 5
        lr_sh, lr_eh = 10 * base_lr, 5 * base_lr
        lr_sl, lr_el = base_lr, 0.0

        def sched(step):
            epoch = step // max(iters_per_epoch, 1)
            if epoch < t_first:
                p = epoch / t_first
                return lr_sh - (lr_sh - lr_eh) * p
            p = (epoch - t_first) / max(max_epochs - t_first, 1)
            return lr_sl - (lr_sl - lr_el) * (0.5 * (1 - math.cos(math.pi * p)))

        return sched
    raise NotImplementedError(f"Scheduler <{name}> not implemented")


def make_optimizer(
    name: str,
    schedule: Callable[[int], float],
    weight_decay: float = 1e-4,
    grad_clip: float = 0.0,
) -> optax.GradientTransformation:
    """torch-equivalent optimizers.

    * sgd: L2-in-grad weight decay, momentum 0.9 (torch buffer convention —
      ``buf = m*buf + grad``; update = -lr*buf), matching ``core.py:21``.
    * adam: torch Adam = L2-in-grad + adam moments.
    * adamw: decoupled weight decay.
    """
    name = name.lower()
    parts = []
    if name == "sgd":
        if weight_decay:
            parts.append(optax.add_decayed_weights(weight_decay))
        # torch momentum (dampening=0, no nesterov) == trace(decay=m)
        parts.append(optax.trace(decay=0.9))
    elif name == "adam":
        if weight_decay:
            parts.append(optax.add_decayed_weights(weight_decay))
        parts.append(optax.scale_by_adam())
    elif name == "adamw":
        parts.append(optax.scale_by_adam())
        if weight_decay:
            parts.append(optax.add_decayed_weights(weight_decay))
    else:
        raise NotImplementedError(f"Optimizer {name} not implemented")
    parts.append(optax.scale_by_learning_rate(schedule))  # includes the -1 sign
    tx = optax.chain(*parts)
    if grad_clip and grad_clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    return tx


def freeze_subtree(tx: optax.GradientTransformation, frozen_prefix: str) -> optax.GradientTransformation:
    """Zero updates for parameters under ``frozen_prefix`` (reference ``freeze_bb``,
    ``encoder.py:67-73,82-84`` — requires_grad=False on the backbone)."""

    def label_fn(params):
        def lab(path, _):
            top = str(getattr(path[0], "key", path[0]))
            return "frozen" if top == frozen_prefix else "train"

        import jax

        return jax.tree_util.tree_map_with_path(lab, params)

    return optax.multi_transform({"train": tx, "frozen": optax.set_to_zero()}, label_fn)
