"""Model cost reporting: parameter counts and FLOPs.

Replaces the reference's fvcore/thop/ptflops startup printouts
(``utils/utils.py:102-128,171-198``, invoked at ``main_synapse.py:155-159``) with
XLA's own cost analysis of the compiled forward — the number the hardware actually
runs, not an operator-table estimate.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import numpy as np


def count_params(params) -> int:
    return sum(int(np.prod(np.shape(p))) for p in jax.tree.leaves(params))


def model_cost(model, variables, input_shape: Tuple[int, ...], **apply_kw) -> Dict[str, float]:
    """Compile the forward and pull XLA's flops/bytes estimates."""
    import jax.numpy as jnp

    x = jnp.zeros(input_shape, jnp.float32)
    lowered = jax.jit(lambda v, x: model.apply(v, x, **apply_kw)).lower(variables, x)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0] if cost else {}
    return {
        "params_m": count_params(variables.get("params", variables)) / 1e6,
        "flops_g": float(cost.get("flops", float("nan"))) / 1e9,
        "bytes_accessed_gb": float(cost.get("bytes accessed", float("nan"))) / 1e9,
    }


def print_model_stats(model, variables, input_shape: Tuple[int, ...], log=print, **apply_kw):
    stats = model_cost(model, variables, input_shape, **apply_kw)
    log(
        f"model: {stats['params_m']:.2f} M params, "
        f"{stats['flops_g']:.2f} GFLOPs @ {input_shape}, "
        f"{stats['bytes_accessed_gb']:.2f} GB accessed"
    )
    return stats
