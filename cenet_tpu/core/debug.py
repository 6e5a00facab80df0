"""Debug/determinism utilities (SURVEY.md §5 "race detection" equivalents).

The reference's closest analogues are cudnn-determinism knobs and manual
``nan_to_num`` guards; here determinism is structural (pure functions + explicit
PRNG keys), and this module adds the active checks:

* ``nan_check_mode()`` — context manager enabling ``jax_debug_nans`` (XLA re-runs
  the offending computation un-jitted and points at the op).
* ``assert_finite(tree)`` — host-side finiteness sweep of a pytree (cheap,
  post-step; use in tests or periodic training health checks).
* ``tree_norm(tree)`` — global L2 norm (gradient health logging).
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def nan_check_mode():
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def assert_finite(tree, name: str = "tree"):
    bad = []

    def check(path, leaf):
        arr = np.asarray(leaf)
        if arr.dtype.kind == "f" and not np.isfinite(arr).all():
            bad.append("/".join(str(getattr(k, "key", k)) for k in path))

    jax.tree_util.tree_map_with_path(check, tree)
    if bad:
        raise FloatingPointError(f"non-finite values in {name}: {bad[:10]}")


def tree_norm(tree) -> float:
    sq = sum(float(jnp.sum(jnp.square(x.astype(jnp.float32)))) for x in jax.tree.leaves(tree))
    return float(np.sqrt(sq))
