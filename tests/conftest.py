"""Test configuration: force an 8-device virtual CPU mesh before JAX initializes.

This emulates a TPU slice for sharding/collective tests without hardware
(SURVEY.md §4.4), and keeps unit tests off the (single) real TPU chip.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The image's jax install pins jax_platforms to "axon,cpu" regardless of the env var;
# force CPU before any backend initializes so unit tests never ride the TPU tunnel.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu", jax.devices()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
