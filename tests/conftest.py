"""Test harness: run everything on a virtual 8-device CPU mesh.

Must set platform flags BEFORE jax initializes (SURVEY.md §4 implication v:
multi-chip sharding is validated on CPU via
``--xla_force_host_platform_device_count``; real-TPU numbers come from
``bench.py``, not the test suite).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin in this image overrides JAX_PLATFORMS from the
# environment; jax.config wins over both.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu"
assert len(jax.devices()) == 8, "expected the virtual 8-device CPU mesh"


@pytest.fixture
def rng():
    return np.random.default_rng(0)
