"""Test configuration.

Tests run on a virtual 8-device CPU backend so multi-chip sharding logic is
exercised without TPU hardware (the driver separately dry-runs the
multichip path).  float64 is enabled so slow numpy float64 oracles can be
compared against the same math run in JAX at full precision; production
entry points still run float32/bfloat16 (they construct f32 arrays
explicitly).
"""

import os

# The environment pins JAX_PLATFORMS to the TPU plugin; tests must run on
# a virtual multi-device CPU backend, so override via the config (which
# wins over the env var) and request 8 host devices before backend init.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
