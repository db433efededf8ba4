"""Test harness configuration.

Forces JAX onto a virtual 8-device CPU mesh (SURVEY.md §4: multi-device tests
run on CPU via --xla_force_host_platform_device_count) so the full pjit /
shard_map surface is exercised without TPU hardware. Must run before the first
`import jax` anywhere in the test session.
"""

import os

# Force-override: the machine env pins JAX_PLATFORMS=axon (remote TPU tunnel)
# and a sitecustomize hook imports jax at interpreter startup, so env vars set
# here are too late — go through jax.config instead.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.device_count() == 8, (
    "expected the 8-device virtual CPU mesh; XLA_FLAGS was applied too late"
)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
