"""Test config: force an 8-device virtual CPU mesh before JAX initializes.

This mirrors the multi-device test strategy from SURVEY.md §4: data/tensor
parallel paths are validated on a virtual CPU mesh
(--xla_force_host_platform_device_count=8), no TPU required.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# Keep compile times sane on the single-core CI host.
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The runtime image's sitecustomize imports jax at interpreter startup with
# JAX_PLATFORMS=axon (real TPU tunnel); env vars alone are then too late, so
# force the platform through jax.config before any backend is created.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
