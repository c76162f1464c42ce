"""Test configuration: run on a virtual 8-device CPU mesh with float64 enabled.

Real-TPU behaviour is exercised by the driver's bench/dryrun; tests validate
numerics (f64) and multi-device sharding semantics on the host.
"""
import os

# Hard override: the driver environment presets JAX_PLATFORMS=axon (real TPU);
# unit tests must run on the virtual CPU mesh in f64.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# Some environments patch jax_platforms to "axon,cpu" (real TPU tunnel) during
# import; force pure CPU before any backend is initialized.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
