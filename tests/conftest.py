"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Note: in this environment the axon TPU plugin overrides the JAX_PLATFORMS
env var, so we must also force the platform through jax.config (which wins).
XLA_FLAGS must still be set before the first jax import for the virtual
device count to take effect.
"""

import os

if os.environ.get("TECOGAN_TEST_TPU") == "1":
    # opt-in: run the suite on the real TPU backend so the
    # @skipif(default_backend() != 'tpu') tests (Pallas kernels, the
    # flagship fast-path golden) execute. Run these ALONE — chip
    # contention corrupts timings and two processes can wedge the tunnel.
    import jax
else:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["JAX_PLATFORM_NAME"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
