"""Test configuration.

Tests run on CPU with a forced 8-device mesh so the Pallas kernels run in
interpreter mode and the distributed shard_map path is exercised without a
pod — the strategy SURVEY.md §4 prescribes for the TPU build.
"""

import os

# Force CPU for the unit suite even if the machine exposes a TPU
# (set VRS_TEST_TPU=1 to run the suite against the real chip instead).
# jax may already be imported by a sitecustomize hook, so os.environ alone is
# not enough: jax.config snapshot env at import time.
if not os.environ.get("VRS_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
