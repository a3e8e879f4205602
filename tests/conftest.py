"""Test configuration.

Tests run on a virtual 8-device CPU mesh so sharding/collective paths are
exercised without TPU hardware; the environment must be set before JAX is
imported anywhere.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

# The environment may pre-register an accelerator backend at interpreter
# start (sitecustomize); jax.config is the only reliable override point.
import jax

jax.config.update("jax_platforms", "cpu")

import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

# The PyTorch reference implementation is the parity oracle (CPU-only).
REFERENCE = "/root/reference"
if os.path.isdir(REFERENCE) and REFERENCE not in sys.path:
    sys.path.append(REFERENCE)

import pytest  # noqa: E402


@pytest.fixture()
def rng():
    """Fresh seeded generator per test: data is deterministic regardless of
    test selection or execution order."""
    import numpy as np

    return np.random.default_rng(0)
