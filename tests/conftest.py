"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated on virtual CPU devices
(``--xla_force_host_platform_device_count``); real-TPU execution is covered
by bench.py and the driver's compile checks.
"""
import os

# Force CPU even when the session environment points JAX at a TPU tunnel.
# The tunnel's sitecustomize force-updates jax_platforms to "axon,cpu" at
# interpreter start, so overriding the env var is not enough — update the jax
# config itself before any backend is resolved.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0xDEADBEEF)


REFERENCE_DATA = "/root/reference/data"


@pytest.fixture
def reference_reads():
    import glob
    reads = sorted(glob.glob(os.path.join(REFERENCE_DATA, "reads", "*.fast5")))
    if not reads:
        pytest.skip("reference read data not available")
    return reads
