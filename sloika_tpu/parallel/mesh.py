"""Device mesh and sharding helpers.

The framework's scale-out model (replacing the reference's process pools,
SURVEY.md §2.4): a 1-D ``('data',)`` mesh for batch-parallel training and
basecalling.  Parameters are replicated; batches are sharded over the batch
axis; XLA's SPMD partitioner inserts the gradient ``psum`` over ICI
automatically from the sharding annotations.  Multi-host entry is
``jax.distributed.initialize`` + the same mesh over all processes' devices.
"""
import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_init_distributed():
    """Initialise the multi-host JAX runtime when launched under a
    coordinator (no-op single-host)."""
    if "JAX_COORDINATOR_ADDRESS" in os.environ or \
            "COORDINATOR_ADDRESS" in os.environ:
        jax.distributed.initialize()


def make_mesh(n_data=None, devices=None):
    """1-D data-parallel mesh over ``n_data`` devices (default: all)."""
    devices = devices if devices is not None else jax.devices()
    if n_data is not None:
        devices = devices[:n_data]
    return Mesh(np.array(devices), ("data",))


def batch_sharding(mesh, batch_axis=1):
    """Sharding for a time-major array with batch on ``batch_axis``."""
    spec = [None, None, None]
    spec[batch_axis] = "data"
    return NamedSharding(mesh, P(*spec[:3]))


def batch2_sharding(mesh, batch_axis=1):
    """Sharding for a rank-2 (time, batch) array."""
    spec = [None, None]
    spec[batch_axis] = "data"
    return NamedSharding(mesh, P(*spec))


def replicated(mesh):
    return NamedSharding(mesh, P())


def round_up(n, k):
    """Round ``n`` up to a multiple of ``k``."""
    return ((n + k - 1) // k) * k
