"""Device-mesh helpers for multi-chip scale-out.

The reference is strictly single-device (SURVEY.md §2.9: no NCCL/MPI, no
TP/PP — its only 'distributed' code is an unused sync-BN thread registry).
The TPU-native scale-out axis for this workload is data parallelism:
weights replicated, image batches sharded across chips, scalar
reductions (accuracy counters, calibration statistics) as XLA collectives
over ICI — all expressed through ``jax.sharding`` + ``jit``; GSPMD
inserts the ``psum``s.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def data_mesh(n_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested a {n_devices}-device mesh but only "
                f"{len(devices)} devices exist (check "
                "xla_force_host_platform_device_count)"
            )
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (DATA_AXIS,))


def shard_batch(mesh: Mesh, x):
    """Place a host batch sharded along its leading dim over the mesh."""
    return jax.device_put(x, NamedSharding(mesh, P(DATA_AXIS)))


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params, ranges) across all devices."""
    return jax.device_put(tree, NamedSharding(mesh, P()))
