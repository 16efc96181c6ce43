"""Multi-host scale-out: process initialization and global batch
assembly.

The reference has no multi-node capability (SURVEY.md §2.9). The
TPU-native design: ``jax.distributed.initialize`` per host, one global
mesh over all chips, per-host input pipelines feeding
``jax.make_array_from_process_local_data`` so each host only touches its
shard, and the jitted eval/calibration steps from
``dfq_tpu.parallel.{eval,calib}`` running unchanged — GSPMD routes
collectives over ICI within a slice and DCN across slices.

Single-host (including the CPU test mesh) degrades gracefully: no
distributed init, local devices only.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dfq_tpu.parallel.mesh import DATA_AXIS


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize multi-host JAX. With no arguments, uses TPU metadata
    auto-detection (GKE/GCE); a no-op in single-process settings."""
    if num_processes is not None and num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh() -> Mesh:
    """Data mesh over every chip in the job (all hosts)."""
    return Mesh(np.array(jax.devices()), (DATA_AXIS,))


def host_shard_bounds(total: int) -> tuple[int, int]:
    """[start, end) of this host's slice of a length-``total`` dataset —
    the per-host file-list split for input pipelines."""
    n = jax.process_count()
    i = jax.process_index()
    per = (total + n - 1) // n
    return min(i * per, total), min((i + 1) * per, total)


def make_global_batch(mesh: Mesh, local_batch: np.ndarray):
    """Assemble a global device array from this host's local batch.
    ``local_batch`` is this process's shard; the leading dim of the
    global array is ``local * process_count``."""
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return jax.make_array_from_process_local_data(sharding, local_batch)
