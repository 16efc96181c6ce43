"""Worker process for the two-process multi-host test
(``tests/test_multihost_2proc.py``).  Each process owns 4 virtual CPU
devices; together they form one 8-device global mesh.  Exercises the
real cross-process path the single-process tests cannot:
``jax.distributed.initialize`` -> global mesh -> per-host
``make_global_batch`` shards -> GSPMD-inserted cross-process reductions.

Usage: python tests/mh_worker.py <rank> <nproc> <port>
Prints one line ``RESULT <rank> <sum> <correct> <total>`` on success.
"""

import os
import sys


def main():
    rank, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_ENABLE_X64"] = "0"

    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from dfq_tpu.parallel.multihost import (
        global_mesh,
        host_shard_bounds,
        initialize,
        make_global_batch,
    )

    initialize(f"localhost:{port}", nproc, rank)
    assert jax.process_count() == nproc, jax.process_count()
    mesh = global_mesh()
    assert mesh.devices.size == 4 * nproc

    # per-host dataset split
    start, end = host_shard_bounds(80)
    assert end - start == 80 // nproc

    # each host contributes a distinct local shard; the global reduction
    # must see both -> sum = sum over ranks of (rank+1) * 4 rows * 3 cols
    local = np.full((4, 3), rank + 1, np.float32)
    arr = make_global_batch(mesh, local)
    assert arr.shape == (4 * nproc, 3)
    total = jax.jit(
        lambda a: jnp.sum(a), out_shardings=NamedSharding(mesh, P())
    )(arr)
    got = float(jax.device_get(total))

    # the sharded-eval counter path: per-device argmax + global correct
    # count (the psum the reference never had, SURVEY.md §2.9/§5.8)
    logits_local = np.zeros((4, 10), np.float32)
    labels_local = np.arange(4) + (4 * rank)
    logits_local[np.arange(4), labels_local % 10] = 1.0
    # make one row per host wrong so correct = total - nproc
    logits_local[0] = 0.0
    logits_local[0, (labels_local[0] + 1) % 10] = 1.0
    gl = make_global_batch(mesh, logits_local)
    gy = make_global_batch(mesh, (labels_local % 10).astype(np.int32))

    @jax.jit
    def count(logits, labels):
        pred = jnp.argmax(logits, axis=-1)
        return jnp.sum((pred == labels).astype(jnp.int32))

    correct = int(jax.device_get(count(gl, gy)))
    print(f"RESULT {rank} {got} {correct} {4 * nproc}", flush=True)


if __name__ == "__main__":
    main()
