"""Tensor-parallel (channel-sharded) int8 execution over a 2-D mesh.

Data parallelism replicates every weight on every chip; for serving
many models per pod, or models whose weights exceed one chip's HBM, the
TPU-native alternative is to shard the weights themselves. Convolution
tensor parallelism on TPU is expressed purely through shardings: put
every lowered int8 weight's OUTPUT-CHANNEL dim on a ``model`` mesh axis
(conv HWIO -> P(None,None,None,"model"); linear [in,out] ->
P(None,"model"); per-channel scale/bias/wsum -> P("model")), shard the
batch on the ``data`` axis, jit, and GSPMD partitions every conv and
inserts the all-gathers/reduce-scatters over ICI — no hand-written
collectives (the reference has no analog; its multi-GPU story is an
unused sync-BN registry, SURVEY §2.9).

Exactness: the int32 conv cores are partitioned per-output-channel
(disjoint work, no cross-shard accumulation), so TP logits match the
single-device engine bit-for-bit up to f32 epilogue reassociation —
asserted to tight tolerance in ``tests/test_parallel.py``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dfq_tpu.engine.int8 import Int8Model, execute_int8
from dfq_tpu.parallel.mesh import DATA_AXIS

MODEL_AXIS = "model"


def tp_mesh(n_data: int, n_model: int) -> Mesh:
    devices = np.array(jax.devices()[: n_data * n_model]).reshape(
        n_data, n_model
    )
    return Mesh(devices, (DATA_AXIS, MODEL_AXIS))


def shard_int8_weights(model: Int8Model, mesh: Mesh):
    """Place every lowered layer's tensors on the mesh with the output
    channel split over the model axis. Channel counts that don't divide
    the axis evenly are fine — GSPMD pads shards internally."""
    arrays = {}
    for name, L in model.layers.items():
        if L.qweight.ndim == 4:  # conv OIHW -> HWIO, O last
            qw = np.transpose(L.qweight, (2, 3, 1, 0))
            w_spec = P(None, None, None, MODEL_AXIS)
        else:  # linear [out, in] -> [in, out]
            qw = L.qweight.T
            w_spec = P(None, MODEL_AXIS)
        ch = NamedSharding(mesh, P(MODEL_AXIS))
        entry = {
            "qweight": jax.device_put(jnp.asarray(qw), NamedSharding(mesh, w_spec)),
            "wsum": jax.device_put(jnp.asarray(L.wsum, jnp.int32), ch),
            "scale": jax.device_put(jnp.asarray(L.w_scale), ch),
        }
        entry["bias"] = (
            jax.device_put(jnp.asarray(L.bias), ch)
            if L.bias is not None
            else None
        )
        arrays[name] = entry
    return arrays


def make_tp_int8_forward(
    model: Int8Model,
    params_f32,
    mesh: Mesh,
):
    """Returns ``fwd(x) -> logits`` with weights sharded over the model
    axis and the batch over the data axis."""
    arrays = shard_int8_weights(model, mesh)
    params = jax.device_put(params_f32, NamedSharding(mesh, P()))
    x_spec = NamedSharding(mesh, P(DATA_AXIS))

    @jax.jit
    def fwd(arrays, p, x):
        return execute_int8(model, p, x, weights=arrays)

    def run(x):
        return fwd(arrays, params, jax.device_put(x, x_spec))

    return run
