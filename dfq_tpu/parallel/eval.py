"""Data-parallel sharded evaluation.

Replaces the reference's single-GPU eval loop (``main_cls.py:44-69``)
with a mesh-sharded jit: batch split over the ``data`` axis, params
replicated, per-device top-1 counters reduced by GSPMD-inserted psum
over ICI.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dfq_tpu.graph.executor import execute
from dfq_tpu.graph.ir import Graph
from dfq_tpu.parallel.mesh import DATA_AXIS


def make_sharded_eval(
    graph: Graph,
    params,
    mesh: Mesh,
    *,
    act_ranges: Optional[Dict[str, Tuple[float, float]]] = None,
    bits_act: int = 8,
    int8_model=None,
):
    """Returns ``step(x, labels) -> (n_correct, n_total)`` with x sharded
    over the data axis. If ``int8_model`` is given, runs the true-int8
    engine instead of the fake-quant simulator."""
    data_sh = NamedSharding(mesh, P(DATA_AXIS))
    rep = NamedSharding(mesh, P())
    params = jax.device_put(params, rep)

    if int8_model is not None:
        from dfq_tpu.engine.int8 import execute_int8

        def fwd(p, x):
            return execute_int8(int8_model, p, x)

    else:

        def fwd(p, x):
            return execute(
                graph, p, x, act_ranges=act_ranges or {}, bits_act=bits_act
            )

    @jax.jit
    def step(p, x, labels):
        logits = fwd(p, x)
        pred = jnp.argmax(logits, axis=-1)
        correct = jnp.sum((pred == labels).astype(jnp.int32))
        return correct, labels.shape[0]

    def run(x, labels):
        x = jax.device_put(x, data_sh)
        labels = jax.device_put(labels, data_sh)
        correct, total = step(params, x, labels)
        return int(correct), int(total)

    return run
