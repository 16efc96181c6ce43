"""Data-parallel sharded evaluation.

Replaces the reference's single-GPU eval loop (``main_cls.py:44-69``)
with a mesh-sharded jit: batch split over the ``data`` axis, params
replicated, per-device top-1 counters reduced by GSPMD-inserted psum
over ICI. All three execution paths shard the same way — the fake-quant
simulator, the baseline true-int8 engine, and the fused int8-to-int8
engine — because each is a pure jittable function of (params, x); GSPMD
partitions the int8 convs exactly like the f32 ones.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dfq_tpu.graph.executor import execute
from dfq_tpu.graph.ir import Graph
from dfq_tpu.parallel.mesh import DATA_AXIS


def make_sharded_forward(
    graph: Graph,
    params,
    mesh: Mesh,
    *,
    act_ranges: Optional[Dict[str, Tuple[float, float]]] = None,
    bits_act: int = 8,
    int8_model=None,
    engine: Optional[str] = None,
):
    """Returns ``fwd(x) -> logits`` jitted over the mesh, x sharded on the
    data axis. ``engine`` selects the path: "sim" (fake-quant executor),
    "int8" (baseline true-int8), "fused" (int8-to-int8); default "int8"
    when an ``int8_model`` is supplied, else "sim"."""
    if engine is None:
        engine = "int8" if int8_model is not None else "sim"
    if engine in ("int8", "fused") and int8_model is None:
        raise ValueError(f"engine={engine!r} requires int8_model")

    data_sh = NamedSharding(mesh, P(DATA_AXIS))
    rep = NamedSharding(mesh, P())
    params = jax.device_put(params, rep)

    if engine == "int8":
        from dfq_tpu.engine.int8 import execute_int8

        def fwd(p, x):
            return execute_int8(int8_model, p, x)

    elif engine == "fused":
        from dfq_tpu.engine.int8_fused import auto_config, execute_int8_fused

        n_data = int(mesh.shape[DATA_AXIS])

        def fwd(p, x):
            # resolve the batch-dependent engine policy with the
            # PER-DEVICE batch: x here is the global array but GSPMD
            # configures every conv at global/n_data rows
            pdb = max(x.shape[0] // n_data, 1)
            dw, stem = auto_config(pdb)
            return execute_int8_fused(
                int8_model, p, x, dw_dense_max_ch=dw, stem_s2d=stem,
                per_device_batch=pdb,
            )

    elif engine == "sim":

        def fwd(p, x):
            return execute(
                graph, p, x, act_ranges=act_ranges or {}, bits_act=bits_act
            )

    else:
        raise ValueError(f"unknown engine {engine!r}")

    jfwd = jax.jit(fwd)

    def run(x):
        return jfwd(params, jax.device_put(x, data_sh))

    return run


def make_sharded_eval(
    graph: Graph,
    params,
    mesh: Mesh,
    *,
    act_ranges: Optional[Dict[str, Tuple[float, float]]] = None,
    bits_act: int = 8,
    int8_model=None,
    engine: Optional[str] = None,
):
    """Returns ``step(x, labels) -> (n_correct, n_total)`` with x sharded
    over the data axis. See :func:`make_sharded_forward` for engine
    selection."""
    if engine is None:
        engine = "int8" if int8_model is not None else "sim"
    fwd = make_sharded_forward(
        graph, params, mesh,
        act_ranges=act_ranges, bits_act=bits_act,
        int8_model=int8_model, engine=engine,
    )
    data_sh = NamedSharding(mesh, P(DATA_AXIS))

    @jax.jit
    def count(logits, labels):
        pred = jnp.argmax(logits, axis=-1)
        correct = jnp.sum((pred == labels).astype(jnp.int32))
        return correct, labels.shape[0]

    def run(x, labels):
        logits = fwd(x)
        correct, total = count(logits, jax.device_put(labels, data_sh))
        return int(correct), int(total)

    return run


def make_sharded_seg_eval(
    graph: Graph,
    params,
    mesh: Mesh,
    num_class: int,
    *,
    act_ranges: Optional[Dict[str, Tuple[float, float]]] = None,
    bits_act: int = 8,
    int8_model=None,
    engine: Optional[str] = None,
):
    """Segmentation analog of :func:`make_sharded_eval`: returns
    ``step(x, targets) -> confusion[num_class, num_class]`` with the
    batch sharded over the data axis and the whole metric computed ON
    device — argmax, the validity mask (``0 <= gt < num_class``, the
    reference Evaluator's mask, ``utils/metrics.py:19``) and the
    confusion bincount all run under one jit, so the device->host
    boundary per step is one C x C int array instead of per-pixel
    logits. Accumulate the returned matrices in
    :class:`dfq_tpu.metrics.SegEvaluator.confusion_matrix` for the
    derived metrics."""
    fwd = make_sharded_forward(
        graph, params, mesh,
        act_ranges=act_ranges, bits_act=bits_act,
        int8_model=int8_model, engine=engine,
    )
    data_sh = NamedSharding(mesh, P(DATA_AXIS))

    @jax.jit
    def confusion(logits, targets):
        pred = jnp.argmax(logits, axis=-1)
        gt = targets.astype(jnp.int32)
        valid = (gt >= 0) & (gt < num_class)
        # invalid pixels land in an overflow bin that is dropped
        label = jnp.where(valid, num_class * gt + pred, num_class * num_class)
        counts = jnp.bincount(
            label.reshape(-1), length=num_class * num_class + 1
        )
        return counts[:-1].reshape(num_class, num_class)

    def run(x, targets):
        logits = fwd(x)
        import numpy as _np

        return _np.asarray(
            confusion(logits, jax.device_put(targets, data_sh))
        ).astype(_np.int64)

    return run
