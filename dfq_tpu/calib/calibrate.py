"""Distilled-data activation-range calibration.

Behavioral contract: reference ``update_quant_range``
(``/root/reference/improve_dfq.py:280-297``) with
``QuantMeasure.update_stat`` semantics
(``utils/quantize.py:103-107``): per batch, each site's statistic is the
batch-mean of per-sample min/max; running ranges start at 0 and expand
(``running_min = min(running_min, stat)``), so the final range always
contains 0. The input site is finally pinned to the preprocessing range.

The reference records stats through mutable QuantMeasure buffers while
quantizing with the ranges accumulated so far; here each batch runs the
jitted ``capture="minmax"`` forward with the current ranges applied, then
ranges are merged functionally.
"""

from __future__ import annotations

from typing import Dict, Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dfq_tpu.graph.executor import execute
from dfq_tpu.graph.ir import Graph, quant_sites
from dfq_tpu.passes.range_setter import CLS_INPUT_RANGE, DET_INPUT_RANGE


def calibrate_ranges(
    graph: Graph,
    params,
    batches: Iterable[np.ndarray],
    *,
    bits_act: int = 8,
    is_detection: bool = False,
) -> Dict[str, Tuple[float, float]]:
    sites = quant_sites(graph)
    ranges: Dict[str, Tuple[float, float]] = {s: (0.0, 0.0) for s in sites}

    @jax.jit
    def observe(p, x, act_ranges):
        _, aux = execute(
            graph, p, x, act_ranges=act_ranges, bits_act=bits_act, capture="minmax"
        )
        return aux

    first = True
    for batch in batches:
        x = jnp.asarray(batch, jnp.float32)
        # first batch observes unquantized; later batches run under the
        # ranges accumulated so far (QuantMeasure updates-then-quantizes)
        aux = observe(params, x, {} if first else ranges)
        first = False
        for s in sites:
            mn, mx = aux[s]
            lo, hi = ranges[s]
            ranges[s] = (min(lo, float(mn)), max(hi, float(mx)))

    # pin the network-input site (improve_dfq.py:288-296)
    for node in graph:
        if node.op in ("conv", "linear") and node.inputs:
            if graph[node.inputs[0]].op == "input":
                ranges[f"{node.name}:in0"] = (
                    DET_INPUT_RANGE if is_detection else CLS_INPUT_RANGE
                )
    return ranges


def estimate_stats(
    graph: Graph,
    params,
    batches: Iterable[np.ndarray],
    *,
    momentum: float = 0.1,
    num_epoch: int = 10,
    bits_act: int = 8,
) -> Dict[str, Tuple[float, float]]:
    """Data-dependent range estimation over REAL images (reference
    ``estimate_stats``, ``main_seg.py:40-82``: the model is run in train
    mode so every QuantMeasure EMA-updates its running min/max,
    ``utils/quantize.py:109-113``:
    ``running <- running*(1-m) + batch_stat*m``, m=0.1, where the batch
    stat is the mean over samples of per-sample min/max, and the forward
    quantizes each site with the batch stat itself).

    ``batches`` may be a list (re-iterated per epoch) or any re-iterable.
    Returns the frozen ranges to evaluate with.
    """
    sites = quant_sites(graph)
    ranges: Dict[str, Tuple[float, float]] = {s: (0.0, 0.0) for s in sites}

    @jax.jit
    def observe(p, x):
        _, aux = execute(
            graph, p, x, bits_act=bits_act, capture="minmax", self_quant=True
        )
        return aux

    for _ in range(num_epoch):
        for batch in batches:
            aux = observe(params, jnp.asarray(batch, jnp.float32))
            for s in sites:
                mn, mx = aux[s]
                lo, hi = ranges[s]
                ranges[s] = (
                    lo * (1.0 - momentum) + float(mn) * momentum,
                    hi * (1.0 - momentum) + float(mx) * momentum,
                )
    return ranges
