"""Distilled-data activation-range calibration.

Behavioral contract: reference ``update_quant_range``
(``/root/reference/improve_dfq.py:280-297``) with
``QuantMeasure.forward`` semantics (``utils/quantize.py:103-119``) in the
state the reference actually reaches it: every QuantMeasure in the +DR
path is freshly constructed by ``set_layer_bits`` / ``switch_layers``
AFTER the script's ``model.eval()`` (``main_cls.py:84``), and the next
``model.eval()`` only happens after calibration (``main_cls.py:196-197``)
— so during ``update_quant_range`` each QuantMeasure runs BOTH its
``update_stat`` branch and its ``self.training`` branch:

1. stat = batch-mean of per-sample min/max of the input,
2. ``running <- extreme(running, stat)``       (update_stat merge),
3. ``running <- running*(1-m) + stat*m``, m=0.1 (training EMA),
4. the site quantizes with the BATCH STAT itself (training branch),
   not the running range — so the forwards are independent of the
   running recurrence.

Running ranges start at 0; after the merge-then-EMA recurrence the final
range still always contains 0 (the merge keeps the sign, the EMA shrinks
toward the stat by at most 10% per batch). The input site is finally
pinned to the preprocessing range. Whole-model equality against the
reference's own code: ``tests/test_reference_parity_dr.py``.
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
    momentum = 0.1  # QuantMeasure default (utils/quantize.py:90)

    @jax.jit
    def observe(p, x):
        # self_quant = the QuantMeasure training branch: each site
        # quantizes with THIS batch's stat, so the forward does not
        # depend on the running ranges at all
        _, aux = execute(
            graph, p, x, bits_act=bits_act, capture="minmax", self_quant=True
        )
        return aux

    for batch in batches:
        aux = observe(params, jnp.asarray(batch, jnp.float32))
        for s in sites:
            mn, mx = float(aux[s][0]), float(aux[s][1])
            lo, hi = ranges[s]
            # update_stat merge, then training-mode EMA (both branches
            # run — see module docstring)
            lo, hi = min(lo, mn), max(hi, mx)
            ranges[s] = (
                lo * (1.0 - momentum) + mn * momentum,
                hi * (1.0 - momentum) + mx * momentum,
            )

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
