"""Empirical (distilled-data) bias correction.

Behavioral contract: reference ``bias_correction_distill``
(``/root/reference/improve_dfq.py:311-371``): run the quantized model
and the FP32 model over the distilled batches, accumulate each target
layer's batch+spatial-mean output, and subtract the per-channel
difference from the quantized layer's bias.

Deviation: the reference sums the error over spatial positions
(``improve_dfq.py:364``) which overcorrects by HxW; that code path is
dead (its call site is commented out, ``main_cls.py:166-177``), so the
spatial MEAN is used here.

The reference's forward hooks become the executor's
``capture="layer_outputs"`` mode; both models share the same graph
topology (folded, ReLU-swapped) with quantized vs FP32 params.
"""

from __future__ import annotations

from typing import Any, Dict, Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dfq_tpu.graph.executor import execute
from dfq_tpu.graph.ir import Graph


def bias_correction_distill(
    graph: Graph,
    params_q: Dict[str, Dict[str, Any]],
    act_ranges: Dict[str, Tuple[float, float]],
    params_fp: Dict[str, Dict[str, Any]],
    batches: Iterable[np.ndarray],
    bits_act: int = 8,
) -> Dict[str, Dict[str, Any]]:
    @jax.jit
    def q_outputs(p, x):
        _, aux = execute(
            graph, p, x, act_ranges=act_ranges, bits_act=bits_act,
            capture="layer_outputs",
        )
        return aux

    @jax.jit
    def fp_outputs(p, x):
        _, aux = execute(graph, p, x, capture="layer_outputs")
        return aux

    acc_q: Dict[str, np.ndarray] = {}
    acc_fp: Dict[str, np.ndarray] = {}
    n = 0
    for batch in batches:
        x = jnp.asarray(batch, jnp.float32)
        aq = q_outputs(params_q, x)
        af = fp_outputs(params_fp, x)
        for k in aq:
            acc_q[k] = acc_q.get(k, 0.0) + np.asarray(aq[k])
            acc_fp[k] = acc_fp.get(k, 0.0) + np.asarray(af[k])
        n += 1

    params_q = {k: dict(v) for k, v in params_q.items()}
    for name in acc_q:
        error = (acc_q[name] - acc_fp[name]) / n
        p = dict(params_q[name])
        b = p.get("bias")
        b = (
            np.zeros(error.shape[0], np.float32)
            if b is None
            else np.asarray(b, np.float32)
        )
        p["bias"] = (b - error.astype(np.float32)).astype(np.float32)
        params_q[name] = p
    return params_q
