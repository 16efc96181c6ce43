"""Learned equalization scales (the reference's ``update_scale`` experiment).

Behavioral contract: reference ``improve_dfq.py:193-278`` (+ the
``scale``/``scale_prev`` machinery on QConv2d, ``utils/quantize.py:
135-174``) — an abandoned-but-shipped experiment (``README.md:194-195``)
that refines cross-layer-equalization scales by gradient descent:

- one learnable per-channel scale vector per relation, applied as
  ``W1 * s`` (rows) / ``b1 * s`` / ``W2 / s`` (columns, group-aware),
- loss = ``KL(fp32_logits || quantized_logits)`` per distilled batch
  (``kl_categorical``, ``improve_dfq.py:174-181``), Adam lr 1e-3,
- after every step the BN stat buffers are rescaled by the current
  scales and the data-free quant ranges re-derived
  (``improve_dfq.py:247-254`` → ``set_quant_minmax``),
- early stop when loss < 0.02 (``improve_dfq.py:263-265``).

TPU-native design: scales are leaves of an optax-optimized pytree; the
scaled + weight-fake-quantized forward is one jitted, differentiable
function (straight-through estimator on the weight rounding — the
reference gets this from ``UniformQuantize.backward``,
``utils/quantize.py:79-83``). Range re-derivation stays host-side numpy
(it is the same closed-form pass as ``passes/range_setter.py``), refreshed
between jitted steps exactly like the reference refreshes between torch
steps. The reference's ``GradHook`` mask is a no-op in the shipped code
(``hook_mask_grad_tensor`` returns ``grad`` unconditionally,
``improve_dfq.py:49-50``), so no mask is applied here either.
"""

from __future__ import annotations

import copy
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dfq_tpu.graph.executor import execute
from dfq_tpu.graph.ir import Graph
from dfq_tpu.passes.range_setter import set_quant_ranges
from dfq_tpu.passes.relations import Relation
from dfq_tpu.quant.core import fake_quant


def _fq_ste(x, mn, mx, bits):
    y = fake_quant(x, mn, mx, bits=bits)
    return x + jax.lax.stop_gradient(y - x)


def _apply_scales_jnp(params, relations: Sequence[Relation], scales: List[jnp.ndarray]):
    """Differentiable analog of equalize._apply_pair over device params."""
    out = dict(params)

    def upd(name):
        if out[name] is params[name]:
            out[name] = dict(params[name])
        return out[name]

    for rel, s in zip(relations, scales):
        p1 = upd(rel.first)
        w1 = p1["weight"]
        p1["weight"] = w1 * s.reshape((-1,) + (1,) * (w1.ndim - 1))
        if p1.get("bias") is not None:
            p1["bias"] = p1["bias"] * s
        p2 = upd(rel.second)
        w2 = p2["weight"]
        o1 = s.shape[0]
        i2 = w2.shape[1]
        num_group = o1 // i2 if o1 != i2 else 1
        go = w2.shape[0] // num_group
        w2g = w2.reshape((num_group, go, i2) + w2.shape[2:])
        sg = s.reshape((num_group, 1, i2) + (1,) * (w2.ndim - 2))
        p2["weight"] = (w2g / sg).reshape(w2.shape)
    return out


def _kl_categorical(p_logit, q_logit):
    """KL(softmax(p) || softmax(q)), summed then batch-normalized
    (reference ``improve_dfq.py:174-181``)."""
    p = jax.nn.softmax(p_logit, axis=-1)
    kl = jnp.sum(
        p * (jax.nn.log_softmax(p_logit, axis=-1) - jax.nn.log_softmax(q_logit, axis=-1))
    )
    return kl / p_logit.shape[0]


def learn_scales(
    graph: Graph,
    params: Dict[str, Dict[str, Any]],
    relations: Sequence[Relation],
    batches: Sequence[np.ndarray],
    *,
    num_epoch: int = 10,
    lr: float = 1e-3,
    bits_w: int = 8,
    bits_act: int = 8,
    is_detection: bool = False,
    loss_break: float = 0.02,
    verbose: bool = False,
) -> Tuple[Dict[str, Dict[str, Any]], Dict[str, Tuple[float, float]], List[float]]:
    """Refine equalization scales on distilled data.

    ``params`` must be BN-folded (stat buffers present). Returns
    ``(merged_params, act_ranges, loss_history)``: scales merged into the
    weights (reference ``merge_scale_to_weight``, ``utils/quantize.py:
    145-156``) as host numpy, plus the final data-free ranges.
    """
    targets = sorted({r.first for r in relations} | {r.second for r in relations})
    dev_params = jax.device_put(
        jax.tree_util.tree_map(jnp.asarray, dict(params))
    )

    def q_forward(scales, x, act_ranges):
        p = _apply_scales_jnp(dev_params, relations, scales)
        # per-forward weight fake-quant with current min/max (QConv2d path,
        # utils/quantize.py:176-205), straight-through gradient
        for name in targets:
            q = dict(p[name])
            w = q["weight"]
            q["weight"] = _fq_ste(w, jnp.min(w), jnp.max(w), bits_w)
            p[name] = q
        return execute(graph, p, x, act_ranges=act_ranges, bits_act=bits_act)

    def loss_fn(scales, x, fp_logit, act_ranges):
        q_logit = q_forward(scales, x, act_ranges)
        return _kl_categorical(fp_logit, q_logit)

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    fp_fwd = jax.jit(lambda x: execute(graph, dev_params, x))

    scales = [
        jnp.ones((params[r.first]["weight"].shape[0],), jnp.float32)
        for r in relations
    ]
    opt = optax.adam(lr)
    opt_state = opt.init(scales)

    def derive_ranges(scales_np):
        # rescale stat buffers then rerun the closed-form range pass
        # (improve_dfq.py:247-254)
        p = copy.deepcopy(params)
        for rel, s in zip(relations, scales_np):
            if rel.bn is not None:
                p[rel.bn]["stat_std"] = (p[rel.bn]["stat_std"] * s).astype(np.float32)
                p[rel.bn]["stat_mean"] = (p[rel.bn]["stat_mean"] * s).astype(np.float32)
        return set_quant_ranges(graph, p, is_detection=is_detection)

    act_ranges = derive_ranges([np.asarray(s) for s in scales])
    history: List[float] = []
    stop = False
    for epoch in range(num_epoch):
        for x in batches:
            xb = jnp.asarray(x, jnp.float32)
            fp_logit = fp_fwd(xb)
            loss, g = grad_fn(scales, xb, fp_logit, act_ranges)
            updates, opt_state = opt.update(g, opt_state)
            scales = optax.apply_updates(scales, updates)
            act_ranges = derive_ranges([np.asarray(s) for s in scales])
            history.append(float(loss))
            if verbose:
                print(f"epoch {epoch + 1} loss {float(loss):.4f}")
            if float(loss) < loss_break:
                stop = True
                break
        if stop:
            break

    scales_np = [np.asarray(s, np.float32) for s in scales]
    merged = copy.deepcopy(params)
    for rel, s in zip(relations, scales_np):
        p1 = merged[rel.first]
        p1["weight"] = (p1["weight"] * s.reshape((-1,) + (1,) * (p1["weight"].ndim - 1))).astype(np.float32)
        if p1.get("bias") is not None:
            p1["bias"] = (p1["bias"] * s).astype(np.float32)
        if rel.bn is not None:
            merged[rel.bn]["stat_std"] = (merged[rel.bn]["stat_std"] * s).astype(np.float32)
            merged[rel.bn]["stat_mean"] = (merged[rel.bn]["stat_mean"] * s).astype(np.float32)
        p2 = merged[rel.second]
        w2 = p2["weight"]
        o1 = s.shape[0]
        i2 = w2.shape[1]
        num_group = o1 // i2 if o1 != i2 else 1
        go = w2.shape[0] // num_group
        w2g = w2.reshape((num_group, go, i2) + w2.shape[2:])
        sg = s.reshape((num_group, 1, i2) + (1,) * (w2.ndim - 2))
        p2["weight"] = (w2g / sg).reshape(w2.shape).astype(np.float32)
        rel.accumulate_scale(s)
    return merged, derive_ranges(scales_np), history
