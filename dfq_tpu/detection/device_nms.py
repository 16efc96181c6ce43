"""Device-side (jittable) SSD post-process: box decode + per-class NMS.

The reference's predict path leaves decode+NMS on the host CPU
(``/root/reference/modeling/detection/predictor.py:38-66``,
``utils/detection/box_utils.py:219-249``) — a Python while-loop per
class. Measured round 4 (SERVING_r04.json): the host post-process costs
2.4-10.4 ms/image single-threaded while the whole int8 forward is
0.53 ms at batch 1 — the host dominates end-to-end predict latency, and
the device->host boundary ships 300KB/image of raw conf/loc.

This module runs the same greedy hard-NMS ON the TPU with static
shapes, vmapped over classes (and batch):

- decode: ``convert_locations_to_boxes`` + center->corner in jnp
  (same formulas as ``detection/box_utils.py:83-116``);
- per class: ``lax.top_k`` picks the ``candidate_size`` highest scores
  (the reference's ``argsort[:candidate_size]``), one O(K^2) IoU matrix,
  then a ``lax.fori_loop`` greedy suppression sweep in score order —
  identical keep-set to the host loop for distinct scores (ties break by
  index in both);
- output: fixed-shape ``(num_classes-1, top_k)`` boxes/scores/valid —
  ~4KB/image instead of 300KB, and the host does no arithmetic at all.

Exactness vs the host path: ``tests/test_device_nms.py``.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def decode_locations(loc, priors, center_variance: float, size_variance: float):
    """jnp twin of ``box_utils.convert_locations_to_boxes`` +
    ``center_form_to_corner_form`` (reference ``box_utils.py:83-116``)."""
    centers = loc[..., :2] * center_variance * priors[..., 2:] + priors[..., :2]
    sizes = jnp.exp(loc[..., 2:] * size_variance) * priors[..., 2:]
    return jnp.concatenate(
        [centers - sizes / 2.0, centers + sizes / 2.0], axis=-1
    )


def _iou_matrix(boxes, eps=1e-5):
    lt = jnp.maximum(boxes[:, None, :2], boxes[None, :, :2])
    rb = jnp.minimum(boxes[:, None, 2:], boxes[None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    wh_a = jnp.clip(boxes[:, 2:] - boxes[:, :2], 0.0, None)
    area = wh_a[:, 0] * wh_a[:, 1]
    return inter / (area[:, None] + area[None, :] - inter + eps)


def _iou_row(box, boxes, area, eps=1e-5):
    """IoU of one [4] box against [K,4] boxes (``area``: precomputed
    [K] box areas). The pick loop computes only the picked box's row —
    O(top_k * K) total instead of materializing the K x K matrix
    (which, vmapped over batch x classes, was ~820 MB at b=128 and the
    bulk of device-NMS time)."""
    lt = jnp.maximum(box[:2], boxes[:, :2])
    rb = jnp.minimum(box[2:], boxes[:, 2:])
    wh = jnp.clip(rb - lt, 0.0, None)
    inter = wh[:, 0] * wh[:, 1]
    wh_a = jnp.clip(box[2:] - box[:2], 0.0, None)
    a1 = wh_a[0] * wh_a[1]
    return inter / (a1 + area - inter + eps)


def _class_nms(scores, boxes, prob_threshold, iou_threshold,
               candidate_size: int, top_k: int):
    """Greedy hard-NMS for ONE class. ``scores``: [P], ``boxes``: [P,4].
    Returns (boxes[top_k,4], scores[top_k], valid[top_k])."""
    masked = jnp.where(scores > prob_threshold, scores, 0.0)
    cand_scores, cand_idx = lax.top_k(masked, candidate_size)
    cand_boxes = boxes[cand_idx]
    wh_a = jnp.clip(cand_boxes[:, 2:] - cand_boxes[:, :2], 0.0, None)
    cand_area = wh_a[:, 0] * wh_a[:, 1]
    valid0 = cand_scores > prob_threshold

    # Greedy sweep as a PICK loop: each iteration takes the first alive
    # candidate (candidates are score-sorted, so "first alive" IS the
    # greedy pick) and suppresses its overlaps — identical keep-set to
    # sweeping all candidate_size positions, but only min(top_k, K)
    # sequential steps instead of K. r5: the K-step sweep made device
    # NMS 2/3 of e2e detection time at b=128 (SERVING_r05.json A/B:
    # 200 -> 10 steps cut e2e 32.5 -> ~13 ms).
    n_pick = min(top_k, candidate_size)

    def body(t, state):
        alive, idxs, valid = state
        first = jnp.argmax(alive)  # first True; 0 if none alive
        take = alive[first]
        idxs = idxs.at[t].set(first)
        valid = valid.at[t].set(take)
        row = _iou_row(cand_boxes[first], cand_boxes, cand_area)
        suppress = take & (row > iou_threshold)
        alive = alive & ~suppress
        return alive, idxs, valid

    state = (
        valid0,
        jnp.zeros((top_k,), jnp.int32),
        jnp.zeros((top_k,), bool),
    )
    if n_pick <= 16:
        # static unroll: one scheduled graph instead of n_pick loop
        # dispatches (the loop-carry overhead was most of the remaining
        # NMS time at b=128)
        for t in range(n_pick):
            state = body(t, state)
    else:
        state = lax.fori_loop(0, n_pick, body, state)
    _, idxs, valid = state
    out_boxes = jnp.where(valid[:, None], cand_boxes[idxs], 0.0)
    out_scores = jnp.where(valid, cand_scores[idxs], 0.0)
    return out_boxes, out_scores, valid


@functools.partial(
    jax.jit,
    static_argnames=("candidate_size", "top_k", "center_variance",
                     "size_variance", "prob_threshold", "iou_threshold"),
)
def decode_nms(
    conf,  # [P, C] softmaxed
    loc,  # [P, 4]
    priors,  # [P, 4] center-form
    *,
    prob_threshold: float = 0.01,
    iou_threshold: float = 0.45,
    candidate_size: int = 200,
    top_k: int = 10,
    center_variance: float = 0.1,
    size_variance: float = 0.2,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Single-image device post-process. Returns
    ``(boxes[C-1, top_k, 4], scores[C-1, top_k], valid[C-1, top_k])``
    (class 0 = background skipped; row c corresponds to class c+1)."""
    boxes = decode_locations(loc, priors, center_variance, size_variance)
    per_class = jax.vmap(
        lambda s: _class_nms(
            s, boxes, prob_threshold, iou_threshold, candidate_size, top_k
        )
    )
    return per_class(conf[:, 1:].T)


def decode_nms_batch(conf, loc, priors, **kw):
    """Batched device post-process: ``conf [B,P,C]``, ``loc [B,P,4]`` ->
    ``(boxes[B,C-1,top_k,4], scores[B,C-1,top_k], valid[B,C-1,top_k])``.
    The serving path: run this inside the same jit as the int8 forward
    (measured: forward+decode+NMS = 0.93 ms at b=1, SERVING_r04.json)."""
    return jax.vmap(lambda c, l: decode_nms(c, l, priors, **kw))(conf, loc)


def predict_on_device(conf, loc, priors, image_size_hw, **kw):
    """Fetch-and-unpack wrapper matching ``Predictor.predict``'s return
    contract: (boxes[K,4] in pixels, labels[K], probs[K])."""
    b, s, v = decode_nms(
        jnp.asarray(conf), jnp.asarray(loc), jnp.asarray(priors), **kw
    )
    b, s, v = np.asarray(b), np.asarray(s), np.asarray(v)
    height, width = image_size_hw
    out_boxes, out_labels, out_probs = [], [], []
    for c in range(v.shape[0]):
        for k in range(v.shape[1]):
            if v[c, k]:
                bb = b[c, k] * [width, height, width, height]
                out_boxes.append(bb)
                out_labels.append(c + 1)
                out_probs.append(s[c, k])
    if not out_boxes:
        return (
            np.zeros((0, 4), np.float32),
            np.zeros((0,), np.int32),
            np.zeros((0,), np.float32),
        )
    return (
        np.asarray(out_boxes, np.float32),
        np.asarray(out_labels, np.int32),
        np.asarray(out_probs, np.float32),
    )
