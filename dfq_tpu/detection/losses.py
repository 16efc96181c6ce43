"""SSD training utilities: prior matching and multibox loss.

Behavioral contracts: reference ``modeling/detection/ssd.py:142-159``
(``MatchPrior``) and ``modeling/detection/nn/multibox_loss.py``
(hard-negative-mined cross entropy + smooth-L1 on positives). The
reference ships these but never trains; they are provided so the
framework is trainable end-to-end (the loss is jittable).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from dfq_tpu.detection import box_utils


class MatchPrior:
    """Ground-truth -> per-prior regression targets + labels (host)."""

    def __init__(self, center_form_priors, center_variance, size_variance,
                 iou_threshold):
        self.center_form_priors = np.asarray(center_form_priors, np.float32)
        self.corner_form_priors = box_utils.center_form_to_corner_form(
            self.center_form_priors
        )
        self.center_variance = center_variance
        self.size_variance = size_variance
        self.iou_threshold = iou_threshold

    def __call__(self, gt_boxes: np.ndarray, gt_labels: np.ndarray):
        boxes, labels = box_utils.assign_priors(
            np.asarray(gt_boxes, np.float32),
            np.asarray(gt_labels),
            self.corner_form_priors,
            self.iou_threshold,
        )
        boxes = box_utils.corner_form_to_center_form(boxes)
        locations = box_utils.convert_boxes_to_locations(
            boxes, self.center_form_priors, self.center_variance,
            self.size_variance,
        )
        return locations.astype(np.float32), labels


def hard_negative_mining(loss, labels, neg_pos_ratio: int):
    """Keep all positives and the top-k negatives per image
    (reference ``box_utils.py:182-204``); jittable."""
    pos_mask = labels > 0
    num_pos = jnp.sum(pos_mask, axis=1, keepdims=True)
    num_neg = num_pos * neg_pos_ratio

    loss = jnp.where(pos_mask, -jnp.inf, loss)
    order = jnp.argsort(-loss, axis=1)
    ranks = jnp.argsort(order, axis=1)
    neg_mask = ranks < num_neg
    return pos_mask | neg_mask


def multibox_loss(
    confidence: jnp.ndarray,  # [N, P, C] raw logits
    predicted_locations: jnp.ndarray,  # [N, P, 4]
    labels: jnp.ndarray,  # [N, P] int
    gt_locations: jnp.ndarray,  # [N, P, 4]
    neg_pos_ratio: int = 3,
):
    """Returns (smooth_l1_loss, classification_loss), both normalized by
    the positive count (reference ``multibox_loss.py``)."""
    log_probs = jax.nn.log_softmax(confidence, axis=2)
    neg_logp_bg = -log_probs[..., 0]
    mask = hard_negative_mining(neg_logp_bg, labels, neg_pos_ratio)

    ce = -jnp.take_along_axis(log_probs, labels[..., None], axis=2)[..., 0]
    classification_loss = jnp.sum(jnp.where(mask, ce, 0.0))

    pos_mask = labels > 0
    diff = predicted_locations - gt_locations
    abs_diff = jnp.abs(diff)
    smooth_l1 = jnp.where(abs_diff < 1.0, 0.5 * diff**2, abs_diff - 0.5)
    smooth_l1_loss = jnp.sum(
        jnp.where(pos_mask[..., None], smooth_l1, 0.0)
    )

    num_pos = jnp.maximum(jnp.sum(pos_mask), 1)
    return smooth_l1_loss / num_pos, classification_loss / num_pos
