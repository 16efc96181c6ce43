"""Device-side decode+NMS vs the host reference path.

The jitted ``decode_nms`` must reproduce the host pipeline exactly
(same decode formulas, same greedy keep-set): decode parity vs
``box_utils.convert_locations_to_boxes``/``center_form_to_corner_form``
and end-to-end parity vs ``Predictor.predict``'s per-class
threshold -> hard_nms -> top_k flow (reference
``modeling/detection/predictor.py:38-66``)."""

import numpy as np
import pytest

from dfq_tpu.detection import box_utils
from dfq_tpu.detection.device_nms import (
    decode_locations,
    decode_nms,
    predict_on_device,
)


def _random_problem(seed, n_priors=400, n_classes=6):
    rng = np.random.default_rng(seed)
    priors = np.stack(
        [
            rng.uniform(0.1, 0.9, n_priors),
            rng.uniform(0.1, 0.9, n_priors),
            rng.uniform(0.05, 0.3, n_priors),
            rng.uniform(0.05, 0.3, n_priors),
        ],
        axis=1,
    ).astype(np.float32)
    loc = rng.normal(0, 1, (n_priors, 4)).astype(np.float32)
    logits = rng.normal(0, 2, (n_priors, n_classes)).astype(np.float32)
    conf = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    return conf.astype(np.float32), loc, priors


def test_decode_matches_host():
    conf, loc, priors = _random_problem(0)
    ours = np.asarray(decode_locations(loc, priors, 0.1, 0.2))
    ref = box_utils.center_form_to_corner_form(
        box_utils.convert_locations_to_boxes(loc, priors, 0.1, 0.2)
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def _host_predict(conf, loc, priors, prob_threshold, iou_threshold, top_k):
    boxes = box_utils.center_form_to_corner_form(
        box_utils.convert_locations_to_boxes(loc, priors, 0.1, 0.2)
    )
    picked = {}
    for c in range(1, conf.shape[1]):
        probs = conf[:, c]
        mask = probs > prob_threshold
        if not mask.any():
            continue
        bp = np.concatenate(
            [boxes[mask], probs[mask, None]], axis=1
        ).astype(np.float32)
        kept = box_utils.hard_nms(
            bp, iou_threshold, top_k=top_k, candidate_size=200
        )
        picked[c] = kept
    return picked


@pytest.mark.parametrize("seed", [1, 2, 3])
@pytest.mark.parametrize("thr", [0.05, 0.3])
def test_device_nms_keep_set_matches_host(seed, thr):
    conf, loc, priors = _random_problem(seed)
    iou_thr, top_k = 0.45, 10
    ref = _host_predict(conf, loc, priors, thr, iou_thr, top_k)
    b, s, v = decode_nms(
        conf, loc, priors,
        prob_threshold=thr, iou_threshold=iou_thr,
        candidate_size=200, top_k=top_k,
    )
    b, s, v = np.asarray(b), np.asarray(s), np.asarray(v)
    for c in range(1, conf.shape[1]):
        dev_n = int(v[c - 1].sum())
        ref_bp = ref.get(c)
        if ref_bp is None:
            assert dev_n == 0, c
            continue
        assert dev_n == ref_bp.shape[0], (c, dev_n, ref_bp.shape)
        # same boxes, same order (both greedy in descending score)
        np.testing.assert_allclose(
            b[c - 1, :dev_n], ref_bp[:, :4], rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            s[c - 1, :dev_n], ref_bp[:, 4], rtol=1e-5, atol=1e-6
        )
        # valid slots are a prefix
        assert v[c - 1, :dev_n].all() and not v[c - 1, dev_n:].any()


def test_predictor_device_flag_matches_host():
    from dfq_tpu.detection.predictor import Predictor
    from dfq_tpu.models.ssd import SSDConfig

    cfg = SSDConfig()
    rng = np.random.default_rng(7)
    n_priors = cfg.priors.shape[0]
    logits = rng.normal(0, 2, (n_priors, 21)).astype(np.float32)
    conf = (np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)).astype(
        np.float32
    )[None]
    loc = rng.normal(0, 1, (n_priors, 4)).astype(np.float32)[None]
    fwd = lambda x: (conf, loc)
    img = np.zeros((375, 500, 3), np.float32)

    host = Predictor(fwd, cfg)
    dev = Predictor(fwd, cfg, device_nms=True)
    hb, hl, hp = host.predict(img, top_k=10, prob_threshold=0.2)
    db, dl, dp = dev.predict(img, top_k=10, prob_threshold=0.2)
    assert len(hl) == len(dl) > 0
    # same detections; host orders by class-scan, device likewise
    np.testing.assert_array_equal(np.sort(hl), np.sort(dl))
    np.testing.assert_allclose(
        hb[np.lexsort(hb.T)], db[np.lexsort(db.T)], rtol=1e-4, atol=1e-3
    )
    np.testing.assert_allclose(np.sort(hp), np.sort(dp), rtol=1e-5, atol=1e-6)


def test_decode_nms_batch_matches_per_image():
    from dfq_tpu.detection.device_nms import decode_nms_batch

    confs, locs = [], []
    for seed in (10, 11, 12):
        c, l, priors = _random_problem(seed)
        confs.append(c)
        locs.append(l)
    conf_b, loc_b = np.stack(confs), np.stack(locs)
    kw = dict(prob_threshold=0.1, iou_threshold=0.45,
              candidate_size=200, top_k=8)
    b, s, v = decode_nms_batch(conf_b, loc_b, priors, **kw)
    for i in range(3):
        bi, si, vi = decode_nms(confs[i], locs[i], priors, **kw)
        np.testing.assert_array_equal(np.asarray(v[i]), np.asarray(vi))
        np.testing.assert_allclose(
            np.asarray(b[i]), np.asarray(bi), rtol=1e-6, atol=1e-7
        )
        np.testing.assert_allclose(
            np.asarray(s[i]), np.asarray(si), rtol=1e-6, atol=1e-7
        )


def test_predict_on_device_wrapper_contract():
    conf, loc, priors = _random_problem(4)
    boxes, labels, probs = predict_on_device(
        conf, loc, priors, (375, 500),
        prob_threshold=0.05, iou_threshold=0.45, top_k=5,
    )
    assert boxes.shape[1] == 4 and len(labels) == len(probs) == len(boxes)
    # pixel-space: x within width, y within height (decoded boxes can
    # spill slightly outside [0,1], so allow a margin)
    if len(boxes):
        assert boxes[:, 0].max() <= 500 * 1.5 and boxes[:, 1].max() <= 375 * 1.5
        assert set(labels) <= set(range(1, conf.shape[1]))
