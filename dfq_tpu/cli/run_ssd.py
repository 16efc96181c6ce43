"""Detection entry point — flag-compatible with the reference
``main_ssd.py`` (MobileNetV2 SSD-Lite, Pascal VOC mAP).

Examples::

    python -m dfq_tpu.cli.run_ssd --quantize --relu --correction
    python -m dfq_tpu.cli.run_ssd --quantize --relu --equalize \
        --checkpoint mb2-ssd-lite.pth --data-dir /data/VOC2007 --2007_metric
"""

from __future__ import annotations

import argparse
import json
import time
from collections import defaultdict


def get_argument():
    p = argparse.ArgumentParser()
    p.add_argument("--quantize", action="store_true")
    p.add_argument("--equalize", action="store_true")
    p.add_argument("--distill_range", action="store_true")
    p.add_argument("--correction", action="store_true")
    p.add_argument("--absorption", action="store_true")
    p.add_argument("--relu", action="store_true")
    p.add_argument("--clip_weight", action="store_true")
    p.add_argument("--log", action="store_true")
    p.add_argument("--bits_weight", type=int, default=8)
    p.add_argument("--bits_activation", type=int, default=8)
    p.add_argument("--bits_bias", type=int, default=8)
    p.add_argument("--dis_batch_size", type=int, default=16)
    p.add_argument("--dis_num_batch", type=int, default=8)
    p.add_argument("--platform", type=str, default=None,
                   help="force jax platform (e.g. cpu); the axon plugin "
                        "overrides the JAX_PLATFORMS env var")
    p.add_argument("--engine", choices=["sim", "int8", "fused"], default="sim")
    p.add_argument("--save-artifact", type=str, default=None,
                   help="write the lowered int8 model as a deployable "
                        "artifact directory (io.artifact)")
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--data-dir", type=str, default=None,
                   help="VOC root (Annotations/JPEGImages/ImageSets)")
    p.add_argument("--split", type=str, default="test")
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--2007_metric", dest="metric_2007", action="store_true")
    p.add_argument("--device-nms", action="store_true",
                   help="run box decode + per-class hard-NMS on the "
                        "accelerator (device_nms.decode_nms) instead of "
                        "host numpy; same keep-set, ~75x less fetched")
    p.add_argument("--iou_threshold", type=float, default=0.5)
    return p.parse_args()


def eval_map(dataset, predictor, use_2007_metric, iou_threshold, limit=None):
    """VOC mAP evaluation (reference ``main_ssd.py:60-141,306-337``)."""
    import numpy as np

    from dfq_tpu.detection import box_utils
    from dfq_tpu.metrics import (
        compute_average_precision,
        compute_voc2007_average_precision,
    )

    n = len(dataset) if limit is None else min(limit, len(dataset))
    gt_by_class = defaultdict(dict)  # class -> image_id -> (boxes, difficult)
    det_by_class = defaultdict(list)  # class -> [(image_id, score, box)]
    for i in range(n):
        image_id, (gt_boxes, gt_labels, is_difficult) = dataset.get_annotation(i)
        for cls in np.unique(gt_labels):
            mask = gt_labels == cls
            gt_by_class[int(cls)][image_id] = (gt_boxes[mask], is_difficult[mask])
        image = dataset.get_image(i)
        boxes, labels, probs = predictor.predict(image)
        for b, l, s in zip(boxes, labels, probs):
            det_by_class[int(l)].append((image_id, float(s), b))

    aps = []
    for cls in range(1, len(dataset.class_names)):
        gts = gt_by_class.get(cls, {})
        num_true = sum(
            int((1 - d).sum()) for _, d in gts.values()
        )
        dets = sorted(det_by_class.get(cls, []), key=lambda t: -t[1])
        if num_true == 0 or not dets:
            if num_true > 0:
                aps.append(0.0)
            continue
        matched = set()
        tp = np.zeros(len(dets))
        fp = np.zeros(len(dets))
        for di, (image_id, score, box) in enumerate(dets):
            if image_id not in gts:
                fp[di] = 1
                continue
            gt_boxes, difficult = gts[image_id]
            ious = box_utils.iou_of(gt_boxes, box[None, :])
            best = int(np.argmax(ious))
            if ious[best] >= iou_threshold:
                if difficult[best]:
                    continue  # difficult boxes are ignored
                key = (image_id, best)
                if key not in matched:
                    matched.add(key)
                    tp[di] = 1
                else:
                    fp[di] = 1
            else:
                fp[di] = 1
        tp_c = np.cumsum(tp)
        fp_c = np.cumsum(fp)
        precision = tp_c / np.maximum(tp_c + fp_c, 1e-12)
        recall = tp_c / num_true
        if use_2007_metric:
            aps.append(compute_voc2007_average_precision(precision, recall))
        else:
            aps.append(compute_average_precision(precision, recall))
    return float(np.mean(aps)) if aps else 0.0, aps


def main():
    args = get_argument()
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from dfq_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp
    import numpy as np

    from dfq_tpu.detection.predictor import Predictor
    from dfq_tpu.graph.executor import execute
    from dfq_tpu.models import init_params, mobilenet_v2_ssd_lite
    from dfq_tpu.models.common import load_torch_state_dict
    from dfq_tpu.models.ssd import SSDConfig, quantized_priors
    from dfq_tpu.pipeline import QuantConfig, prepare

    graph = mobilenet_v2_ssd_lite(num_classes=21)
    config = SSDConfig()
    if args.checkpoint:
        import torch

        sd = torch.load(args.checkpoint, map_location="cpu", weights_only=False)
        params = load_torch_state_dict(graph, sd)
    else:
        print("WARNING: no --checkpoint given; using random weights")
        params = init_params(graph, seed=0, bn_stats="random")

    cfg = QuantConfig(
        quantize=args.quantize, relu=args.relu, equalize=args.equalize,
        absorption=args.absorption, correction=args.correction,
        clip_weight=args.clip_weight, distill_range=args.distill_range,
        bits_weight=args.bits_weight, bits_activation=args.bits_activation,
        bits_bias=args.bits_bias, delete_single=True, is_detection=True,
    )
    t0 = time.time()
    prep = prepare(graph, params, cfg)

    if args.distill_range and args.quantize:
        from dfq_tpu.calib import DistillConfig, calibrate_ranges, distill_data

        dcfg = DistillConfig(
            batch_size=args.dis_batch_size, num_batch=args.dis_num_batch,
            image_size=(300, 300), value_range=(-1.0, 1.0), max_value=1.0,
            early_break_factor=0.04,
        )
        batches = distill_data(prep.graph, prep.params_fp, dcfg, verbose=True)
        prep.act_ranges = calibrate_ranges(
            prep.graph, prep.params, batches, is_detection=True
        )
    print(f"pipeline: {time.time() - t0:.1f}s")

    if args.engine in ("int8", "fused") and args.quantize:
        from dfq_tpu.engine import execute_int8, lower_int8

        model = lower_int8(prep)
        if args.save_artifact:
            from dfq_tpu.io import save_artifact

            residual = {
                k: v for k, v in prep.params.items() if k not in model.layers
            }
            save_artifact(args.save_artifact, model, residual)
            print(f"artifact saved to {args.save_artifact}")
        if args.engine == "fused":
            from dfq_tpu.engine.int8_fused import execute_int8_fused

            fwd = jax.jit(lambda x: execute_int8_fused(model, prep.params, x))
        else:
            fwd = jax.jit(lambda x: execute_int8(model, prep.params, x))
    else:
        fwd = jax.jit(
            lambda x: execute(
                prep.graph, prep.params, x, act_ranges=prep.act_ranges,
                bits_act=cfg.bits_activation,
            )
        )

    # the reference fake-quantizes the prior boxes when quantizing
    # (mobilenet_v2_ssd_lite.py:57-59)
    priors = quantized_priors(config) if args.quantize else config.priors
    predictor = Predictor(
        lambda x: fwd(jnp.asarray(x)), config, priors=priors,
        device_nms=args.device_nms,
    )

    mean_ap = None
    if args.data_dir:
        from dfq_tpu.data.voc import VOCDetection

        ds = VOCDetection(args.data_dir, split_file=args.split)
        mean_ap, aps = eval_map(
            ds, predictor, args.metric_2007, args.iou_threshold, args.limit
        )
        print(f"mAP: {mean_ap}")
        for name, ap in zip(ds.class_names[1:], aps):
            print(f"  {name}: {ap:.4f}")
    else:
        x = jnp.ones((1, 300, 300, 3))
        conf, loc = fwd(x)
        print(
            f"smoke eval ok: conf {conf.shape}, loc {loc.shape}, "
            f"finite={bool(np.isfinite(np.asarray(conf)).all())}"
        )

    if args.log:
        with open("ssd_result.txt", "a+") as f:
            f.write(json.dumps({
                "quant": args.quantize, "relu": args.relu,
                "equalize": args.equalize, "absorption": args.absorption,
                "correction": args.correction, "clip": args.clip_weight,
                "distill_range": args.distill_range, "engine": args.engine,
                "2007": args.metric_2007, "mAP": mean_ap,
            }) + "\n")


if __name__ == "__main__":
    main()
