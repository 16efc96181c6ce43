"""Segmentation entry point — flag-compatible with the reference
``main_seg.py`` (DeepLab-v3+ MobileNetV2, Pascal VOC mIOU).

Examples::

    python -m dfq_tpu.cli.run_seg --quantize --relu --equalize --correction
    python -m dfq_tpu.cli.run_seg --quantize --relu --equalize \
        --checkpoint deeplab-mobilenet.pth.tar --data-dir /data/VOC2012
"""

from __future__ import annotations

import argparse
import json
import time


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
                   help="VOC2012 root (JPEGImages/SegmentationClass/...)")
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--crop-size", type=int, default=513)
    return p.parse_args()


def main():
    args = get_argument()
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from dfq_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp
    import numpy as np

    from dfq_tpu.graph.executor import execute
    from dfq_tpu.models import deeplab_mobilenet_v2, init_params
    from dfq_tpu.models.common import load_torch_state_dict
    from dfq_tpu.pipeline import QuantConfig, prepare

    graph = deeplab_mobilenet_v2(input_size=args.crop_size)
    if args.checkpoint:
        import torch

        sd = torch.load(args.checkpoint, map_location="cpu", weights_only=False)
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        params = load_torch_state_dict(graph, sd)
    else:
        print("WARNING: no --checkpoint given; using random weights")
        params = init_params(graph, seed=0, bn_stats="random")

    cfg = QuantConfig(
        quantize=args.quantize, relu=args.relu, equalize=args.equalize,
        absorption=args.absorption, correction=args.correction,
        clip_weight=args.clip_weight, distill_range=args.distill_range,
        bits_weight=args.bits_weight, bits_activation=args.bits_activation,
        bits_bias=args.bits_bias,
    )
    t0 = time.time()
    prep = prepare(graph, params, cfg)

    if args.distill_range and args.quantize:
        from dfq_tpu.calib import DistillConfig, calibrate_ranges, distill_data

        dcfg = DistillConfig(
            batch_size=args.dis_batch_size, num_batch=args.dis_num_batch,
            image_size=(args.crop_size, args.crop_size),
            early_break_factor=0.2,
        )
        batches = distill_data(prep.graph, prep.params_fp, dcfg, verbose=True)
        prep.act_ranges = calibrate_ranges(prep.graph, prep.params, batches)
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

    miou = None
    if args.data_dir:
        from dfq_tpu.data.voc import VOCSegmentation
        from dfq_tpu.metrics import SegEvaluator

        ds = VOCSegmentation(args.data_dir, crop_size=args.crop_size)
        evaluator = SegEvaluator(ds.NUM_CLASSES)
        # argmax ON device: fetching class ids (H*W bytes) instead of
        # full logits (H*W*21*4 bytes) cuts the device->host boundary
        # ~84x (22MB -> 263KB per 513^2 image); same tie-breaking
        # (first max) as np.argmax
        pred_fn = jax.jit(
            lambda x: jnp.argmax(fwd(x), axis=-1).astype(jnp.uint8)
        )
        seen = 0
        for imgs, targets in ds.batches(args.batch_size):
            pred = np.asarray(pred_fn(jnp.asarray(imgs)))
            evaluator.add_batch(targets, pred)
            seen += len(imgs)
            if args.limit and seen >= args.limit:
                break
        miou = evaluator.mean_iou()
        print(f"mIOU: {miou}, pixel acc: {evaluator.pixel_accuracy()}")
    else:
        x = jnp.ones((1, args.crop_size, args.crop_size, 3))
        out = np.asarray(fwd(x))
        print(f"smoke eval ok: output {out.shape}, finite={bool(np.isfinite(out).all())}")

    if args.log:
        with open("seg_result.txt", "a+") as f:
            f.write(json.dumps({
                "quant": args.quantize, "relu": args.relu,
                "equalize": args.equalize, "absorption": args.absorption,
                "correction": args.correction, "clip": args.clip_weight,
                "distill_range": args.distill_range, "engine": args.engine,
                "miou": miou,
            }) + "\n")


if __name__ == "__main__":
    main()
