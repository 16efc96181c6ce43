"""Classification entry point — flag-compatible with the reference
``main_cls.py`` (``/root/reference/main_cls.py:23-41``), extended with
engine selection and artifact export.

Examples::

    python -m dfq_tpu.cli.run_cls --quantize --relu --equalize --correction
    python -m dfq_tpu.cli.run_cls --quantize --relu --equalize \
        --engine int8 --save-artifact out/mnv2_int8
    python -m dfq_tpu.cli.run_cls --resnet --quantize --correction \
        --checkpoint resnet18.pth --data-dir /data/imagenet/val
"""

from __future__ import annotations

import argparse
import json
import time


def get_argument():
    p = argparse.ArgumentParser()
    # reference flags (main_cls.py:23-41)
    p.add_argument("--quantize", action="store_true")
    p.add_argument("--equalize", action="store_true")
    p.add_argument("--distill_range", action="store_true")
    p.add_argument("--correction", action="store_true")
    p.add_argument("--absorption", action="store_true")
    p.add_argument("--relu", action="store_true")
    p.add_argument("--clip_weight", action="store_true")
    p.add_argument("--trainable", action="store_true",
                   help="per-forward weight fake-quant regime "
                        "(reference QuantConv2d, main_cls.py:33)")
    p.add_argument("--resnet", action="store_true")
    p.add_argument("--log", action="store_true")
    p.add_argument("--bits_weight", type=int, default=8)
    p.add_argument("--bits_activation", type=int, default=8)
    p.add_argument("--bits_bias", type=int, default=8)
    p.add_argument("--dis_batch_size", type=int, default=64)
    p.add_argument("--dis_num_batch", type=int, default=8)
    p.add_argument("--true_data", action="store_true",
                   help="calibrate ranges from real images in --data-dir "
                        "instead of distilled data (reference main_cls.py:96-114)")
    # framework extensions
    p.add_argument("--platform", type=str, default=None,
                   help="force jax platform (e.g. cpu); the axon plugin "
                        "overrides the JAX_PLATFORMS env var")
    p.add_argument("--engine", choices=["sim", "int8", "fused"], default="sim",
                   help="fake-quant simulation or true-int8 execution")
    p.add_argument("--checkpoint", type=str, default=None,
                   help="torch state_dict (.pth) to load")
    p.add_argument("--data-dir", type=str, default=None,
                   help="ImageNet val directory (folder-per-class)")
    p.add_argument("--limit", type=int, default=None,
                   help="max val images")
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--save-artifact", type=str, default=None)
    p.add_argument("--aot-batch", type=int, default=0,
                   help="also serialize the compiled fused forward for "
                        "this batch size into the artifact (cache-less "
                        "~0.1s cold start on matching hardware; "
                        "dfq_tpu.io.aot)")
    p.add_argument("--stream", action="store_true",
                   help="streaming eval: keep 2 batches in flight so "
                        "host decode+transfer overlap device compute")
    p.add_argument("--signed", action="store_true",
                   help="symmetric weight quant (Int8' regime)")
    return p.parse_args()


def build_model(args):
    import torch

    from dfq_tpu.models import (
        init_params,
        load_torch_state_dict,
        mobilenet_v2,
        resnet18,
    )

    graph = resnet18() if args.resnet else mobilenet_v2()
    if args.checkpoint:
        sd = torch.load(args.checkpoint, map_location="cpu", weights_only=False)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        params = load_torch_state_dict(graph, sd)
    else:
        print("WARNING: no --checkpoint given; using random weights")
        params = init_params(graph, seed=0, bn_stats="random")
    return graph, params


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
    from dfq_tpu.pipeline import QuantConfig, prepare

    graph, params = build_model(args)
    cfg = QuantConfig(
        quantize=args.quantize,
        relu=args.relu,
        equalize=args.equalize,
        absorption=args.absorption,
        correction=args.correction,
        clip_weight=args.clip_weight,
        distill_range=args.distill_range,
        trainable=args.trainable,
        bits_weight=args.bits_weight,
        bits_activation=args.bits_activation,
        bits_bias=args.bits_bias,
        signed=args.signed,
    )
    t0 = time.time()
    prep = prepare(graph, params, cfg)

    if args.distill_range and args.quantize:
        from dfq_tpu.calib import DistillConfig, calibrate_ranges, distill_data

        if args.true_data:
            if not args.data_dir:
                raise SystemExit("--true_data requires --data-dir")
            from dfq_tpu.data import imagenet_batches

            batches = [
                imgs
                for imgs, _ in imagenet_batches(
                    args.data_dir, args.dis_batch_size,
                    limit=args.dis_batch_size * args.dis_num_batch,
                )
            ]
        else:
            dcfg = DistillConfig(
                batch_size=args.dis_batch_size,
                num_batch=args.dis_num_batch,
                early_break_factor=1.2 if args.resnet else 0.5,
            )
            batches = distill_data(prep.graph, prep.params_fp, dcfg, verbose=True)
        prep.act_ranges = calibrate_ranges(prep.graph, prep.params, batches)

    print(f"pipeline: {time.time() - t0:.1f}s")

    if args.engine in ("int8", "fused") and args.quantize:
        if args.trainable:
            raise SystemExit("--trainable is a fake-quant regime; use --engine sim")
        from dfq_tpu.engine import execute_int8, lower_int8

        model = lower_int8(prep)
        if args.engine == "fused":
            from dfq_tpu.engine.int8_fused import execute_int8_fused

            fwd = jax.jit(lambda x: execute_int8_fused(model, prep.params, x))
        else:
            fwd = jax.jit(lambda x: execute_int8(model, prep.params, x))
        if args.save_artifact:
            from dfq_tpu.io import save_artifact

            residual = {
                k: v for k, v in prep.params.items() if k not in model.layers
            }
            save_artifact(args.save_artifact, model, residual)
            print(f"artifact saved to {args.save_artifact}")
            if args.aot_batch:
                # serialize the compiled fused forward into the
                # artifact: a fresh machine (same device kind + jax
                # version) cold-starts in ~0.1s with no compile cache
                from dfq_tpu.io.aot import save_aot_forward

                b = args.aot_batch
                xs = jnp.zeros((b, 224, 224, 3), jnp.float32)
                compiled = fwd.lower(xs).compile()
                save_aot_forward(args.save_artifact, compiled, b, 224)
                print(f"AOT executable (batch {b}) saved into the artifact")
    else:
        wb = cfg.bits_weight if (cfg.trainable and cfg.quantize) else None
        fwd = jax.jit(
            lambda x: execute(
                prep.graph,
                prep.params,
                x,
                act_ranges=prep.act_ranges,
                bits_act=cfg.bits_activation,
                weight_bits=wb,
                bias_bits=cfg.bits_bias,
            )
        )

    if args.data_dir:
        from dfq_tpu.data import imagenet_batches

        batches = imagenet_batches(args.data_dir, args.batch_size, limit=args.limit)
        correct = total = 0
        if args.stream:
            # streaming dispatch: keep batches in flight so host decode +
            # transfer overlap device compute (parallel/stream.py)
            from dfq_tpu.parallel.stream import stream_counters

            count = jax.jit(
                lambda lg, lb: jnp.sum((jnp.argmax(lg, -1) == lb).astype(jnp.int32))
            )
            correct, total = stream_counters(
                lambda imgs, labels: count(
                    fwd(jnp.asarray(imgs)), jnp.asarray(labels)
                ),
                batches,
            )
        else:
            for imgs, labels in batches:
                logits = np.asarray(fwd(jnp.asarray(imgs)))
                correct += int((logits.argmax(-1) == labels).sum())
                total += len(labels)
        acc = correct / max(total, 1)
        print(f"Acc: {acc}")
    else:
        x = jnp.asarray(
            np.random.default_rng(0).normal(0, 1, (8, 224, 224, 3)), jnp.float32
        )
        logits = np.asarray(fwd(x))
        acc = None
        print(f"smoke eval ok: logits shape {logits.shape}, "
              f"finite={bool(np.isfinite(logits).all())}")

    if args.log:
        with open("cls_result.txt", "a+") as f:
            f.write(json.dumps({
                "resnet": args.resnet, "quant": args.quantize,
                "relu": args.relu, "equalize": args.equalize,
                "absorption": args.absorption, "correction": args.correction,
                "clip": args.clip_weight, "distill_range": args.distill_range,
                "engine": args.engine, "acc": acc,
            }) + "\n")


if __name__ == "__main__":
    main()
