"""ZeroQ standalone pipeline — the reference's second behavioral oracle
(``/root/reference/ZeroQ/uniform_test.py:60-96``): distill calibration
data from BN statistics of the UNfolded model, set activation ranges by
running the distilled batches (QuantAct running-min/max), quantize
weights per-output-channel, evaluate W8A8.

Examples::

    python -m dfq_tpu.cli.run_zeroq --model mobilenet_v2
    python -m dfq_tpu.cli.run_zeroq --model resnet18 \
        --checkpoint r18.pth --data-dir /data/imagenet/val
"""

from __future__ import annotations

import argparse


def get_argument():
    p = argparse.ArgumentParser()
    p.add_argument("--model", choices=["mobilenet_v2", "resnet18"],
                   default="mobilenet_v2")
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--data-dir", type=str, default=None)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--bits_weight", type=int, default=8)
    p.add_argument("--bits_activation", type=int, default=8)
    p.add_argument("--dis_batch_size", type=int, default=32)
    p.add_argument("--dis_num_batch", type=int, default=4)
    p.add_argument("--dis_max_iters", type=int, default=1000,
                   help="cap on distillation Adam steps (smoke/testing)")
    p.add_argument("--image-size", type=int, default=224,
                   help="distillation + smoke-eval image size")
    p.add_argument("--platform", type=str, default=None)
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

    from dfq_tpu.calib import DistillConfig, calibrate_ranges, distill_data
    from dfq_tpu.graph.executor import execute
    from dfq_tpu.models import (
        init_params,
        load_torch_state_dict,
        mobilenet_v2,
        resnet18,
    )
    from dfq_tpu.passes import fold_batchnorm, quantize_layer_weights

    graph = mobilenet_v2() if args.model == "mobilenet_v2" else resnet18()
    if args.checkpoint:
        import torch

        sd = torch.load(args.checkpoint, map_location="cpu", weights_only=False)
        params = load_torch_state_dict(graph, sd)
    else:
        print("WARNING: no --checkpoint given; using random weights")
        params = init_params(graph, seed=0, bn_stats="random")

    # ZeroQ distills against the raw (unfolded) BN statistics
    # (distill_data.py:130-142 with bn_merged=False)
    dcfg = DistillConfig(
        batch_size=args.dis_batch_size, num_batch=args.dis_num_batch,
        image_size=(args.image_size, args.image_size),
        early_break_factor=1.0, max_iters=args.dis_max_iters,
    )
    batches = distill_data(graph, params, dcfg, verbose=True)

    # fold BN for inference, quantize weights per-output-channel
    # (ZeroQ quant_modules.py:120-127), calibrate activation ranges by
    # running the distilled data (train_utils.py:51 'update' phase)
    gf, pf = fold_batchnorm(graph, params)
    pq = quantize_layer_weights(
        gf, pf, bits_weight=args.bits_weight, bits_bias=32, per_channel=True
    )
    act_ranges = calibrate_ranges(gf, pq, batches, bits_act=args.bits_activation)

    fwd = jax.jit(
        lambda x: execute(
            gf, pq, x, act_ranges=act_ranges, bits_act=args.bits_activation
        )
    )

    if args.data_dir:
        from dfq_tpu.data import imagenet_batches

        correct = total = 0
        for imgs, labels in imagenet_batches(
            args.data_dir, args.batch_size, limit=args.limit
        ):
            logits = np.asarray(fwd(jnp.asarray(imgs)))
            correct += int((logits.argmax(-1) == labels).sum())
            total += len(labels)
        print(f"Acc: {correct / max(total, 1)}")
    else:
        x = jnp.asarray(
            np.random.default_rng(0).normal(
                0, 1, (8, args.image_size, args.image_size, 3)
            ),
            jnp.float32,
        )
        logits = np.asarray(fwd(x))
        print(f"smoke eval ok: logits {logits.shape}, "
              f"finite={bool(np.isfinite(logits).all())}")


if __name__ == "__main__":
    main()
