"""Deployment conversion — the reference's ``convert_ncnn.py`` analog.

Runs the DFQ pipeline in the ncnn-compatible regime (symmetric signed
weights, 32-bit bias — the Int8' rows, ``convert_ncnn.py:29,109,115``),
lowers to the int8 engine, and exports BOTH artifact formats:

- the JAX artifact directory (``--out``), and
- the native runtime pair ``<out>_native.dfqparam/.dfqbin`` consumed by
  ``native/`` (libdfqrt + dfq_infer_cls) — the ncnn
  ``model_int8.param/bin`` + ``.table`` equivalent.

Optionally validates the exported native model against the JAX engine
on random inputs (``--validate``).

Example::

    python -m dfq_tpu.cli.convert --relu --equalize --out out/mnv2 \
        --checkpoint mobilenetv2.pth --validate
"""

from __future__ import annotations

import argparse


def get_argument():
    p = argparse.ArgumentParser()
    p.add_argument("--resnet", action="store_true")
    p.add_argument("--equalize", action="store_true")
    p.add_argument("--correction", action="store_true")
    p.add_argument("--absorption", action="store_true")
    p.add_argument("--relu", action="store_true")
    p.add_argument("--clip_weight", action="store_true")
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--validate", action="store_true")
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

    from dfq_tpu.engine import execute_int8, lower_int8
    from dfq_tpu.io import save_artifact
    from dfq_tpu.io.native_export import save_native_artifact
    from dfq_tpu.models import (
        init_params,
        load_torch_state_dict,
        mobilenet_v2,
        resnet18,
    )
    from dfq_tpu.pipeline import QuantConfig, prepare

    graph = resnet18() if args.resnet else mobilenet_v2()
    if args.checkpoint:
        import torch

        sd = torch.load(args.checkpoint, map_location="cpu", weights_only=False)
        params = load_torch_state_dict(graph, sd)
    else:
        print("WARNING: no --checkpoint given; using random weights")
        params = init_params(graph, seed=0, bn_stats="random")

    # ncnn-compatible regime: symmetric signed weights, 32-bit bias
    cfg = QuantConfig(
        quantize=True, relu=args.relu, equalize=args.equalize,
        absorption=args.absorption, correction=args.correction,
        clip_weight=args.clip_weight, signed=True, bits_bias=32,
    )
    prep = prepare(graph, params, cfg)
    model = lower_int8(prep)
    residual = {k: v for k, v in prep.params.items() if k not in model.layers}

    save_artifact(args.out, model, residual)
    save_native_artifact(args.out + "_native", model, residual)
    print(f"exported {args.out}/ and {args.out}_native.dfqparam/.dfqbin")

    if args.validate:
        from dfq_tpu.engine.native import NativeModel

        nm = NativeModel(args.out + "_native")
        x = np.clip(
            np.random.default_rng(0).normal(0, 1, (2, 224, 224, 3)),
            -2.117, 2.64,
        ).astype(np.float32)
        ref = np.asarray(
            jax.jit(lambda v: execute_int8(model, prep.params, v))(jnp.asarray(x))
        )
        out = nm.forward(x)[0]
        agree = float((out.argmax(-1) == ref.argmax(-1)).mean())
        print(
            f"native-vs-jax: top1 agreement {agree}, "
            f"max |diff| {np.abs(out - ref).max():.4g}"
        )
        assert agree == 1.0, "native runtime disagrees with JAX engine"


if __name__ == "__main__":
    main()
