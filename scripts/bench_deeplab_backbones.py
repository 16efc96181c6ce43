"""First throughput rows for the non-MNV2 DeepLab backbones the
reference ships (ResNet-101, Xception, DRN-D-54 —
``modeling/segmentation/backbone/``): fused int8 engine @513, one
session. The reference publishes no segmentation throughput for any of
them. chpad_k3 fires on each decoder's Cin=304 conv (and the stems)."""

import json
import sys

sys.path.insert(0, ".")

import bench


def main():
    import argparse

    import jax
    import jax.numpy as jnp

    import dfq_tpu.models as M
    from dfq_tpu.engine import lower_int8
    from dfq_tpu.engine.int8_fused import execute_int8_fused
    from dfq_tpu.models import init_params
    from dfq_tpu.pipeline import QuantConfig, prepare

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--only", type=str, default=None)
    args = ap.parse_args()
    bench.enable_compile_cache()
    bench.tunnel_warmup()
    b = args.batch

    results = {}
    for name in ("deeplab_mobilenet_v2", "deeplab_resnet101",
                 "deeplab_xception", "deeplab_drn"):
        if args.only and args.only not in name:
            continue
        builder = getattr(M, name, None)
        if builder is None:
            results[name] = {"error": "builder missing"}
            continue
        g = builder(input_size=513)
        p = init_params(g, seed=0, bn_stats="random")
        prep = prepare(g, p, QuantConfig(quantize=True, relu=True,
                                         bits_bias=16))
        model = lower_int8(prep)
        x = jax.jit(
            lambda: jax.random.normal(
                jax.random.PRNGKey(0), (b, 513, 513, 3), jnp.float32
            )
        )()
        # n=10/60: steps are 3-22 ms, so the 50-iteration delta carries
        # >= 150 ms of slope signal — n=1/5 (the r05 first sweep) left
        # the slope inside the tunnel's ~50 ms RTT jitter
        t = bench.step_time(
            lambda v: execute_int8_fused(model, prep.params, v),
            x, n_small=10, n_big=60, tag=name,
        )
        results[name] = {"ms_per_step": round(t * 1e3, 2),
                         "img_per_s": round(b / t, 1)}
        print(f"# {name}: {t*1e3:.2f} ms = {b/t:.1f} img/s", file=sys.stderr)
    print(json.dumps({
        "experiment": f"DeepLab backbones @513 b{b}, fused int8 engine, "
                      "one session (reference has no segmentation "
                      "throughput numbers at all)",
        "results": results,
    }))


if __name__ == "__main__":
    main()
