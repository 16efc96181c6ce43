"""First throughput rows for every SSD variant the reference ships
(``vision/ssd/``: mb2-lite, mb1, mb1-lite, squeezenet-lite, fpn-mb1,
vgg16) — fused int8 engine @300, b=8, one session. The reference
publishes no detection throughput numbers at all."""

import json
import sys

sys.path.insert(0, ".")

import bench

BUILDERS = [
    "mobilenet_v2_ssd_lite",
    "mobilenet_v1_ssd",
    "mobilenet_v1_ssd_lite",
    "squeezenet_ssd_lite",
    "fpn_mobilenet_v1_ssd",
    "vgg16_ssd",
]


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
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--only", type=str, default=None)
    ap.add_argument("--autotune", action="store_true",
                    help="race dw policies per model (engine/autotune.py) "
                         "and report the winner's throughput — the "
                         "serve-time flow; without it, the static auto "
                         "policy")
    args = ap.parse_args()
    bench.enable_compile_cache()
    bench.tunnel_warmup()
    b = args.batch

    results = {}
    for name in BUILDERS:
        if args.only and args.only not in name:
            continue
        try:
            g = getattr(M, name)(num_classes=21)
            p = init_params(g, seed=0, bn_stats="random")
            try:
                prep = prepare(g, p, QuantConfig(quantize=True, relu=True,
                                                 bits_bias=16,
                                                 is_detection=True))
                route = "bn_ranges"
            except (ValueError, AssertionError):
                # BN-less conv stacks (vgg16 / mb1 extras / squeezenet):
                # BN-derived ranges are structurally impossible — the
                # reference hits the same wall (layer_transform.py:330)
                # — so use the calibrated-ranges route (+DR flow)
                import numpy as np

                from dfq_tpu.calib import DistillConfig, calibrate_ranges
                from dfq_tpu.calib.distill import init_random_batch

                prep = prepare(g, p, QuantConfig(
                    quantize=True, relu=True, bits_bias=16,
                    is_detection=True, distill_range=True))
                dc = DistillConfig(batch_size=4, image_size=(300, 300),
                                   num_batch=1)
                prep.act_ranges = calibrate_ranges(
                    prep.graph, prep.params,
                    [init_random_batch(np.random.default_rng(0), dc)])
                route = "calibrated_ranges"
            model = lower_int8(prep)
            x = jax.jit(
                lambda: jax.random.uniform(
                    jax.random.PRNGKey(0), (b, 300, 300, 3), jnp.float32,
                    minval=-1.0, maxval=1.0,
                )
            )()

            policy = {}
            tuned = None
            if args.autotune:
                from dfq_tpu.engine.autotune import autotune_dw_policy

                policy, rep = autotune_dw_policy(
                    model, prep.params, x,
                    cache_path=".autotune_cache.json")
                tuned = rep["label"]
                print(f"# {name}: autotuned policy = {tuned}",
                      file=sys.stderr)

            def fwd(v):
                conf, loc = execute_int8_fused(model, prep.params, v,
                                               **policy)
                return jnp.stack(
                    [jnp.sum(conf.astype(jnp.float32)), jnp.sum(loc)]
                )

            n_small, n_big = bench.loop_counts(b)
            t = bench.step_time(fwd, x, n_small=n_small, n_big=n_big,
                                tag=name)
            results[name] = {"ms_per_step": round(t * 1e3, 3),
                             "img_per_s": round(b / t, 1),
                             "range_route": route}
            if tuned is not None:
                results[name]["dw_policy"] = tuned
            print(f"# {name}: {t*1e3:.3f} ms = {b/t:.0f} img/s",
                  file=sys.stderr)
        except Exception as e:
            results[name] = {"error": str(e)[:200]}
            print(f"# {name}: ERROR {e}", file=sys.stderr)
    print(json.dumps({
        "experiment": f"SSD variants @300 b{b}, fused int8 engine, one "
                      "session (reference has no detection throughput "
                      "numbers)",
        "results": results,
    }))


if __name__ == "__main__":
    main()
