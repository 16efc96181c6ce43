"""Same-session A/B: MobileNetV1-SSD @300 with the dense-dw spatial gate
at 128 (current auto policy => grouped dw at 150^2) vs 160 (dense-diag
rewrite covers the 150^2 dw32).

Motivation: the r5 barrier trace (PROF_MB1_r05) shows ``base_net.1.0``
(dw C=32 @150^2 s1 b8) running at 1.5 GB/s = 7.84 ms of the 9.07 ms
step — the same grouped-dw config collapse the engine already guards
against at small spatial sizes — while mb2-ssd-lite's identically-shaped
first dw does NOT collapse at b8 (PROF_SSD_r04 total 1.77 ms). The
collapse is context-dependent inside XLA, not shape-predictable.
"""

import json
import sys

sys.path.insert(0, ".")

import bench


def main():
    import argparse

    import jax
    import jax.numpy as jnp
    import numpy as np

    import dfq_tpu.models as M
    from dfq_tpu.calib import DistillConfig, calibrate_ranges
    from dfq_tpu.calib.distill import init_random_batch
    from dfq_tpu.engine import lower_int8
    from dfq_tpu.engine.int8_fused import execute_int8_fused
    from dfq_tpu.models import init_params
    from dfq_tpu.pipeline import QuantConfig, prepare

    ap = argparse.ArgumentParser()
    ap.add_argument("--builder", type=str, default="mobilenet_v1_ssd")
    ap.add_argument("--batches", type=int, nargs="+", default=[1, 8, 32])
    args = ap.parse_args()
    bench.enable_compile_cache()
    bench.tunnel_warmup()

    g = getattr(M, args.builder)(num_classes=21)
    p = init_params(g, seed=0, bn_stats="random")
    prep = prepare(g, p, QuantConfig(quantize=True, relu=True, bits_bias=16,
                                     is_detection=True, distill_range=True))
    dc = DistillConfig(batch_size=4, image_size=(300, 300), num_batch=1)
    prep.act_ranges = calibrate_ranges(
        prep.graph, prep.params,
        [init_random_batch(np.random.default_rng(0), dc)])
    model = lower_int8(prep)

    results = {}
    for b in args.batches:
        x = jax.jit(
            lambda: jax.random.uniform(
                jax.random.PRNGKey(0), (b, 300, 300, 3), jnp.float32,
                minval=-1.0, maxval=1.0,
            )
        )()
        row = {}
        for label, max_h in (("auto_gate", "auto"), ("dense_h160", 160)):
            def fwd(v, _h=max_h):
                conf, loc = execute_int8_fused(
                    model, prep.params, v, dw_dense_max_ch=32,
                    dw_dense_max_h=_h)
                return jnp.stack(
                    [jnp.sum(conf.astype(jnp.float32)), jnp.sum(loc)])

            n_small, n_big = bench.loop_counts(b)
            t = bench.step_time(fwd, x, n_small=n_small, n_big=n_big,
                                tag=f"{args.builder}_b{b}_{label}")
            row[label] = {"ms": round(t * 1e3, 3),
                          "img_per_s": round(b / t, 1)}
            print(f"# b{b} {label}: {t*1e3:.3f} ms = {b/t:.0f} img/s",
                  file=sys.stderr)
        row["dense_speedup"] = round(
            row["auto_gate"]["ms"] / row["dense_h160"]["ms"], 3)
        results[f"b{b}"] = row
    print(json.dumps({
        "experiment": f"{args.builder}@300: dense-dw gate A/B after the "
                      "PROF_MB1_r05 collapse finding (base_net.1.0 dw32 "
                      "@150^2 = 7.84 of 9.07 ms at 1.5 GB/s)",
        "results": results,
    }, indent=1))


if __name__ == "__main__":
    main()
