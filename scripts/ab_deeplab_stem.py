"""Same-session DeepLab-MNV2@513 b8 A/B: stem_s2d and dw-dense policy
at the segmentation resolution.

The chpad-on trace (PROF_DEEPLAB_r05) shows the new top costs are the
513^2 stem (1.08 ms at 21.6 GB/s — the small-batch conv-config
collapse) and the b8 dw rows. The engine's auto policies were
calibrated at 224^2 (s2d off below b64; dense-dw on for C<=32 at
b<=8); at 513^2 the stem has 21x the rows of the b8/224 case it was
measured at, so re-measure both knobs at this shape."""

import json
import sys

sys.path.insert(0, ".")

import bench


def main():
    import jax
    import jax.numpy as jnp

    from dfq_tpu.engine import lower_int8
    from dfq_tpu.engine.int8_fused import execute_int8_fused
    from dfq_tpu.models import deeplab_mobilenet_v2, init_params
    from dfq_tpu.pipeline import QuantConfig, prepare

    bench.enable_compile_cache()
    bench.tunnel_warmup()
    g = deeplab_mobilenet_v2(input_size=513)
    p = init_params(g, seed=0, bn_stats="random")
    prep = prepare(g, p, QuantConfig(quantize=True, relu=True, bits_bias=16))
    model = lower_int8(prep)
    b = 8
    x = jax.jit(
        lambda: jax.random.normal(
            jax.random.PRNGKey(0), (b, 513, 513, 3), jnp.float32
        )
    )()
    configs = {
        "auto(default)": {},
        "stem_s2d": {"stem_s2d": True},
        "dw_dense_off": {"dw_dense_max_ch": 0},
        "dw_dense_96": {"dw_dense_max_ch": 96},
        "stem_s2d+dw96": {"stem_s2d": True, "dw_dense_max_ch": 96},
    }
    results = {}
    for name, kw in configs.items():
        t = bench.step_time(
            lambda v, kw=kw: execute_int8_fused(model, prep.params, v, **kw),
            x, n_small=1, n_big=5, tag=f"deeplab513 {name}",
        )
        results[name] = {"ms": round(t * 1e3, 2), "img_per_s": round(b / t, 1)}
        print(f"# {name}: {t*1e3:.2f} ms = {b/t:.0f} img/s", file=sys.stderr)
    base = results["auto(default)"]["ms"]
    for name, r in results.items():
        r["speedup_vs_auto"] = round(base / r["ms"], 3)
    print(json.dumps({
        "experiment": "DeepLab-MNV2@513 b8: stem_s2d / dw-dense policy at "
                      "segmentation resolution (same session)",
        "results": results,
    }))


if __name__ == "__main__":
    main()
