"""Same-session A/B of the dense-k3 lowering levers on the non-MNV2
DeepLab backbones (Xception / DRN / ResNet-101 @513).

Motivation: the Xception barrier trace (PROF_XC_r05) shows the three
ASPP atrous convs (k3 d6/12/18, Cin=2048 — lane-ALIGNED, so chpad does
not apply) at 43-46 TOPS = 2.7 ms of the 22 ms b4 step; DRN is nothing
but dilated dense k3. The shift9/im2col matmul lowering was a measured
loss on the 129^2 post-chpad decoder conv (IM2COL_r05.json) but these
33^2 dilated shapes are a different class.
"""

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
    ap.add_argument("--builder", type=str, default="deeplab_xception")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--min-ch", type=int, default=1024,
                    help="k3_matmul_min_ch: 1024 hits only the ASPP "
                         "Cin=2048 convs on Xception")
    ap.add_argument("--skip", type=str, default="",
                    help="comma-separated arm labels to skip")
    args = ap.parse_args()
    bench.enable_compile_cache()
    bench.tunnel_warmup()
    b = args.batch

    g = getattr(M, args.builder)(input_size=513)
    p = init_params(g, seed=0, bn_stats="random")
    prep = prepare(g, p, QuantConfig(quantize=True, relu=True, bits_bias=16))
    model = lower_int8(prep)
    x = jax.jit(
        lambda: jax.random.normal(
            jax.random.PRNGKey(0), (b, 513, 513, 3), jnp.float32)
    )()

    arms = {
        "baseline": {"k3_matmul": "off"},
        "auto_dilated": {"k3_matmul": "auto"},
        "shift9": {"k3_matmul": "shift9", "k3_matmul_min_ch": args.min_ch},
        "im2col": {"k3_matmul": "im2col", "k3_matmul_min_ch": args.min_ch},
    }
    if args.skip:
        for k in args.skip.split(","):
            arms.pop(k, None)
    results = {}
    for label, pol in arms.items():
        def fwd(v, _pol=pol):
            out = execute_int8_fused(model, prep.params, v, **_pol)
            return jnp.sum(out.astype(jnp.float32))

        # steps here are 5-25 ms: n=10/60 gives >=250 ms of slope signal
        # while keeping the 6 heavyweight Xception compiles (~90 s each)
        # inside one session
        t = bench.step_time(fwd, x, n_small=10, n_big=60,
                            tag=f"{args.builder}_{label}")
        results[label] = {"ms": round(t * 1e3, 3),
                          "img_per_s": round(b / t, 1)}
        print(f"# {label}: {t*1e3:.3f} ms = {b/t:.0f} img/s",
              file=sys.stderr)
    for label in results:
        if label != "baseline" and "baseline" in results:
            results[label]["speedup"] = round(
                results["baseline"]["ms"] / results[label]["ms"], 3)
    print(json.dumps({
        "experiment": f"{args.builder}@513 b{b}: dense-k3 matmul lowering "
                      f"A/B (k3_matmul_min_ch={args.min_ch}) after "
                      "PROF_XC_r05 showed the ASPP atrous convs at 43-46 "
                      "TOPS",
        "results": results,
    }, indent=1))


if __name__ == "__main__":
    main()
