"""Same-session model-level A/B of dense-k3 channel padding (chpad_k3)
on DeepLab-MNV2 @513 — the workload whose dominator conv
(decoder.last_conv.0, Cin=304, 2.38 ms = 28% of the b8 step in
PROF_DEEPLAB_r04.json) the kernel-level probe measured at 3.24x
(CHPAD_r05.json)."""

import json
import sys

sys.path.insert(0, ".")

import bench


def main():
    import argparse

    import jax
    import jax.numpy as jnp

    from dfq_tpu.engine import lower_int8
    from dfq_tpu.engine.int8_fused import execute_int8_fused
    from dfq_tpu.models import deeplab_mobilenet_v2, init_params
    from dfq_tpu.pipeline import QuantConfig, prepare

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()
    bench.enable_compile_cache()
    bench.tunnel_warmup()

    g = deeplab_mobilenet_v2(input_size=513)
    p = init_params(g, seed=0, bn_stats="random")
    prep = prepare(g, p, QuantConfig(quantize=True, relu=True, bits_bias=16))
    model = lower_int8(prep)
    b = args.batch
    x = jax.jit(
        lambda: jax.random.normal(
            jax.random.PRNGKey(0), (b, 513, 513, 3), jnp.float32
        )
    )()
    results = {}
    for chpad in (False, True):
        t = bench.step_time(
            lambda v, c=chpad: execute_int8_fused(
                model, prep.params, v, chpad_k3=c
            ),
            x, n_small=1, n_big=5, tag=f"deeplab513 chpad={chpad}",
        )
        results[str(chpad)] = {
            "ms_per_step": round(t * 1e3, 2),
            "img_per_s": round(b / t, 1),
        }
        print(f"# chpad={chpad}: {t*1e3:.2f} ms = {b/t:.0f} img/s",
              file=sys.stderr)
    print(json.dumps({
        "experiment": f"DeepLab-MNV2@513 b{b} fused int8: chpad_k3 off/on "
                      "(same session)",
        "results": results,
        "speedup": round(
            results["False"]["ms_per_step"] / results["True"]["ms_per_step"], 3
        ),
    }))


if __name__ == "__main__":
    main()
