"""Serving-oriented numbers: batch sweep (latency vs throughput) for the
fused int8 MNV2 engine, plus DeepLab-MNV2 int8 segmentation throughput
at the reference's 513 crop — all in one session so numbers are
comparable (same tunnel mood).

Latency here is per-step device time from the median slope (the honest
on-device number; the tunnel adds ~30ms host RTT that no serving
deployment would see).
"""

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

    _, _, prep, model = bench._prep_model("mnv2")
    sweep = {}
    for b in (1, 8, 32, 128, 256):
        x = jax.jit(
            lambda b=b: jax.random.normal(
                jax.random.PRNGKey(0), (b, 224, 224, 3), jnp.float32
            )
        )()
        n_small, n_big = bench.loop_counts(b)
        t = bench.step_time(
            lambda v: execute_int8_fused(model, prep.params, v), x,
            n_small=n_small, n_big=n_big, tag=f"mnv2 b{b}",
        )
        sweep[b] = {"ms": round(t * 1e3, 3), "img_per_s": round(b / t, 1)}
        print(f"# b={b}: {t * 1e3:.3f} ms/step, {b / t:.0f} img/s", file=sys.stderr)

    g = deeplab_mobilenet_v2(input_size=513)
    p = init_params(g, seed=0, bn_stats="random")
    prep_s = prepare(
        g, p, QuantConfig(quantize=True, relu=True, equalize=True, bits_bias=16)
    )
    m_s = lower_int8(prep_s)
    bseg = 8
    xs = jax.jit(
        lambda: jax.random.normal(
            jax.random.PRNGKey(1), (bseg, 513, 513, 3), jnp.float32
        )
    )()
    t = bench.step_time(
        lambda v: execute_int8_fused(m_s, prep_s.params, v), xs,
        n_small=1, n_big=5, tag="deeplab513 int8_fused",
    )
    seg = {"ms": round(t * 1e3, 2), "img_per_s": round(bseg / t, 1)}
    print(f"# deeplab513 b{bseg}: {t * 1e3:.2f} ms/step, {bseg / t:.1f} img/s",
          file=sys.stderr)

    print(json.dumps({
        "mnv2_fused_batch_sweep": sweep,
        "deeplab_mnv2_513_int8_fused_b8": seg,
    }))


if __name__ == "__main__":
    main()
