"""Serving-oriented numbers: batch sweep (latency vs throughput) for the
fused int8 MNV2 engine, DeepLab-MNV2 int8 segmentation throughput at the
reference's 513 crop, and MobileNetV2 SSD-Lite at the reference's 300
crop — forward batch sweep PLUS the end-to-end predict path (box decode
+ per-class NMS on host, reference ``predictor.py:29-73``) — all in one
session so numbers are comparable (same tunnel mood).

Latency here is per-step device time from the median slope (the honest
on-device number; the tunnel adds ~30ms host RTT that no serving
deployment would see). The SSD post-process is timed separately on the
host (it IS host work in the reference too: per-class NMS on CPU), with
the device->host boundary sized explicitly (conf+loc ~= 306KB/image).
"""

import json
import sys
import time

sys.path.insert(0, ".")

import bench


def _ssd_section():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dfq_tpu.detection.predictor import Predictor
    from dfq_tpu.engine import lower_int8
    from dfq_tpu.engine.int8_fused import execute_int8_fused
    from dfq_tpu.models import init_params, mobilenet_v2_ssd_lite
    from dfq_tpu.models.ssd import SSDConfig

    g = mobilenet_v2_ssd_lite(num_classes=21)
    p = init_params(g, seed=0, bn_stats="random")
    from dfq_tpu.pipeline import QuantConfig, prepare

    prep = prepare(
        g,
        p,
        QuantConfig(
            quantize=True, relu=True, equalize=True, bits_bias=16,
            is_detection=True,
        ),
    )
    model = lower_int8(prep)

    # forward batch sweep; fwd returns one scalar pair so the slope
    # loop's data dependence consumes BOTH heads
    sweep = {}
    for b in (1, 8, 32, 128):
        x = jax.jit(
            lambda b=b: jax.random.uniform(
                jax.random.PRNGKey(0), (b, 300, 300, 3), jnp.float32,
                minval=-1.0, maxval=1.0,
            )
        )()

        def fwd(v):
            conf, loc = execute_int8_fused(model, prep.params, v)
            return jnp.stack(
                [jnp.sum(conf.astype(jnp.float32)), jnp.sum(loc)]
            )

        n_small, n_big = bench.loop_counts(b)
        t = bench.step_time(
            fwd, x, n_small=n_small, n_big=n_big, tag=f"ssd300 b{b}"
        )
        sweep[b] = {"ms": round(t * 1e3, 3), "img_per_s": round(b / t, 1)}
        print(
            f"# ssd b={b}: {t * 1e3:.3f} ms/step, {b / t:.0f} img/s",
            file=sys.stderr,
        )

    # end-to-end predict: one real forward supplies conf/loc, then the
    # host post-process (decode + per-class NMS) is timed on those
    # arrays. Random-init conf is ~uniform (1/21 ~= 0.048), so the
    # reference's eval threshold 0.01 admits nearly every prior for
    # every class — the WORST case for NMS; 0.4 models a sparse
    # (deployment-like) detection load.
    fx = jax.jit(lambda v: execute_int8_fused(model, prep.params, v))
    x1 = jax.jit(
        lambda: jax.random.uniform(
            jax.random.PRNGKey(1), (1, 300, 300, 3), jnp.float32,
            minval=-1.0, maxval=1.0,
        )
    )()
    conf, loc = fx(x1)
    t0 = time.time()
    conf_h, loc_h = np.asarray(conf), np.asarray(loc)
    fetch_s = time.time() - t0
    bytes_out = conf_h.nbytes + loc_h.nbytes

    pred = Predictor(lambda v: (conf_h, loc_h), SSDConfig())
    img = np.zeros((375, 500, 3), np.float32)
    post = {}
    for thr in (0.01, 0.4):
        reps = 5 if thr == 0.01 else 50
        pred.predict(img, top_k=10, prob_threshold=thr)  # warm
        t0 = time.perf_counter()
        for _ in range(reps):
            boxes, labels, probs = pred.predict(
                img, top_k=10, prob_threshold=thr
            )
        dt = (time.perf_counter() - t0) / reps
        post[thr] = {"ms": round(dt * 1e3, 2), "n_boxes": int(len(labels))}
        print(
            f"# ssd predict thr={thr}: {dt * 1e3:.1f} ms host post-process, "
            f"{len(labels)} boxes",
            file=sys.stderr,
        )
    return {
        "fused_batch_sweep_300": sweep,
        "predict_host_postprocess_ms": post,
        "device_to_host_bytes_per_image": int(bytes_out),
        "first_fetch_s_tunnel": round(fetch_s, 3),
    }


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

    ssd = _ssd_section()

    print(json.dumps({
        "mnv2_fused_batch_sweep": sweep,
        "deeplab_mnv2_513_int8_fused_b8": seg,
        "ssd_mb2_lite": ssd,
    }))


if __name__ == "__main__":
    main()
