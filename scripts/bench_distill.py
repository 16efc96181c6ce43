"""Distillation (ZeroQ synthesis) throughput on the real chip.

This framework's "training step" is the jitted distilled-data synthesis
(``calib/distill.py``): one Adam update on a batch of synthetic images
against the BN-statistics loss, the whole optimization a single
``lax.while_loop`` on device. The reference runs the same loss as a
hooked torch Python loop (``ZeroQ/distill_data.py:172-216``, 500
iterations per batch). Measured here: per-iteration step time at
batch 64 / 224x224 on MobileNetV2, and the derived images-synthesized/s
at the reference's 500-iteration budget.

Timing: the while_loop runs exactly ``max_iters`` iterations when
``early_break_factor=0`` (threshold 0 < any loss), so the per-iteration
time is the slope between a short and a long synthesis — same
methodology as bench.py, interleaved rounds, median slope.
"""

import json
import sys
import time

sys.path.insert(0, ".")

import jax

from dfq_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax.numpy as jnp
import numpy as np

BATCH = 64
SIZE = 224


def main():
    from dfq_tpu.calib.distill import DistillConfig, distill_batch_fn
    from dfq_tpu.models import init_params, mobilenet_v2
    from dfq_tpu.passes import fold_batchnorm

    graph = mobilenet_v2()
    params = init_params(graph, seed=0, bn_stats="random")
    gf, pf = fold_batchnorm(graph, params)

    # seed batch generated on-device (38MB upload costs minutes through
    # the tunnel); same uniform integer-grid distribution as
    # init_random_batch
    cfg0 = DistillConfig(batch_size=BATCH, image_size=(SIZE, SIZE))
    x0 = jax.jit(
        lambda: (
            jax.random.randint(
                jax.random.PRNGKey(0), (BATCH, SIZE, SIZE, 3), 0, 255
            ).astype(jnp.float32)
            - 127.0
        )
        / 128.0
        * cfg0.max_value
    )()

    runs = {}
    for iters in (5, 30):
        cfg = DistillConfig(
            batch_size=BATCH, image_size=(SIZE, SIZE),
            max_iters=iters, early_break_factor=0.0,
        )
        run = distill_batch_fn(gf, pf, cfg)
        t0 = time.time()
        _, it, loss = run(x0)
        it, loss = int(it), float(loss)
        print(
            f"# compile+first distill n={iters}: {time.time() - t0:.1f}s "
            f"(ran {it} iters, loss {loss:.1f})",
            file=sys.stderr,
        )
        assert it == iters and np.isfinite(loss)
        runs[iters] = run

    slopes = []
    for _ in range(3):
        ts = {}
        for iters, run in runs.items():
            t0 = time.perf_counter()
            jax.device_get(run(x0)[2])
            ts[iters] = time.perf_counter() - t0
        slopes.append((ts[30] - ts[5]) / 25)
    slopes.sort()
    t_step = slopes[len(slopes) // 2]
    print(
        "# distill step slopes (ms): "
        + ", ".join(f"{s * 1e3:.1f}" for s in slopes),
        file=sys.stderr,
    )
    ips_500 = BATCH / (500 * t_step)
    print(
        f"# distill: {t_step * 1e3:.1f} ms/step (batch {BATCH}, {SIZE}^2), "
        f"{BATCH / t_step:.0f} img-iters/s, "
        f"{ips_500:.1f} img synthesized/s at the reference's 500-iter budget",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": "distill_step_ms_mobilenetv2_b64_224",
        "value": round(t_step * 1e3, 2),
        "unit": "ms/step",
        "images_synthesized_per_s_at_500_iters": round(ips_500, 2),
    }))


if __name__ == "__main__":
    main()
