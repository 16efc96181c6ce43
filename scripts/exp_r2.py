"""Round-2 perf experiments on the real chip (run one at a time; the
tunnel TPU is single-client). Usage: python scripts/exp_r2.py <name>

Experiments:
  fuseblocks  - int8_fused with fuse_blocks=True vs default
  pallas      - engine with use_pallas=True
  resnet      - ResNet-18 int8 vs f32
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from bench import step_time  # noqa: E402


def build_mnv2():
    from dfq_tpu.engine import lower_int8
    from dfq_tpu.models import init_params, mobilenet_v2
    from dfq_tpu.pipeline import QuantConfig, prepare

    graph = mobilenet_v2()
    params = init_params(graph, seed=0, bn_stats="random")
    cfg = QuantConfig(quantize=True, relu=True, equalize=True, bits_bias=16)
    prep = prepare(graph, params, cfg)
    model = lower_int8(prep)
    return graph, params, prep, model


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "fuseblocks"
    batch = 128
    x = jnp.asarray(
        np.random.default_rng(0).normal(0, 1, (batch, 224, 224, 3)), jnp.float32
    )

    if which == "fuseblocks":
        from dfq_tpu.engine.int8_fused import execute_int8_fused

        graph, params, prep, model = build_mnv2()
        t = step_time(
            lambda v: execute_int8_fused(
                model, prep.params, v, fuse_blocks=True
            ),
            x,
            tag="fuse_blocks",
        )
        print(f"RESULT fuse_blocks: {batch / t:.0f} img/s", file=sys.stderr)
    elif which == "pallas":
        from dfq_tpu.engine.int8_fused import execute_int8_fused

        graph, params, prep, model = build_mnv2()
        t = step_time(
            lambda v: execute_int8_fused(model, prep.params, v, use_pallas=True),
            x,
            tag="use_pallas",
        )
        print(f"RESULT use_pallas: {batch / t:.0f} img/s", file=sys.stderr)
    elif which == "resnet":
        from dfq_tpu.engine import execute_int8, lower_int8
        from dfq_tpu.graph.executor import execute
        from dfq_tpu.models import init_params, resnet18
        from dfq_tpu.pipeline import QuantConfig, prepare

        graph = resnet18()
        params = init_params(graph, seed=0, bn_stats="random")
        cfg = QuantConfig(quantize=True, relu=True, equalize=False, bits_bias=16)
        prep = prepare(graph, params, cfg)
        model = lower_int8(prep)
        t_i8 = step_time(
            lambda v: execute_int8(model, prep.params, v), x, tag="r18_int8"
        )
        t_fp = step_time(lambda v: execute(graph, params, v), x, tag="r18_f32")
        print(
            f"RESULT resnet18 int8: {batch / t_i8:.0f} img/s, "
            f"f32: {batch / t_fp:.0f} img/s",
            file=sys.stderr,
        )
    else:
        raise SystemExit(f"unknown experiment {which!r}")


if __name__ == "__main__":
    main()
