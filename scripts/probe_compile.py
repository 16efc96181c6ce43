"""Probe where the fused-engine compile time goes on the real chip.

Round-1 bench tail showed `compile int8_fused n=2: 341.4s` followed by
`n=12: 9.0s` — same program modulo trip count, so the 341s is either a
process-level one-time cost (tunnel/autotune warmup) or something
super-linear on first compile. This measures, in order:

  1. trivial jit (process warmup)
  2. bare fused forward compile
  3. fori_loop n=2 compile
  4. fori_loop n=12 compile
  5. bare baseline-int8 forward compile
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, ".")


def timed(tag, fn):
    t0 = time.time()
    out = fn()
    jax.block_until_ready(out)
    print(f"{tag}: {time.time() - t0:.1f}s", flush=True)


def main():
    from dfq_tpu.engine import execute_int8, lower_int8
    from dfq_tpu.engine.int8_fused import execute_int8_fused
    from dfq_tpu.models import init_params, mobilenet_v2
    from dfq_tpu.pipeline import QuantConfig, prepare

    print(f"devices: {jax.devices()}", flush=True)
    batch = 128
    graph = mobilenet_v2()
    params = init_params(graph, seed=0, bn_stats="random")
    cfg = QuantConfig(quantize=True, relu=True, equalize=True, bits_bias=16)
    prep = prepare(graph, params, cfg)
    model = lower_int8(prep)
    x = jnp.asarray(
        np.random.default_rng(0).normal(0, 1, (batch, 224, 224, 3)), jnp.float32
    )

    timed("warmup trivial jit", lambda: jax.jit(lambda v: v * 2.0 + 1.0)(x))

    fwd = lambda v: execute_int8_fused(model, prep.params, v)
    timed("bare fused forward", lambda: jax.jit(fwd)(x))

    def loop(n):
        @jax.jit
        def run(x):
            def body(i, carry):
                acc, x = carry
                out = fwd(x + acc * 1e-20)
                return acc + jnp.sum(out.astype(jnp.float32)) * 1e-20, x

            acc, _ = lax.fori_loop(0, n, body, (jnp.float32(0), x))
            return acc

        return run(x)

    timed("fori n=2 fused", lambda: loop(2))
    timed("fori n=12 fused", lambda: loop(12))

    fwd_b = lambda v: execute_int8(model, prep.params, v)
    timed("bare baseline int8", lambda: jax.jit(fwd_b)(x))


if __name__ == "__main__":
    main()
