"""Round-3 compile-time diagnosis: separate AOT compile from first fetch,
and test the persistent compilation cache through the axon tunnel.

BENCH_r02.json recorded `compile mnv2 int8_fused forward: 308.0s` in the
driver's fresh process while the same program compiled in ~9s in a probe
session. Two candidate explanations:

  a) XLA autotuning is per-*server*-process state (the tunnel backend
     keeps it warm across client processes, so probe sessions measured a
     warm server); the driver's run hit it cold.
  b) The 308s is not compile at all: the verify notes record that the
     FIRST `device_get` after a compile can take 50-250s through the
     tunnel, and `bench.step_time` times `device_get(jit(fwd)(x))` as
     one number.

This probe separates the two by timing `jit(fwd).lower(x).compile()`
(AOT, no execution, no fetch) apart from the first execute+fetch, with
the persistent compilation cache enabled. Run it twice in fresh
processes: the second run's compile lines show whether the cache works
over axon.
"""

import sys
import time

sys.path.insert(0, ".")

import jax

from dfq_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax.numpy as jnp
import numpy as np
from jax import lax


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

    t0 = time.time()
    jax.device_get(jax.jit(lambda v: v * 2.0 + 1.0)(x))
    print(f"trivial jit+fetch: {time.time() - t0:.1f}s", flush=True)

    fwd = lambda v: execute_int8_fused(model, prep.params, v)

    t0 = time.time()
    compiled = jax.jit(fwd).lower(x).compile()
    print(f"AOT compile fused forward: {time.time() - t0:.1f}s", flush=True)

    t0 = time.time()
    out = compiled(x)
    jax.device_get(out)
    print(f"first execute+fetch fused: {time.time() - t0:.1f}s", flush=True)

    t0 = time.time()
    jax.device_get(compiled(x))
    print(f"second execute+fetch fused: {time.time() - t0:.1f}s", flush=True)

    fwd_b = lambda v: execute_int8(model, prep.params, v)
    t0 = time.time()
    compiled_b = jax.jit(fwd_b).lower(x).compile()
    print(f"AOT compile baseline forward: {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    jax.device_get(compiled_b(x))
    print(f"first execute+fetch baseline: {time.time() - t0:.1f}s", flush=True)

    def loop_fn(n):
        def run(xv):
            def body(i, carry):
                acc, xv = carry
                out = fwd(xv + acc * 1e-20)
                return acc + jnp.sum(out.astype(jnp.float32)) * 1e-20, xv

            acc, _ = lax.fori_loop(0, n, body, (jnp.float32(0), xv))
            return acc

        return run

    t0 = time.time()
    loop2 = jax.jit(loop_fn(2)).lower(x).compile()
    print(f"AOT compile fused loop n=2: {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    jax.device_get(loop2(x))
    print(f"first execute+fetch loop n=2: {time.time() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
