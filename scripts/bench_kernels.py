"""Kernel-level microbenchmarks on the real chip: Pallas vs XLA.

CAVEAT (round-3 finding): the timed loops here CAST f32->int8 inside
the measured region, so the "effective GB/s" denominators undercount
real traffic ~2.5x — the round-2 "dw = 110 GB/s, VPU-tap-bound"
conclusion drawn from this script was refuted by in-model traces
(PERFORMANCE.md "honest roofline"). Kept as-is for the historical
record; use scripts/probe_dw_shapes.py (pure int8-domain chains) for
dw rates and scripts/profile_layers.py for in-model attribution.

Cases:
  dw     - depthwise 3x3 stride-1 int8
  mm     - pointwise conv as int8 matmul

Reports effective GB/s (dw: in+out int8 bytes) and TOPS (mm).
Uses the slope method from bench.py.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from bench import step_time  # noqa: E402


def bench_dw():
    from dfq_tpu.ops.pallas_int8 import dw3x3_int8_requant

    N, H, W, C = 32, 56, 56, 144
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-128, 128, (N, H, W, C)), jnp.int8)
    w = jnp.asarray(rng.integers(-30, 30, (9, C)), jnp.int8)
    scale = jnp.asarray(rng.uniform(1e-3, 1e-2, C), jnp.float32)
    bias = jnp.asarray(rng.normal(0, 0.5, C), jnp.float32)

    bytes_eff = 2 * N * H * W * C  # int8 in + int8 out

    def pallas_fwd(v):
        return dw3x3_int8_requant(
            v, w, scale, bias, zp_in=3, s_out=0.05, zp_out=-7, act="relu6"
        )

    def xla_fwd(v):
        wk = jnp.transpose(
            jnp.asarray(w).reshape(3, 3, 1, C), (0, 1, 2, 3)
        )  # HWIO with feature groups
        acc = jax.lax.conv_general_dilated(
            v, wk, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C,
            preferred_element_type=jnp.int32,
        )
        # zp fold for dw: zp * tap-sum with edge effects — approximate with
        # plain epilogue (same traffic; this is a bandwidth benchmark)
        f = acc.astype(jnp.float32) * scale + bias
        f = jnp.clip(f, 0.0, 6.0)
        q = jnp.round(f / 0.05) + (-7 + 128)
        return (jnp.clip(q, 0.0, 255.0) - 128.0).astype(jnp.int8)

    # perturbation input must be int8-compatible: wrap fwd to cast
    t_p = step_time(lambda v: pallas_fwd(v.astype(jnp.int8)),
                    x.astype(jnp.float32), tag="dw pallas")
    t_x = step_time(lambda v: xla_fwd(v.astype(jnp.int8)),
                    x.astype(jnp.float32), tag="dw xla")
    print(f"RESULT dw pallas: {bytes_eff / t_p / 1e9:.1f} GB/s eff, "
          f"xla: {bytes_eff / t_x / 1e9:.1f} GB/s eff", file=sys.stderr)


def bench_mm():
    from dfq_tpu.ops.pallas_int8 import matmul_int8_requant

    M, K, N = 25088, 576, 128
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-128, 128, (M, K)), jnp.int8)
    w = jnp.asarray(rng.integers(-30, 30, (K, N)), jnp.int8)
    scale = jnp.asarray(rng.uniform(1e-3, 1e-2, N), jnp.float32)
    bias = jnp.asarray(rng.normal(0, 0.5, N), jnp.float32)
    wsum = jnp.sum(w.astype(jnp.int32), axis=0)
    flops = 2 * M * K * N

    def pallas_fwd(v):
        return matmul_int8_requant(
            v, w, scale, bias, wsum, zp_in=3, s_out=0.05, zp_out=-7, act="relu"
        )

    def xla_fwd(v):
        acc = jax.lax.dot_general(
            v, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        acc = acc - 3 * wsum
        f = acc.astype(jnp.float32) * scale + bias
        f = jnp.maximum(f, 0.0)
        q = jnp.round(f / 0.05) + (-7 + 128)
        return (jnp.clip(q, 0.0, 255.0) - 128.0).astype(jnp.int8)

    t_p = step_time(lambda v: pallas_fwd(v.astype(jnp.int8)),
                    x.astype(jnp.float32), tag="mm pallas")
    t_x = step_time(lambda v: xla_fwd(v.astype(jnp.int8)),
                    x.astype(jnp.float32), tag="mm xla")
    print(f"RESULT mm pallas: {flops / t_p / 1e12:.1f} TOPS, "
          f"xla: {flops / t_x / 1e12:.1f} TOPS", file=sys.stderr)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "dw"
    {"dw": bench_dw, "mm": bench_mm}[which]()
