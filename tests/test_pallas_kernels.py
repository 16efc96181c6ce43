"""Pallas int8 kernels vs integer-exact numpy oracles (interpret mode on
the CPU test mesh; the same kernels are verified on real TPU by
the perf scripts and bench)."""

import numpy as np
import pytest

import jax.numpy as jnp

from dfq_tpu.ops import dw3x3_int8_requant, matmul_int8_requant


@pytest.mark.parametrize("act", ["none", "relu", "relu6"])
def test_matmul_int8_requant_exact(act):
    rng = np.random.default_rng(0)
    M, K, N = 70, 48, 40
    x = rng.integers(-128, 128, (M, K)).astype(np.int8)
    w = rng.integers(-128, 128, (K, N)).astype(np.int8)
    scale = rng.uniform(0.001, 0.01, N).astype(np.float32)
    bias = rng.normal(0, 1, N).astype(np.float32)
    wsum = w.astype(np.int32).sum(0)
    zp_in, s_out, zp_out = -5, 0.05, -20
    out = np.asarray(
        matmul_int8_requant(
            jnp.asarray(x), jnp.asarray(w), jnp.asarray(scale),
            jnp.asarray(bias), jnp.asarray(wsum),
            zp_in=zp_in, s_out=s_out, zp_out=zp_out, act=act,
        )
    )
    acc = x.astype(np.int64) @ w.astype(np.int64) - zp_in * wsum
    f = acc.astype(np.float64) * scale + bias
    if act == "relu":
        f = np.maximum(f, 0)
    elif act == "relu6":
        f = np.clip(f, 0, 6)
    ref = np.clip(np.round(f / s_out) + zp_out, -128, 127).astype(np.int8)
    np.testing.assert_array_equal(out, ref)


def test_matmul_int8_requant_f32_out():
    rng = np.random.default_rng(1)
    M, K, N = 33, 16, 12
    x = rng.integers(-128, 128, (M, K)).astype(np.int8)
    w = rng.integers(-128, 128, (K, N)).astype(np.int8)
    scale = rng.uniform(0.001, 0.01, N).astype(np.float32)
    bias = rng.normal(0, 1, N).astype(np.float32)
    wsum = w.astype(np.int32).sum(0)
    out = np.asarray(
        matmul_int8_requant(
            jnp.asarray(x), jnp.asarray(w), jnp.asarray(scale),
            jnp.asarray(bias), jnp.asarray(wsum),
            zp_in=3, s_out=1.0, zp_out=0, out_f32=True,
        )
    )
    acc = x.astype(np.int64) @ w.astype(np.int64) - 3 * wsum
    ref = acc.astype(np.float64) * scale + bias
    np.testing.assert_allclose(out, ref, rtol=1e-6)


def test_dw3x3_int8_requant_exact():
    rng = np.random.default_rng(2)
    N, H, W, C = 2, 9, 11, 20
    x = rng.integers(-128, 128, (N, H, W, C)).astype(np.int8)
    w9 = rng.integers(-20, 20, (9, C)).astype(np.int8)
    scale = rng.uniform(0.001, 0.01, C).astype(np.float32)
    bias = rng.normal(0, 1, C).astype(np.float32)
    zp_in, s_out, zp_out = 7, 0.04, 10
    out = np.asarray(
        dw3x3_int8_requant(
            jnp.asarray(x), jnp.asarray(w9), jnp.asarray(scale),
            jnp.asarray(bias),
            zp_in=zp_in, s_out=s_out, zp_out=zp_out, act="relu6",
        )
    )
    xp = np.pad(x.astype(np.int64) - zp_in, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = sum(
        xp[:, ky : ky + H, kx : kx + W, :] * w9[ky * 3 + kx].astype(np.int64)
        for ky in range(3)
        for kx in range(3)
    )
    f = np.clip(acc.astype(np.float64) * scale + bias, 0, 6)
    ref = np.clip(np.round(f / s_out) + zp_out, -128, 127).astype(np.int8)
    np.testing.assert_array_equal(out, ref)


def test_fused_engine_pallas_path_small_graph():
    """use_pallas path through the engine on a tiny pw+dw net."""
    import jax

    from dfq_tpu.engine import lower_int8
    from dfq_tpu.engine.int8_fused import execute_int8_fused
    from dfq_tpu.graph.ir import GraphBuilder
    from dfq_tpu.models import init_params
    from dfq_tpu.pipeline import QuantConfig, prepare

    b = GraphBuilder()
    x = b.input("data")
    x = b.conv("pw1", x, 8, 16, (1, 1))
    x = b.bn("n1", x, 16)
    x = b.relu("r1", x)
    x = b.conv("dw", x, 16, 16, (3, 3), padding=(1, 1), groups=16)
    x = b.bn("n2", x, 16)
    x = b.relu("r2", x)
    x = b.conv("pw2", x, 16, 8, (1, 1))
    x = b.bn("n3", x, 8)
    g = b.build([x])
    p = init_params(g, seed=0, bn_stats="random")
    prep = prepare(g, p, QuantConfig(quantize=True, relu=True, bits_bias=16))
    model = lower_int8(prep)
    xin = jnp.asarray(
        np.random.default_rng(3).normal(0, 1, (2, 8, 8, 8)), jnp.float32
    )
    base = np.asarray(
        jax.jit(lambda v: execute_int8_fused(model, prep.params, v))(xin)
    )
    pal = np.asarray(
        jax.jit(
            lambda v: execute_int8_fused(model, prep.params, v, use_pallas=True)
        )(xin)
    )
    # identical int grids; only reciprocal-vs-divide rounding can differ
    np.testing.assert_allclose(pal, base, atol=2e-2, rtol=1e-3)
