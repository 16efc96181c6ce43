"""End-to-end pipeline tests on a synthetic MobileNetV2.

No pretrained weights/ImageNet are available in this environment, so the
behavioral gates are self-referential: FP32 output of the *same* model is
the oracle, and the DFQ passes must (a) keep FP32 behavior invariant
where they claim exactness and (b) strictly improve fake-quant /
true-int8 agreement with FP32 on a weight-imbalanced model — the
qualitative content of the reference's README tables (MobileNetV2
collapses at per-tensor W8A8 without equalization, BASELINE.md).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfq_tpu.engine import execute_int8, lower_int8
from dfq_tpu.graph import execute
from dfq_tpu.models import init_params, mobilenet_v2
from dfq_tpu.pipeline import QuantConfig, prepare


def _imbalanced_mnv2_params(seed=0):
    """Random MNV2 params with per-channel scale imbalance injected into
    depthwise convs (the pathology DFQ exists to fix)."""
    g = mobilenet_v2()
    p = init_params(g, seed=seed, bn_stats="random")
    rng = np.random.default_rng(seed + 100)
    for node in g:
        if node.op == "conv" and node.attrs["groups"] > 1:
            c = node.attrs["out_ch"]
            s = np.exp(rng.normal(0.0, 1.5, c)).astype(np.float32)
            p[node.name]["weight"] = p[node.name]["weight"] * s[:, None, None, None]
    return g, p


def _agree(a, b):
    return float(np.mean(np.argmax(a, -1) == np.argmax(b, -1)))


@pytest.fixture(scope="module")
def mnv2_setup():
    g, p = _imbalanced_mnv2_params()
    rng = np.random.default_rng(7)
    x = jnp.asarray(
        np.clip(rng.normal(0.0, 1.0, (16, 224, 224, 3)), -2.11790393, 2.64),
        jnp.float32,
    )
    fp_ref = np.asarray(jax.jit(lambda pp, v: execute(g, pp, v))(p, x))
    return g, p, x, fp_ref


def _quantized_logits(g, p, x, cfg):
    prep = prepare(g, p, cfg)
    f = jax.jit(
        lambda pp, v: execute(
            prep.graph, pp, v, act_ranges=prep.act_ranges,
            bits_act=cfg.bits_activation,
        )
    )
    return np.asarray(f(prep.params, x)), prep


def test_fp32_pipeline_keeps_output(mnv2_setup):
    g, p, x, fp_ref = mnv2_setup
    # all passes on, but quantize off: output must stay ~FP32 (BN fold,
    # relu swap on a model whose activations are what they are — the relu
    # swap does change relu6 saturation, so compare against a relu-swapped
    # FP32 reference)
    g_relu = g.map_ops({"relu6": "relu"})
    ref = np.asarray(jax.jit(lambda pp, v: execute(g_relu, pp, v))(p, x))
    cfg = QuantConfig(
        quantize=False, relu=True, equalize=True, absorption=False,
        correction=False,
    )
    prep = prepare(g, p, cfg)
    out = np.asarray(
        jax.jit(lambda pp, v: execute(prep.graph, pp, v))(prep.params, x)
    )
    # equalization + BN fold are FP32-invariant
    np.testing.assert_allclose(out, ref, atol=2e-2, rtol=1e-3)
    assert _agree(out, ref) == 1.0


def test_equalization_rescues_quantized_model(mnv2_setup):
    g, p, x, fp_ref = mnv2_setup
    base, _ = _quantized_logits(
        g, p, x, QuantConfig(quantize=True, relu=True, bits_bias=16)
    )
    eq, _ = _quantized_logits(
        g, p, x,
        QuantConfig(quantize=True, relu=True, equalize=True, bits_bias=16),
    )
    ref = np.asarray(
        jax.jit(lambda pp, v: execute(g.map_ops({"relu6": "relu"}), pp, v))(p, x)
    )
    agree_base = _agree(base, ref)
    agree_eq = _agree(eq, ref)
    err_base = np.abs(base - ref).mean()
    err_eq = np.abs(eq - ref).mean()
    assert err_eq < err_base, (err_base, err_eq)
    assert agree_eq >= agree_base


def test_full_dfq_stack_runs(mnv2_setup):
    g, p, x, fp_ref = mnv2_setup
    cfg = QuantConfig(
        quantize=True, relu=True, equalize=True, absorption=True,
        correction=True, bits_bias=16,
    )
    out, prep = _quantized_logits(g, p, x, cfg)
    assert np.isfinite(out).all()
    assert len(prep.act_ranges) > 60


def test_flag_invariants():
    with pytest.raises(ValueError):
        QuantConfig(equalize=True, relu=False)
    with pytest.raises(ValueError):
        QuantConfig(absorption=True, equalize=False, relu=True)


def test_int8_engine_matches_fakequant(mnv2_setup):
    g, p, x, fp_ref = mnv2_setup
    cfg = QuantConfig(quantize=True, relu=True, equalize=True, bits_bias=16)
    sim, prep = _quantized_logits(g, p, x, cfg)
    model = lower_int8(prep)
    assert len(model.layers) == 53  # 52 convs + classifier
    f = jax.jit(lambda pp, v: execute_int8(model, pp, v))
    out = np.asarray(f(prep.params, x))
    ref = np.asarray(
        jax.jit(lambda pp, v: execute(g.map_ops({"relu6": "relu"}), pp, v))(p, x)
    )
    # true int8 (per-channel weights) should track FP32 at least as well
    # as the per-tensor fake-quant simulation
    err_int8 = np.abs(out - ref).mean()
    err_sim = np.abs(sim - ref).mean()
    assert err_int8 < err_sim * 1.5
    assert _agree(out, ref) >= _agree(sim, ref) - 0.1


def test_int8_conv_exactness():
    """int8 conv + zero-point fold must equal the integer-exact reference
    computed in float."""
    from dfq_tpu.engine.int8 import Int8Layer, _int8_conv, _quantize_act
    from dfq_tpu.graph.ir import GraphBuilder

    rng = np.random.default_rng(0)
    b = GraphBuilder()
    xn = b.input("data")
    b.conv("c", xn, 8, 16, (3, 3), padding=(1, 1))
    g = b.build(["c"])
    node = g["c"]

    qw = rng.integers(-127, 128, (16, 8, 3, 3)).astype(np.int8)
    layer = Int8Layer(
        qweight=qw,
        w_scale=np.ones(16, np.float32),
        bias=None,
        wsum=qw.astype(np.int32).reshape(16, -1).sum(1),
        in_scale=0.05,
        in_zp=-10,
    )
    x = jnp.asarray(rng.normal(0, 1, (2, 6, 6, 8)), jnp.float32)

    def run(x):
        xq = _quantize_act(x, layer)
        acc = _int8_conv(
            xq, node, jnp.transpose(jnp.asarray(qw), (2, 3, 1, 0)), layer.in_zp
        )
        return acc - layer.in_zp * jnp.asarray(layer.wsum, jnp.int32), xq

    acc, xq = jax.jit(run)(x)
    # integer-exact oracle via float64 conv on dequantized ints
    xq_f = np.asarray(xq, np.float64) - layer.in_zp
    w_f = np.asarray(qw, np.float64)
    import torch

    ref = torch.nn.functional.conv2d(
        torch.from_numpy(xq_f.transpose(0, 3, 1, 2)),
        torch.from_numpy(w_f),
        padding=1,
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_array_equal(np.asarray(acc, np.float64), ref)


def test_int8_bias_grid_semantics():
    """lower_int8 must put biases on the cfg.bits_bias grid: snapped for
    8/16 bit (Int8*/Int8** regimes, README.md:5-8), raw f32 passthrough
    for 32 bit (Int8' / ncnn regime, convert_ncnn.py:29)."""
    from dfq_tpu.graph.ir import GraphBuilder
    from dfq_tpu.quant.core import fake_quant_np

    rng = np.random.default_rng(3)
    b = GraphBuilder()
    xn = b.input("data")
    b.conv("c", xn, 8, 16, (3, 3), padding=(1, 1), bias=True)
    g = b.build(["c"])
    p = {"c": {
        "weight": rng.normal(0, 0.1, (16, 8, 3, 3)).astype(np.float32),
        "bias": rng.normal(0, 0.5, 16).astype(np.float32),
    }}

    lowered = {}
    for bits in (8, 16, 32):
        cfg = QuantConfig(quantize=True, bits_bias=bits)
        prep = prepare(g, p, cfg)
        lowered[bits] = lower_int8(prep).layers["c"].bias

    raw = np.asarray(prep.params_fp["c"]["bias"], np.float32)
    # 32-bit: exact passthrough of the post-pass f32 bias
    np.testing.assert_array_equal(lowered[32], raw)
    # 8/16-bit: exactly the per-tensor fake-quant grid snap
    for bits in (8, 16):
        expect = fake_quant_np(
            raw, float(raw.min()), float(raw.max()), bits=bits
        )
        np.testing.assert_array_equal(lowered[bits], expect)
        assert not np.array_equal(lowered[bits], raw)
    # coarser grid -> larger snap error
    assert np.abs(lowered[8] - raw).max() > np.abs(lowered[16] - raw).max()


def test_int8_weight_bits_grid():
    """lower_int8 must honor cfg.bits_weight (the reference's
    set_layer_bits regimes, utils/quantize.py:359-372): a W4 run must
    produce genuinely 4-bit weight codes with the matching per-channel
    scales, not a silently-W8 artifact."""
    from dfq_tpu.graph.ir import GraphBuilder

    rng = np.random.default_rng(4)
    b = GraphBuilder()
    xn = b.input("data")
    b.conv("c", xn, 8, 16, (3, 3), padding=(1, 1), bias=True)
    g = b.build(["c"])
    p = {"c": {
        "weight": rng.normal(0, 0.1, (16, 8, 3, 3)).astype(np.float32),
        "bias": rng.normal(0, 0.5, 16).astype(np.float32),
    }}

    layers = {}
    for bits in (4, 6, 8):
        prep = prepare(g, p, QuantConfig(quantize=True, bits_weight=bits))
        layers[bits] = lower_int8(prep).layers["c"]

    w = np.asarray(prep.params_fp["c"]["weight"], np.float32)
    for bits in (4, 6, 8):
        L = layers[bits]
        qmax = 2 ** (bits - 1) - 1
        q = np.asarray(L.qweight, np.int32)
        assert q.min() >= -qmax - 1 and q.max() <= qmax
        # codes actually reach the narrow grid's extremes (not W8 codes)
        assert q.max() > qmax - 2
        amax = np.abs(w.reshape(16, -1)).max(axis=1)
        np.testing.assert_allclose(L.w_scale, amax / qmax, rtol=1e-6)
        # dequantized weights approximate the f32 weights at grid res
        err = np.abs(q * L.w_scale.reshape(-1, 1, 1, 1) - w).max()
        assert err <= 0.5 * L.w_scale.max() + 1e-7
    # wsum matches the narrow codes (zero-point fold stays exact)
    np.testing.assert_array_equal(
        layers[4].wsum,
        np.asarray(layers[4].qweight, np.int32).reshape(16, -1).sum(1),
    )
    # W4 codes differ from W8 codes (regression for the hardcoded bits=8)
    assert not np.array_equal(layers[4].qweight, layers[8].qweight)

    with pytest.raises(ValueError, match="bits_weight"):
        lower_int8(prepare(g, p, QuantConfig(quantize=True, bits_weight=16)))

    # narrow-activation regime: baseline engine runs, fused refuses
    from dfq_tpu.engine.int8_fused import execute_int8_fused

    prep4 = prepare(g, p, QuantConfig(quantize=True, bits_activation=4))
    m4 = lower_int8(prep4)
    assert m4.bits_act == 4
    x = jnp.asarray(rng.normal(0, 1, (2, 8, 8, 8)), jnp.float32)
    out = execute_int8(m4, prep4.params, x)
    assert np.isfinite(np.asarray(out)).all()
    with pytest.raises(ValueError, match="bits_act"):
        execute_int8_fused(m4, prep4.params, x)


def test_trainable_regime_matches_default(mnv2_setup):
    """The --trainable regime (per-forward weight fake-quant,
    QuantConv2d utils/quantize.py:220-231) computes the same per-tensor
    min/max quantization as the default one-shot quantize_targ_layer.
    Oracle: quantize the weights ONCE on-device with identical jnp ops,
    then run without weight_bits — must match bit-exactly. (The host
    numpy one-shot path differs by f32 rounding at grid boundaries,
    the CPU-vs-GPU sensitivity the reference documents at
    utils/quantize.py:18-21, so it is only checked loosely.)"""
    from dfq_tpu.graph.executor import execute as run
    from dfq_tpu.quant.core import fake_quant

    g, p, x, _ = mnv2_setup
    xs = x[:4]
    cfg_t = QuantConfig(
        quantize=True, relu=True, equalize=True, bits_bias=16, trainable=True
    )
    prep_t = prepare(g, p, cfg_t)
    base = QuantConfig(quantize=True, relu=True, equalize=True, bits_bias=16)
    prep_d = prepare(g, p, base)
    # trainable: params NOT pre-quantized
    some_conv = next(n.name for n in prep_t.graph if n.op == "conv")
    assert not np.array_equal(
        prep_t.params[some_conv]["weight"], prep_d.params[some_conv]["weight"]
    )

    out_t = np.asarray(
        jax.jit(
            lambda pp, v: run(
                prep_t.graph, pp, v, act_ranges=prep_t.act_ranges,
                bits_act=8, weight_bits=8, bias_bits=16,
            )
        )(prep_t.params, xs)
    )

    @jax.jit
    def quant_once(pp):
        out = {}
        for node in prep_t.graph:
            if node.op not in ("conv", "linear") or node.name not in pp:
                out[node.name] = pp.get(node.name, {})
                continue
            q = dict(pp[node.name])
            w = q["weight"]
            q["weight"] = fake_quant(w, jnp.min(w), jnp.max(w), bits=8)
            b = q.get("bias")
            if b is not None:
                q["bias"] = fake_quant(b, jnp.min(b), jnp.max(b), bits=16)
            out[node.name] = q
        return out

    p_once = quant_once(prep_t.params)
    out_once = np.asarray(
        jax.jit(
            lambda pp, v: run(
                prep_t.graph, pp, v, act_ranges=prep_t.act_ranges, bits_act=8
            )
        )(p_once, xs)
    )
    np.testing.assert_array_equal(out_t, out_once)

    # loose check vs the host-quantized default regime: identical ranges,
    # predictions agree, logits close up to grid-boundary rounding noise
    assert prep_t.act_ranges == prep_d.act_ranges
    out_d = np.asarray(
        jax.jit(
            lambda pp, v: run(
                prep_d.graph, pp, v, act_ranges=prep_d.act_ranges, bits_act=8
            )
        )(prep_d.params, xs)
    )
    assert _agree(out_t, out_d) == 1.0
    assert np.abs(out_t - out_d).mean() < 0.05


def test_trainable_distill_exclusive():
    with pytest.raises(ValueError):
        QuantConfig(trainable=True, distill_range=True)
