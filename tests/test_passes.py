import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfq_tpu.graph import GraphBuilder, execute
from dfq_tpu.models import init_params, mobilenet_v2
from dfq_tpu.passes import (
    bias_absorption,
    bias_correction,
    clip_weights,
    create_relations,
    cross_layer_equalization,
    fold_batchnorm,
    quantize_layer_weights,
    set_quant_ranges,
)
from dfq_tpu.passes.bn_walk import collect_bn_and_relu, find_prev_bn
from dfq_tpu.quant.moments import relu_gaussian_mean


def _conv_bn_relu_conv(groups2=1):
    b = GraphBuilder()
    x = b.input("data")
    x = b.conv("c1", x, 4, 8, (3, 3), padding=(1, 1))
    x = b.bn("n1", x, 8)
    x = b.relu("r1", x)
    out2 = 8 if groups2 > 1 else 6
    x = b.conv("c2", x, 8, out2, (3, 3), padding=(1, 1), groups=groups2, bias=True)
    return b.build([x])


def _run(g, p, x, ranges=None, bits=8):
    f = jax.jit(lambda pp, v: execute(g, pp, v, act_ranges=ranges or {}, bits_act=bits))
    return np.asarray(f(p, x))


def test_fold_bn_preserves_output():
    g = _conv_bn_relu_conv()
    p = init_params(g, seed=0, bn_stats="random")
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, 8, 4)), jnp.float32)
    ref = _run(g, p, x)
    g2, p2 = fold_batchnorm(g, p)
    out = _run(g2, p2, x)
    np.testing.assert_allclose(out, ref, atol=1e-4)
    # stats retained
    assert "stat_std" in p2["n1"] and "stat_mean" in p2["n1"]
    np.testing.assert_allclose(p2["n1"]["stat_std"], np.abs(p["n1"]["gamma"]))
    np.testing.assert_allclose(p2["n1"]["stat_mean"], p["n1"]["beta"])


def test_relations_simple_chain():
    g = _conv_bn_relu_conv()
    rels = create_relations(g)
    assert len(rels) == 1
    assert (rels[0].first, rels[0].second, rels[0].bn) == ("c1", "c2", "n1")


def test_relations_mobilenet_v2():
    g = mobilenet_v2(relu6=False)
    rels = create_relations(g)
    # every inverted-residual block contributes pw->dw and dw->pw-linear
    # pairs; expansion blocks' first conv pairs with the dw conv
    firsts = {r.first for r in rels}
    assert "features.1.conv.0" in firsts  # t=1 block: dw -> pw-linear
    assert "features.2.conv.0" in firsts  # pw -> dw
    assert "features.2.conv.3" in firsts  # dw -> pw-linear
    assert all(r.bn is not None for r in rels)
    # without the ReLU6->ReLU swap almost all relations disappear (ReLU6 is
    # not walkable, reference utils/relation.py:42); only activation-free
    # linear-bottleneck boundaries remain
    assert len(create_relations(mobilenet_v2(relu6=True))) < len(rels) // 10


def test_relations_stop_at_branches():
    b = GraphBuilder()
    x = b.input("data")
    x = b.conv("c1", x, 4, 8, (3, 3), padding=(1, 1))
    x = b.bn("n1", x, 8)
    x = b.relu("r1", x)
    y = b.conv("c2", x, 8, 8, (1, 1))
    z = b.conv("c3", x, 8, 8, (1, 1))
    x = b.add("a", y, z)
    g = b.build([x])
    # r1 has fanout 2 -> no relation crosses it
    assert create_relations(g) == []


@pytest.mark.parametrize("groups2", [1, 8])
def test_equalization_invariance_and_balance(groups2):
    g = _conv_bn_relu_conv(groups2=groups2)
    p = init_params(g, seed=1, bn_stats="random")
    # inject pathological per-channel imbalance in c1 (the depthwise
    # failure mode from BASELINE.md)
    scale = np.logspace(-2, 2, 8).astype(np.float32)
    p["c1"]["weight"] = p["c1"]["weight"] * scale[:, None, None, None]
    g2, p2 = fold_batchnorm(g, p)
    rels = create_relations(g2)
    assert len(rels) == 1
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 8, 8, 4)), jnp.float32)
    ref = _run(g2, p2, x)

    p3 = cross_layer_equalization(g2, p2, rels)
    out = _run(g2, p3, x)
    # ReLU is positively homogeneous -> equalization exactly preserves FP32
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-4)

    def imbalance(w):
        f = w.reshape(w.shape[0], -1)
        r = f.max(1) - f.min(1)
        return r.max() / max(r.min(), 1e-12)

    assert imbalance(p3["c1"]["weight"]) < imbalance(p2["c1"]["weight"]) / 10


def test_equalization_improves_quantized_accuracy():
    g = _conv_bn_relu_conv()
    p = init_params(g, seed=2, bn_stats="random")
    scale = np.logspace(-2, 2, 8).astype(np.float32)
    p["c1"]["weight"] = p["c1"]["weight"] * scale[:, None, None, None]
    g2, p2 = fold_batchnorm(g, p)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(4, 8, 8, 4)), jnp.float32)
    ref = _run(g2, p2, x)

    q_plain = quantize_layer_weights(g2, p2)
    err_plain = np.abs(_run(g2, q_plain, x) - ref).mean()

    p3 = cross_layer_equalization(g2, p2, create_relations(g2))
    q_eq = quantize_layer_weights(g2, p3)
    err_eq = np.abs(_run(g2, q_eq, x) - ref).mean()
    assert err_eq < err_plain * 0.8


def test_scale_vector_matches_reference_formula():
    g = _conv_bn_relu_conv()
    p = init_params(g, seed=3, bn_stats="random")
    g2, p2 = fold_batchnorm(g, p)
    rels = create_relations(g2)
    w1 = p2["c1"]["weight"].copy()
    w2 = p2["c2"]["weight"].copy()
    from dfq_tpu.passes.equalize import _pair_scales

    s = _pair_scales(w1, w2, (1e-8, 1e8), signed=False)
    for i in range(w1.shape[0]):
        r1 = w1[i].max() - w1[i].min()
        r2 = w2[:, i].max() - w2[:, i].min()
        expect = (1.0 / r1) * np.sqrt(r1 * r2)
        assert s[i] == pytest.approx(expect, rel=1e-5)


def test_bias_absorption_shifts_and_compensates():
    g = _conv_bn_relu_conv()
    p = init_params(g, seed=4, bn_stats="random")
    # force large positive biases so c = max(mean - 3*std, 0) > 0
    p["n1"]["beta"] = np.full(8, 5.0, np.float32)
    p["n1"]["gamma"] = np.full(8, 0.5, np.float32)
    g2, p2 = fold_batchnorm(g, p)
    rels = create_relations(g2)
    p3 = cross_layer_equalization(g2, p2, rels)
    p4 = bias_absorption(g2, p3, rels)

    c = p3["c1"]["bias"] - p4["c1"]["bias"]
    assert np.all(c >= 0) and np.any(c > 0)
    np.testing.assert_allclose(
        p3["n1"]["stat_mean"] - p4["n1"]["stat_mean"], c, atol=1e-5
    )
    # wc compensation matches the reference formula (dfq.py:154-157)
    wc = p4["c2"]["bias"] - p3["c2"]["bias"]
    w2s = p3["c2"]["weight"].reshape(p3["c2"]["weight"].shape[0], -1, 9).sum(-1)
    np.testing.assert_allclose(wc, w2s @ c, rtol=1e-4, atol=1e-5)

    # distributional exactness: pre-activations z ~ N(stat_mean, stat_std)
    # make relu(z) - c == relu(z - c) except in the 3-sigma tail, so
    # feeding the ReLU->c2 fragment directly, original vs absorbed models
    # agree to high precision
    mu = p3["n1"]["stat_mean"]
    sd = p3["n1"]["stat_std"]
    rng = np.random.default_rng(4)
    z = rng.normal(mu, sd, size=(8, 8, 8, 8)).astype(np.float32)

    bb = GraphBuilder()
    xx = bb.input("data")
    xx = bb.relu("r", xx)
    xx = bb.conv("c2", xx, 8, 6, (3, 3), padding=(1, 1), bias=True)
    frag = bb.build([xx])
    y_orig = _run(frag, {"c2": p3["c2"]}, jnp.asarray(z))
    y_abs = _run(frag, {"c2": p4["c2"]}, jnp.asarray(z - c))
    # interior pixels only: at padded borders the spatially-summed wc
    # over-compensates (kernel taps falling outside the image) — an
    # approximation inherited from the reference (dfq.py:154-157)
    interior = (slice(None), slice(1, -1), slice(1, -1), slice(None))
    denom = np.abs(y_orig[interior]).mean()
    assert np.abs(y_abs[interior] - y_orig[interior]).mean() < 1e-2 * denom


def test_clip_weights():
    g = _conv_bn_relu_conv()
    p = init_params(g, seed=5)
    p["c1"]["weight"][0, 0, 0, 0] = 99.0
    p2 = clip_weights(g, p)
    assert p2["c1"]["weight"].max() <= 15.0
    assert p["c1"]["weight"][0, 0, 0, 0] == 99.0  # input untouched


def test_range_setter_one_to_one():
    g = _conv_bn_relu_conv()
    p = init_params(g, seed=6, bn_stats="random")
    g2, p2 = fold_batchnorm(g, p)
    ranges = set_quant_ranges(g2, p2)
    # input site gets the hardcoded preprocessing range
    assert ranges["c1:in0"] == (-2.11790393, 2.64)
    mu = p2["n1"]["stat_mean"]
    sd = p2["n1"]["stat_std"]
    lo, hi = ranges["c2:in0"]
    assert hi == pytest.approx(float((mu + 6 * sd).max()), rel=1e-6)
    assert lo == pytest.approx(max(0.0, float((mu - 6 * sd).min())), rel=1e-6)


def test_range_setter_detection_input_range():
    g = _conv_bn_relu_conv()
    p = init_params(g, seed=6, bn_stats="random")
    g2, p2 = fold_batchnorm(g, p)
    ranges = set_quant_ranges(g2, p2, is_detection=True)
    assert ranges["c1:in0"] == (-1.0, 1.0)


def test_range_setter_covers_mobilenet_sites():
    from dfq_tpu.graph.ir import quant_sites

    g = mobilenet_v2(relu6=False)
    p = init_params(g, seed=0, bn_stats="random")
    g2, p2 = fold_batchnorm(g, p)
    ranges = set_quant_ranges(g2, p2)
    sites = quant_sites(g2)
    missing = [s for s in sites if s not in ranges]
    assert missing == [], f"sites without ranges: {missing}"
    for s, (lo, hi) in ranges.items():
        assert np.isfinite(lo) and np.isfinite(hi) and hi > lo, (s, lo, hi)


def test_range_setter_monte_carlo_coverage():
    """Empirical activations drawn from BN-matched Gaussians must fall
    inside the derived ranges (the 6-sigma contract)."""
    g = _conv_bn_relu_conv()
    p = init_params(g, seed=7, bn_stats="random")
    g2, p2 = fold_batchnorm(g, p)
    ranges = set_quant_ranges(g2, p2)
    mu = p2["n1"]["stat_mean"]
    sd = p2["n1"]["stat_std"]
    rng = np.random.default_rng(7)
    acts = np.maximum(rng.normal(mu, sd, size=(10000, 8)), 0.0)
    lo, hi = ranges["c2:in0"]
    assert acts.max() <= hi + 1e-3
    assert acts.min() >= lo - 1e-3


def test_find_prev_bn_through_residual_add():
    b = GraphBuilder()
    x = b.input("data")
    x = b.conv("c1", x, 3, 8, (3, 3), padding=(1, 1))
    x = b.bn("n1", x, 8)
    x = b.relu("r1", x)
    skip = x
    x = b.conv("c2", x, 8, 8, (3, 3), padding=(1, 1))
    x = b.bn("n2", x, 8)
    x = b.add("a1", skip, x)
    x = b.conv("c3", x, 8, 4, (1, 1))
    g = b.build([x])
    p = init_params(g, seed=8, bn_stats="random")
    g2, p2 = fold_batchnorm(g, p)
    bn_module, relu_attached = collect_bn_and_relu(g2, p2)
    bn_list, attach, ctypes, no_bn = find_prev_bn(
        g2, bn_module, relu_attached, g2.bottoms("c3")
    )
    names = [n for n, _ in bn_list]
    assert set(names) == {"n1", "n2"}
    assert all("add" in c for c in ctypes)
    assert no_bn == {}

    # range for c3 comes from the Gaussian sum of both branches
    ranges = set_quant_ranges(g2, p2)
    assert "c3:in0" in ranges
    lo, hi = ranges["c3:in0"]
    assert hi > lo


def test_bias_correction_recenters_output():
    g = _conv_bn_relu_conv()
    p = init_params(g, seed=9, bn_stats="random")
    g2, p2 = fold_batchnorm(g, p)
    # quantization error in c2's weights shifts the expected output; the
    # correction must cancel it given BN-matched Gaussian inputs.
    # Reference order: correct on FP weights, THEN quantize them
    # (main_cls.py:177-181)
    pc = bias_correction(g2, p2, bits_weight=4)
    pq = quantize_layer_weights(g2, p2, bits_weight=4, bits_bias=32)
    pcq = quantize_layer_weights(g2, pc, bits_weight=4, bits_bias=32)

    mu = p2["n1"]["stat_mean"]
    sd = p2["n1"]["stat_std"]

    rng = np.random.default_rng(9)
    # feed c2 directly with rectified Gaussians matching the BN stats
    acts = np.maximum(rng.normal(mu, sd, size=(512, 4, 4, 8)), 0.0).astype(np.float32)

    def c2_out(params):
        bb = GraphBuilder()
        xx = bb.input("data")
        xx = bb.conv("c2", xx, 8, 6, (3, 3), padding=(1, 1), bias=True)
        gg = bb.build([xx])
        return _run(gg, {"c2": params["c2"]}, jnp.asarray(acts))

    ref_mean = c2_out(p2).mean(axis=(0, 1, 2))
    q_mean = c2_out(pq).mean(axis=(0, 1, 2))
    c_mean = c2_out(pcq).mean(axis=(0, 1, 2))
    # corrected mean closer to FP32 mean than uncorrected
    assert np.abs(c_mean - ref_mean).mean() < np.abs(q_mean - ref_mean).mean()


def test_bias_correction_propagates_to_next_bn():
    b = GraphBuilder()
    x = b.input("data")
    x = b.conv("c1", x, 3, 8, (3, 3), padding=(1, 1))
    x = b.bn("n1", x, 8)
    x = b.relu("r1", x)
    x = b.conv("c2", x, 8, 6, (3, 3), padding=(1, 1))
    x = b.bn("n2", x, 6)
    g = b.build([x])
    p = init_params(g, seed=10, bn_stats="random")
    g2, p2 = fold_batchnorm(g, p)
    pc = bias_correction(g2, p2, bits_weight=4)
    shift = pc["c2"]["bias"] - p2["c2"]["bias"]
    np.testing.assert_allclose(
        pc["n2"]["stat_mean"] - p2["n2"]["stat_mean"], shift, atol=1e-5
    )
