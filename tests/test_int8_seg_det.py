"""True-int8 engines on segmentation and detection graphs.

Round-2 gap: the int8 paths for interpolate / concat / softmax /
multi-head outputs existed but were never executed by a test — exactly
the graphs (ASPP dilated convs, global-pool branch, conv-without-BN
heads; reference behaviors ``modeling/segmentation/aspp.py:71-72``,
``deeplab.py:32``, ``modeling/detection/ssd.py:40-110``) where lowering
bugs would hide. These tests lower DeepLab-MNV2 and SSD-Lite through
``lower_int8`` and run BOTH engines, asserting closeness to the
fake-quant simulator at quantization tolerance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfq_tpu.engine import execute_int8, lower_int8
from dfq_tpu.engine.int8_fused import execute_int8_fused
from dfq_tpu.graph import execute
from dfq_tpu.models import (
    deeplab_mobilenet_v2,
    init_params,
    mobilenet_v2_ssd_lite,
)
from dfq_tpu.pipeline import QuantConfig, prepare


@pytest.fixture(scope="module")
def deeplab_int8():
    g = deeplab_mobilenet_v2(input_size=129)
    p = init_params(g, seed=0, bn_stats="random")
    cfg = QuantConfig(quantize=True, relu=True, equalize=True, bits_bias=16)
    prep = prepare(g, p, cfg)
    return prep, lower_int8(prep)


@pytest.fixture(scope="module")
def ssd_int8():
    g = mobilenet_v2_ssd_lite(num_classes=21)
    p = init_params(g, seed=0, bn_stats="random")
    cfg = QuantConfig(
        quantize=True, relu=True, equalize=True, bits_bias=16,
        is_detection=True,
    )
    prep = prepare(g, p, cfg)
    return prep, lower_int8(prep)


def test_deeplab_lowers_aspp_and_head(deeplab_int8):
    prep, model = deeplab_int8
    # the dilated ASPP convs and the dilated backbone stage are lowered
    dilated = [
        n.name for n in prep.graph
        if n.op == "conv" and n.attrs["dilation"] != (1, 1)
    ]
    assert dilated, "expected dilated convs in DeepLab"
    missing = [n for n in dilated if n not in model.layers]
    assert missing == [], missing
    # nearly every conv runs int8 (only range-less layers stay f32)
    n_conv = sum(1 for n in prep.graph if n.op in ("conv", "linear"))
    assert len(model.layers) >= n_conv - 1, (len(model.layers), n_conv)


def test_deeplab_int8_engines_match_sim(deeplab_int8):
    prep, model = deeplab_int8
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        np.clip(rng.normal(0, 1, (1, 129, 129, 3)), -2.117, 2.64), jnp.float32
    )
    sim = np.asarray(
        jax.jit(
            lambda v: execute(
                prep.graph, prep.params, v, act_ranges=prep.act_ranges
            )
        )(x)
    )
    fp = np.asarray(
        jax.jit(lambda v: execute(prep.graph, prep.params_fp, v))(x)
    )
    base = np.asarray(jax.jit(lambda v: execute_int8(model, prep.params, v))(x))
    fused = np.asarray(
        jax.jit(lambda v: execute_int8_fused(model, prep.params, v))(x)
    )
    assert base.shape == sim.shape == (1, 129, 129, 21)
    assert np.isfinite(base).all() and np.isfinite(fused).all()
    # int8 engines (per-channel weights) track FP32 at least as well as
    # the per-tensor fake-quant simulation (same contract as the MNV2
    # classification test)
    err_sim = np.abs(sim - fp).mean()
    for name, out in (("int8", base), ("fused", fused)):
        err = np.abs(out - fp).mean()
        assert err < err_sim * 1.5, (name, err, err_sim)
    # per-pixel decisions: engines agree with each other and with sim on
    # a strong majority of pixels (quantization flips only near-ties)
    agree_engines = float(np.mean(base.argmax(-1) == fused.argmax(-1)))
    agree_sim = float(np.mean(base.argmax(-1) == sim.argmax(-1)))
    assert agree_engines >= 0.8, agree_engines
    assert agree_sim >= 0.8, agree_sim


def test_deeplab_chpad_bit_exact(deeplab_int8):
    """Zero-weight channel padding of lane-misaligned dense k3 convs
    (decoder Cin=304, ASPP Cin=320 — the CHPAD_r05.json 3.24x win) must
    be bit-identical to the unpadded path."""
    from dfq_tpu.engine.int8_fused import _chpad_target

    prep, model = deeplab_int8
    # the gate must actually fire on this graph (decoder 304 -> 384)
    hits = [
        n.name for n in prep.graph
        if n.op == "conv"
        and _chpad_target(n.attrs["in_ch"], n.attrs["kernel"], n.attrs["groups"])
    ]
    assert any("last_conv.0" in h for h in hits), hits
    rng = np.random.default_rng(3)
    x = jnp.asarray(
        np.clip(rng.normal(0, 1, (1, 129, 129, 3)), -2.117, 2.64), jnp.float32
    )
    off = np.asarray(
        jax.jit(
            lambda v: execute_int8_fused(model, prep.params, v, chpad_k3=False)
        )(x)
    )
    on = np.asarray(
        jax.jit(
            lambda v: execute_int8_fused(model, prep.params, v, chpad_k3=True)
        )(x)
    )
    np.testing.assert_array_equal(on, off)


def test_ssd_lowers_heads(ssd_int8):
    prep, model = ssd_int8
    # the conv-without-BN regression/classification heads ALL carry
    # ranges (case-d weight propagation through the lite heads' BN-less
    # dw+pw pairs, passes/range_setter.py; reference
    # utils/layer_transform.py:459-475) and ALL lower — the detection
    # int8 path has zero f32 fallbacks
    heads = [
        n.name for n in prep.graph
        if n.op == "conv" and (
            "classification_headers" in n.name or "regression_headers" in n.name
        )
    ]
    assert len(heads) >= 12, heads  # 6 feature maps x 2 heads
    no_range = [h for h in heads if f"{h}:in0" not in prep.act_ranges]
    assert no_range == [], no_range
    missing = [h for h in heads if h not in model.layers]
    assert missing == [], missing
    # and not only the heads: EVERY conv/linear in the SSD graph lowers
    all_cl = [n.name for n in prep.graph if n.op in ("conv", "linear")]
    assert sorted(model.layers) == sorted(all_cl)


def test_ssd_int8_engines_match_sim(ssd_int8):
    prep, model = ssd_int8
    rng = np.random.default_rng(1)
    x = jnp.asarray(
        np.clip(rng.normal(0, 0.5, (1, 300, 300, 3)), -1, 1), jnp.float32
    )
    sim_conf, sim_loc = jax.jit(
        lambda v: execute(prep.graph, prep.params, v, act_ranges=prep.act_ranges)
    )(x)
    conf_b, loc_b = jax.jit(lambda v: execute_int8(model, prep.params, v))(x)
    conf_f, loc_f = jax.jit(
        lambda v: execute_int8_fused(model, prep.params, v)
    )(x)
    sim_conf, sim_loc = np.asarray(sim_conf), np.asarray(sim_loc)
    for name, conf, loc in (
        ("int8", np.asarray(conf_b), np.asarray(loc_b)),
        ("fused", np.asarray(conf_f), np.asarray(loc_f)),
    ):
        assert conf.shape == (1, 3000, 21) and loc.shape == (1, 3000, 4), name
        assert np.isfinite(conf).all() and np.isfinite(loc).all(), name
        # test-mode softmax across classes survives the int8 path
        np.testing.assert_allclose(conf.sum(-1), 1.0, atol=1e-4)
        # confidences live on a [0,1] simplex: absolute tolerance of a
        # few quantization steps vs the simulator
        assert np.abs(conf - sim_conf).mean() < 0.05, name
        # box regressions: compare at activation-grid tolerance
        assert np.abs(loc - sim_loc).mean() < np.abs(sim_loc).mean() * 0.5, name


def test_deeplab_int8_multidevice_sharded(deeplab_int8):
    """Sharded seg eval: the int8 DeepLab forward partitioned over the
    8-device CPU mesh reproduces the single-device logits exactly."""
    from dfq_tpu.parallel import data_mesh, make_sharded_forward

    prep, model = deeplab_int8
    mesh = data_mesh()
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(0, 1, (8, 65, 65, 3)), jnp.float32)
    # 65 is stride-alignable: (65-1) % 4 == 0
    g65 = deeplab_mobilenet_v2(input_size=65)
    p65 = init_params(g65, seed=0, bn_stats="random")
    prep65 = prepare(
        g65, p65, QuantConfig(quantize=True, relu=True, equalize=True, bits_bias=16)
    )
    m65 = lower_int8(prep65)
    oracle = np.asarray(
        jax.jit(lambda v: execute_int8(m65, prep65.params, v))(x)
    )
    fwd = make_sharded_forward(
        prep65.graph, prep65.params, mesh, int8_model=m65, engine="int8"
    )
    with mesh:
        sharded = np.asarray(fwd(x))
    np.testing.assert_array_equal(sharded, oracle)


def test_int8_engines_handle_l2norm_and_permute():
    """Engine coverage for the remaining graph ops: l2norm (the SSD
    ScaledL2Norm extra) and permute_nchw (AlexNet's NCHW flatten) run
    through both int8 engines and match the simulator's f32 semantics at
    quant tolerance."""
    from dfq_tpu.graph.ir import GraphBuilder
    from dfq_tpu.models import init_params

    b = GraphBuilder()
    n = b.input("data")
    n = b.conv("c1", n, 3, 16, (3, 3), padding=(1, 1))
    n = b.bn("bn1", n, 16)
    n = b.relu("r1", n)
    n = b.l2norm("l2", n, 16)
    n = b.conv("c2", n, 16, 8, (1, 1))
    n = b.permute_nchw("pm", n, perm=(0, 1, 2, 3))
    n = b.reshape("rs", n, shape=(-1,))
    g = b.build([n])
    p = init_params(g, seed=0, bn_stats="random")
    prep = prepare(g, p, QuantConfig(quantize=True, relu=True))
    model = lower_int8(prep)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (2, 8, 8, 3)), jnp.float32)
    sim = np.asarray(
        jax.jit(
            lambda v: execute(g, prep.params, v, act_ranges=prep.act_ranges)
        )(x)
    )
    for fn in (execute_int8, execute_int8_fused):
        out = np.asarray(jax.jit(lambda v: fn(model, prep.params, v))(x))
        assert out.shape == sim.shape
        assert np.isfinite(out).all()
        # engine vs sim differ only by int8 rounding of the conv stack
        assert np.abs(out - sim).mean() < np.abs(sim).mean() * 0.25, fn.__name__


def test_int8_engine_runs_alexnet():
    """AlexNet through the true-int8 engine. The data-free range setter
    rejects BN-less conv chains (same restriction as the reference,
    layer_transform.py:330), so only the stem gets a manual range — the
    rest exercises the engine's f32 fallback path (big-kernel stem,
    permute_nchw flatten, dropout, linear head)."""
    from dfq_tpu.models import alexnet, init_params

    g = alexnet()
    p = init_params(g, seed=0, bn_stats="random")
    prep = prepare(g, p, QuantConfig(quantize=False))
    first_conv = next(n.name for n in prep.graph if n.op == "conv")
    prep.act_ranges = {f"{first_conv}:in0": (-2.2, 2.7)}
    model = lower_int8(prep)
    assert first_conv in model.layers
    x = jnp.asarray(
        np.random.default_rng(0).normal(0, 1, (1, 224, 224, 3)), jnp.float32
    )
    out = np.asarray(
        jax.jit(lambda v: execute_int8(model, prep.params, v))(x)
    )
    assert out.shape == (1, 1000) and np.isfinite(out).all()


@pytest.mark.parametrize("builder_name", ["xception", "drn"])
def test_int8_engine_runs_other_deeplab_backbones(builder_name):
    """The true-int8 engine executes the exotic DeepLab backbones too:
    Xception (separable-conv stacks) and DRN-D-54 (dilated residual
    stages) — lowering coverage beyond the MNV2 flagship."""
    from dfq_tpu.models import deeplab_drn, deeplab_xception

    build = deeplab_xception if builder_name == "xception" else deeplab_drn
    g = build(input_size=65)
    p = init_params(g, seed=0, bn_stats="random")
    prep = prepare(
        g, p, QuantConfig(quantize=True, relu=True, bits_bias=16)
    )
    model = lower_int8(prep)
    # a solid majority of convs lower (BN-less tails may stay f32)
    n_conv = sum(1 for n in prep.graph if n.op in ("conv", "linear"))
    assert len(model.layers) > n_conv * 0.8, (len(model.layers), n_conv)
    x = jnp.asarray(
        np.random.default_rng(0).normal(0, 1, (1, 65, 65, 3)), jnp.float32
    )
    out = np.asarray(
        jax.jit(lambda v: execute_int8(model, prep.params, v))(x)
    )
    assert out.shape == (1, 65, 65, 21)
    assert np.isfinite(out).all()
