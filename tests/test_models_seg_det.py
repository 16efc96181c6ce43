"""DeepLab-v3+ and SSD-Lite: structure, quantization pipeline coverage,
and detection post-processing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfq_tpu.detection import box_utils
from dfq_tpu.graph import execute
from dfq_tpu.graph.ir import quant_sites
from dfq_tpu.models import (
    SSDConfig,
    deeplab_mobilenet_v2,
    init_params,
    mobilenet_v2_ssd_lite,
)
from dfq_tpu.passes import create_relations, fold_batchnorm, set_quant_ranges
from dfq_tpu.pipeline import QuantConfig, prepare


# small input sizes keep CPU compiles fast; DeepLab supports any
# stride-alignable size
@pytest.fixture(scope="module")
def deeplab_small():
    g = deeplab_mobilenet_v2(input_size=129)
    p = init_params(g, seed=0, bn_stats="random")
    return g, p


@pytest.fixture(scope="module")
def ssd_graph():
    g = mobilenet_v2_ssd_lite(num_classes=21)
    p = init_params(g, seed=0, bn_stats="random")
    return g, p


def test_deeplab_builds_and_runs(deeplab_small):
    g, p = deeplab_small
    x = jnp.ones((1, 129, 129, 3))
    out = jax.jit(lambda pp, v: execute(g, pp, v))(p, x)
    assert out.shape == (1, 129, 129, 21)
    n_conv = sum(1 for n in g if n.op == "conv")
    # backbone 51 (stem + 2 + 16*3) + aspp 6 + decoder 4
    assert n_conv == 61
    assert sum(1 for n in g if n.op == "concat") == 2
    assert sum(1 for n in g if n.op == "interpolate") == 3


def test_deeplab_dilated_stage_shapes(deeplab_small):
    g, _ = deeplab_small
    # os16: blocks 14-17 run dilated (stride 1); dw convs carry dilation 2
    # in the 320-stage
    assert g["backbone.features.17.conv.3"].attrs["dilation"] == (2, 2)
    assert g["backbone.features.17.conv.3"].attrs["stride"] == (1, 1)
    assert g["backbone.features.14.conv.3"].attrs["dilation"] == (1, 1)
    # fixed_padding reflected as explicit pad nodes
    assert g["backbone.features.17.pad"].attrs["pads"] == (2, 2, 2, 2)


def test_deeplab_quant_pipeline_covers_all_sites(deeplab_small):
    g, p = deeplab_small
    cfg = QuantConfig(quantize=True, relu=True, equalize=True, bits_bias=16)
    prep = prepare(g, p, cfg)
    sites = quant_sites(prep.graph)
    missing = [s for s in sites if s not in prep.act_ranges]
    assert missing == [], missing
    x = jnp.ones((1, 129, 129, 3))
    out = jax.jit(
        lambda pp, v: execute(prep.graph, pp, v, act_ranges=prep.act_ranges)
    )(prep.params, x)
    assert bool(jnp.isfinite(out).all())


def test_deeplab_relations_stop_at_low_level_tap(deeplab_small):
    g, p = deeplab_small
    g2 = g.map_ops({"relu6": "relu"})
    gf, pf = fold_batchnorm(g2, init_params(g2, seed=1, bn_stats="random"))
    rels = create_relations(gf)
    # features.3 output (the residual add) has fanout 2 (decoder tap) ->
    # no relation from its pw-linear conv (conv.6) into block 4
    firsts = {r.first for r in rels}
    assert "backbone.features.3.conv.6" not in firsts
    assert "backbone.features.2.conv.0" in firsts
    assert len(rels) > 30


def test_ssd_builds_and_runs(ssd_graph):
    g, p = ssd_graph
    x = jnp.ones((1, 300, 300, 3))
    conf, loc = jax.jit(lambda pp, v: execute(g, pp, v))(p, x)
    assert conf.shape == (1, 3000, 21)
    assert loc.shape == (1, 3000, 4)
    # test-mode softmax
    np.testing.assert_allclose(np.asarray(conf).sum(-1), 1.0, atol=1e-5)


def test_ssd_priors():
    cfg = SSDConfig()
    assert cfg.priors.shape == (3000, 4)
    assert cfg.priors.min() >= 0.0 and cfg.priors.max() <= 1.0
    # parity with reference generator if importable
    import importlib.util
    import os
    import sys

    path = "/root/reference/utils/detection/box_utils.py"
    if not os.path.exists(path):
        pytest.skip("reference not available")
    torch = pytest.importorskip("torch")
    spec = importlib.util.spec_from_file_location("ref_box_utils", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_box_utils"] = mod
    spec.loader.exec_module(mod)
    specs = [
        mod.SSDSpec(19, 16, mod.SSDBoxSizes(60, 105), [2, 3]),
        mod.SSDSpec(10, 32, mod.SSDBoxSizes(105, 150), [2, 3]),
        mod.SSDSpec(5, 64, mod.SSDBoxSizes(150, 195), [2, 3]),
        mod.SSDSpec(3, 100, mod.SSDBoxSizes(195, 240), [2, 3]),
        mod.SSDSpec(2, 150, mod.SSDBoxSizes(240, 285), [2, 3]),
        mod.SSDSpec(1, 300, mod.SSDBoxSizes(285, 330), [2, 3]),
    ]
    ref = mod.generate_ssd_priors(specs, 300).numpy()
    np.testing.assert_allclose(cfg.priors, ref, atol=1e-6)


def test_ssd_quant_pipeline_detection_ranges(ssd_graph):
    g, p = ssd_graph
    cfg = QuantConfig(
        quantize=True, relu=True, equalize=True, bits_bias=16,
        delete_single=True, is_detection=True,
    )
    prep = prepare(g, p, cfg)
    # input range is the detection preprocessing range
    assert prep.act_ranges["base_net.0.0:in0"] == (-1.0, 1.0)
    sites = quant_sites(prep.graph)
    missing = [s for s in sites if s not in prep.act_ranges]
    assert missing == [], missing
    x = jnp.ones((2, 300, 300, 3))
    conf, loc = jax.jit(
        lambda pp, v: execute(prep.graph, pp, v, act_ranges=prep.act_ranges)
    )(prep.params, x)
    assert bool(jnp.isfinite(conf).all()) and bool(jnp.isfinite(loc).all())


def test_ssd_relations_delete_single(ssd_graph):
    g, p = ssd_graph
    g2 = g.map_ops({"relu6": "relu"})
    gf, pf = fold_batchnorm(g2, init_params(g2, seed=1, bn_stats="random"))
    all_rels = create_relations(gf, delete_single=False)
    chained = create_relations(gf, delete_single=True)
    assert len(chained) < len(all_rels)
    # every kept relation is part of a chain (reference relation.py:70-92)
    firsts = {r.first for r in chained}
    seconds = {r.second for r in chained}
    for r in chained:
        assert r.first in seconds or r.second in firsts


def test_box_decode_roundtrip():
    cfg = SSDConfig()
    rng = np.random.default_rng(0)
    boxes = np.abs(rng.normal(0.5, 0.1, (50, 4))).astype(np.float32)
    locs = box_utils.convert_boxes_to_locations(
        boxes, cfg.priors[:50], cfg.center_variance, cfg.size_variance
    )
    back = box_utils.convert_locations_to_boxes(
        locs, cfg.priors[:50], cfg.center_variance, cfg.size_variance
    )
    np.testing.assert_allclose(back, boxes, atol=1e-5)


def test_hard_nms_suppresses_overlaps():
    boxes = np.array(
        [
            [0.0, 0.0, 1.0, 1.0, 0.9],
            [0.05, 0.05, 1.0, 1.0, 0.8],  # heavy overlap with first
            [2.0, 2.0, 3.0, 3.0, 0.7],
        ],
        np.float32,
    )
    kept = box_utils.hard_nms(boxes, iou_threshold=0.5)
    assert kept.shape[0] == 2
    assert kept[0, 4] == pytest.approx(0.9)
    assert kept[1, 4] == pytest.approx(0.7)


def test_iou_parity_with_reference():
    import importlib.util
    import os
    import sys

    path = "/root/reference/utils/detection/box_utils.py"
    if not os.path.exists(path):
        pytest.skip("reference not available")
    torch = pytest.importorskip("torch")
    mod = sys.modules.get("ref_box_utils")
    if mod is None:
        spec = importlib.util.spec_from_file_location("ref_box_utils", path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules["ref_box_utils"] = mod
        spec.loader.exec_module(mod)
    rng = np.random.default_rng(1)
    a = np.sort(rng.uniform(0, 1, (20, 4)).astype(np.float32), axis=-1)
    b = np.sort(rng.uniform(0, 1, (20, 4)).astype(np.float32), axis=-1)
    ours = box_utils.iou_of(a, b)
    ref = mod.iou_of(torch.from_numpy(a), torch.from_numpy(b)).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_ap_metrics():
    from dfq_tpu.metrics import (
        compute_average_precision,
        compute_voc2007_average_precision,
    )

    precision = np.array([1.0, 1.0, 0.67, 0.75, 0.6])
    recall = np.array([0.2, 0.4, 0.4, 0.6, 0.6])
    ap12 = compute_average_precision(precision, recall)
    ap07 = compute_voc2007_average_precision(precision, recall)
    assert 0.0 < ap07 <= 1.0 and 0.0 < ap12 <= 1.0
    # perfect detector
    assert compute_average_precision(np.ones(5), np.linspace(0.2, 1, 5)) == (
        pytest.approx(1.0)
    )


def test_ssd_variant_family_builds():
    """MobileNetV1-SSD / -Lite and VGG16-SSD (reference
    mobilenetv1_ssd.py, mobilenetv1_ssd_lite.py, vgg_ssd.py)."""
    import jax

    from dfq_tpu.models import (
        mobilenet_v1_ssd,
        mobilenet_v1_ssd_lite,
        vgg16_ssd,
        vgg_ssd_config,
    )

    for fn, n_priors in [
        (mobilenet_v1_ssd, 3000),
        (mobilenet_v1_ssd_lite, 3000),
        (vgg16_ssd, 8732),
    ]:
        g = fn(num_classes=21)
        p = init_params(g, seed=0, bn_stats="random")
        conf, loc = jax.jit(lambda pp, v, gg=g: execute(gg, pp, v))(
            p, jnp.ones((1, 300, 300, 3))
        )
        assert conf.shape == (1, n_priors, 21)
        assert loc.shape == (1, n_priors, 4)
    assert vgg_ssd_config().priors.shape == (8732, 4)


def test_vgg_priors_parity_with_reference():
    import importlib.util
    import os
    import sys

    path = "/root/reference/utils/detection/box_utils.py"
    if not os.path.exists(path):
        pytest.skip("reference not available")
    pytest.importorskip("torch")
    mod = sys.modules.get("ref_box_utils")
    if mod is None:
        spec = importlib.util.spec_from_file_location("ref_box_utils", path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules["ref_box_utils"] = mod
        spec.loader.exec_module(mod)
    from dfq_tpu.models import vgg_ssd_config

    specs = [
        mod.SSDSpec(38, 8, mod.SSDBoxSizes(30, 60), [2]),
        mod.SSDSpec(19, 16, mod.SSDBoxSizes(60, 111), [2, 3]),
        mod.SSDSpec(10, 32, mod.SSDBoxSizes(111, 162), [2, 3]),
        mod.SSDSpec(5, 64, mod.SSDBoxSizes(162, 213), [2, 3]),
        mod.SSDSpec(3, 100, mod.SSDBoxSizes(213, 264), [2]),
        mod.SSDSpec(1, 300, mod.SSDBoxSizes(264, 315), [2]),
    ]
    ref = mod.generate_ssd_priors(specs, 300).numpy()
    np.testing.assert_allclose(vgg_ssd_config().priors, ref, atol=1e-6)


def test_mb1_ssd_data_free_ranges_unsupported_like_reference():
    """MobileNetV1-SSD's extras/heads stack BN-less convs, which the
    data-free range setter cannot handle — matching the reference, whose
    find_prev_bn asserts on multiple no-BN convs per branch
    (layer_transform.py:330). Distilled-range calibration covers it."""
    from dfq_tpu.models import mobilenet_v1_ssd

    g = mobilenet_v1_ssd(num_classes=21)
    p = init_params(g, seed=1, bn_stats="random")
    cfg = QuantConfig(
        quantize=True, relu=True, equalize=True, bits_bias=16,
        delete_single=True, is_detection=True,
    )
    with pytest.raises(AssertionError, match="without BatchNorm"):
        prepare(g, p, cfg)

    # the distilled-data path has no such restriction
    from dfq_tpu.calib import calibrate_ranges
    from dfq_tpu.passes import fold_batchnorm

    g2 = g.map_ops({"relu6": "relu"})
    gf, pf = fold_batchnorm(g2, p)
    rng = np.random.default_rng(0)
    batches = [rng.uniform(-1, 1, (2, 300, 300, 3)).astype(np.float32)]
    ranges = calibrate_ranges(gf, pf, batches, is_detection=True)
    sites = quant_sites(gf)
    assert set(ranges) == set(sites)


def test_deeplab_resnet101_builds_and_runs():
    import jax

    from dfq_tpu.models import deeplab_resnet101

    g = deeplab_resnet101(input_size=65)
    p = init_params(g, seed=0, bn_stats="random")
    out = jax.jit(lambda pp, v: execute(g, pp, v))(p, jnp.ones((1, 65, 65, 3)))
    assert out.shape == (1, 65, 65, 21)
    # ResNet-101: 1 stem + 33 bottlenecks*3 + 4 downsamples + aspp 6 + dec 4
    n_conv = sum(1 for n in g if n.op == "conv")
    assert n_conv == 1 + 33 * 3 + 4 + 6 + 4
    # multi-grid dilations in layer4 at os16: 2, 4, 8
    assert g["backbone.layer4.0.conv2"].attrs["dilation"] == (2, 2)
    assert g["backbone.layer4.1.conv2"].attrs["dilation"] == (4, 4)
    assert g["backbone.layer4.2.conv2"].attrs["dilation"] == (8, 8)


def test_squeezenet_and_fpn_ssd_variants():
    import jax

    from dfq_tpu.models import (
        fpn_mobilenet_v1_ssd,
        squeezenet_ssd_config,
        squeezenet_ssd_lite,
    )

    g = squeezenet_ssd_lite(21)
    p = init_params(g, seed=0, bn_stats="random")
    conf, loc = jax.jit(lambda pp, v: execute(g, pp, v))(
        p, jnp.ones((1, 300, 300, 3))
    )
    # 17/10/5/3/2/1 grids x 6 priors = 2568 (squeezenet_ssd_config.py)
    assert conf.shape == (1, 2568, 21)
    assert squeezenet_ssd_config().priors.shape == (2568, 4)
    # Fire modules create quantized concat sites
    assert any(n.op == "concat" and "base_net" in n.name for n in g)

    g2 = fpn_mobilenet_v1_ssd(21)
    p2 = init_params(g2, seed=0, bn_stats="random")
    conf2, loc2 = jax.jit(lambda pp, v: execute(g2, pp, v))(
        p2, jnp.ones((1, 300, 300, 3))
    )
    assert conf2.shape == (1, 3000, 21)
    # top-down adds exist at every pyramid level
    assert sum(1 for n in g2 if n.op == "add" and n.name.startswith("fpn_add")) == 5


def test_deeplab_xception_and_drn_build():
    import jax

    from dfq_tpu.models import deeplab_drn, deeplab_xception

    for fn, n_conv_min in [(deeplab_xception, 130), (deeplab_drn, 60)]:
        g = fn(input_size=65)
        p = init_params(g, seed=0, bn_stats="random")
        out = jax.jit(lambda pp, v, gg=g: execute(gg, pp, v))(
            p, jnp.ones((1, 65, 65, 3))
        )
        assert out.shape == (1, 65, 65, 21)
        assert sum(1 for n in g if n.op == "conv") >= n_conv_min


def test_multibox_loss_and_match_prior():
    import jax.numpy as jnp2

    from dfq_tpu.detection.losses import MatchPrior, multibox_loss
    from dfq_tpu.models import SSDConfig

    cfg = SSDConfig()
    matcher = MatchPrior(cfg.priors, cfg.center_variance, cfg.size_variance,
                         cfg.iou_threshold)
    gt_boxes = np.array([[0.1, 0.1, 0.4, 0.5], [0.5, 0.5, 0.9, 0.9]], np.float32)
    gt_labels = np.array([3, 7])
    locations, labels = matcher(gt_boxes, gt_labels)
    assert locations.shape == (3000, 4)
    assert labels.shape == (3000,)
    assert set(np.unique(labels)) <= {0, 3, 7}
    assert (labels > 0).sum() >= 2  # every target matched at least once

    rng = np.random.default_rng(0)
    conf = jnp2.asarray(rng.normal(0, 1, (2, 3000, 21)), jnp2.float32)
    pred_loc = jnp2.asarray(rng.normal(0, 1, (2, 3000, 4)), jnp2.float32)
    lab = jnp2.asarray(np.stack([labels, labels]))
    gt_loc = jnp2.asarray(np.stack([locations, locations]))
    l1, ce = multibox_loss(conf, pred_loc, lab, gt_loc)
    assert np.isfinite(float(l1)) and np.isfinite(float(ce))
    assert float(ce) > 0 and float(l1) > 0
