"""Coverage for the remaining untested modules: the roofline accounting
(`utils/profiling`), the learned-scale refinement (`passes/learned_scale`
— the reference's `update_scale` experiment, improve_dfq.py:193-278),
and the SSD `Predictor` driven directly (predictor.py)."""

import numpy as np
import pytest

from dfq_tpu.graph.ir import GraphBuilder
from dfq_tpu.models import init_params


def _chain():
    b = GraphBuilder()
    x = b.input("data")
    x = b.conv("c1", x, 3, 8, (3, 3), padding=(1, 1))
    x = b.bn("b1", x, 8)
    x = b.relu("r1", x)
    x = b.conv("c2", x, 8, 4, (1, 1))
    g = b.build([x])
    return g


def test_layer_costs_and_roofline():
    from dfq_tpu.utils.profiling import layer_costs, roofline_report

    g = _chain()
    costs = layer_costs(g, batch=2, input_size=16, act_bytes=1, weight_bytes=1)
    by_name = {c["name"]: c for c in costs}
    # c1: 2 * N*H*W*Cout*Cin*K*K MACs at 16x16 (stride 1, pad 1)
    assert by_name["c1"]["flops"] == 2 * 2 * 16 * 16 * 8 * 3 * 3 * 3
    assert by_name["c1"]["kind"] == "conv"
    assert by_name["c2"]["kind"] == "pw"
    # c2 bytes: in + out activations (int8) + weights
    assert by_name["c2"]["bytes"] == 2 * 16 * 16 * 8 + 2 * 16 * 16 * 4 + 8 * 4

    rep = roofline_report(g, batch=2, input_size=16)
    assert rep["total_flops"] == sum(c["flops"] for c in costs)
    assert rep["bound"] in ("compute", "memory")
    assert rep["sol_images_per_s"] > 0
    rep2 = roofline_report(g, batch=2, input_size=16, measured_time_s=1.0)
    assert 0 < rep2["sol_fraction"] <= 1.0 or rep2["sol_fraction"] > 0
    # per-layer sum is a tighter (>=) bound than the aggregate max:
    # sum_l max(tc_l, tm_l) >= max(sum tc, sum tm)
    assert rep["t_sol_peak_s"] >= rep["t_sol_aggregate_s"] * (1 - 1e-9)
    assert rep["t_sol_s"] >= rep["t_sol_peak_s"] * (1 - 1e-9)
    assert all("t_sol_s" in c and "bound" in c for c in rep["layers"])
    # calibration override plumbs through
    rep3 = roofline_report(
        g, batch=2, input_size=16, measured_rates={"mxu_int8_eff": 1e12}
    )
    assert rep3["t_sol_s"] > rep["t_sol_s"]

    # achievable (lane-padded) bound: physical bytes >= logical bytes,
    # so the achievable bound is never faster than the logical one;
    # narrow-channel layers (C=8/4 here vs 128 lanes) inflate hard
    assert rep["total_bytes_padded"] >= rep["total_bytes"]
    assert (
        rep["sol_achievable_images_per_s"] <= rep["sol_images_per_s"] + 1e-9
    )
    c2 = {c["name"]: c for c in rep["layers"]}["c2"]
    assert c2["bytes_padded"] > 5 * c2["bytes"]  # C=8->128, C=4->128
    assert c2["t_achievable_s"] >= c2["t_sol_s"] * (1 - 1e-9)
    # the top-level bound label derives from the per-layer terms
    assert 0.0 <= rep["memory_bound_time_fraction"] <= 1.0
    expect = "memory" if rep["memory_bound_time_fraction"] >= 0.5 else "compute"
    assert rep["bound"] == expect


def test_learn_scales_refines_without_degrading():
    import jax

    from dfq_tpu.graph.executor import execute
    from dfq_tpu.passes import create_relations, fold_batchnorm
    from dfq_tpu.passes.learned_scale import learn_scales

    g = _chain()
    params = init_params(g, seed=3, bn_stats="random")
    gf, pf = fold_batchnorm(g, params)
    rels = [r for r in create_relations(gf) if r.bn is not None]
    assert rels, "chain must produce an equalizable relation"

    rng = np.random.default_rng(0)
    batches = [
        np.clip(rng.normal(0, 1, (2, 16, 16, 3)), -2.117, 2.64).astype(
            np.float32
        )
        for _ in range(2)
    ]
    merged, act_ranges, history = learn_scales(
        gf, pf, rels, batches, num_epoch=2, lr=1e-3
    )
    assert len(history) >= 1 and np.isfinite(history).all()
    # ranges re-derived for every site
    assert "c1:in0" in act_ranges and "c2:in0" in act_ranges
    # scale-merge must preserve the FP32 function (equalization invariance)
    x = batches[0]
    ref = np.asarray(jax.jit(lambda v: execute(gf, pf, v))(x))
    got = np.asarray(jax.jit(lambda v: execute(gf, merged, v))(x))
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-3)


def test_predictor_decodes_and_nms():
    from dfq_tpu.detection.predictor import Predictor
    from dfq_tpu.detection import box_utils
    from dfq_tpu.models.ssd import SSDConfig

    config = SSDConfig()
    n_priors = config.priors.shape[0]

    conf = np.zeros((1, n_priors, 21), np.float32)
    conf[..., 0] = 1.0  # background everywhere
    # two overlapping confident detections of class 1 on priors 0, 1 and
    # one of class 2 on prior 10
    for pi, cls, p in ((0, 1, 0.9), (1, 1, 0.8), (10, 2, 0.7)):
        conf[0, pi] = 0.0
        conf[0, pi, cls] = p
        conf[0, pi, 0] = 1.0 - p
    loc = np.zeros((1, n_priors, 4), np.float32)  # boxes == priors

    pred = Predictor(
        lambda x: (conf, loc), config, filter_threshold=0.5,
        iou_threshold=0.45,
    )
    image = np.zeros((120, 200, 3), np.uint8)
    boxes, labels, probs = pred.predict(image)
    assert boxes.shape[1] == 4 and len(labels) == len(probs) == len(boxes)
    assert set(labels.tolist()) == {1, 2}
    # the class-1 pair: if the priors overlap beyond IoU 0.45 NMS keeps
    # one, else both — but the top prob must survive
    assert probs.max() == pytest.approx(0.9)
    # decoded box for prior 10, scaled to pixel coordinates
    corner = box_utils.center_form_to_corner_form(config.priors[10:11])[0]
    k = int(np.argmax(labels == 2))
    np.testing.assert_allclose(
        boxes[k], corner * [200, 120, 200, 120], rtol=1e-5, atol=1e-3
    )
