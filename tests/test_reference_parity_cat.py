"""Reference parity on DeepLab/SSD-style cat + interpolate topologies —
against the ACTUAL reference code, including a fake-quant forward
through the reference's real ``replace_op`` monkey-patching.

Graph A (ASPP-like; correction exercised):

    c1 -> b1 -> r1 --+--> c2 -> b2 -> r2 --------------------+
                     +--> avgpool -> c3 -> b3 -> r3 ->       |
                              F.interpolate -----------------+-> cat -> c4

exercises the concat range merge (``set_quant_minmax``,
``utils/layer_transform.py:554-556``), the ``F.interpolate`` quant
site, and cat-aware bias correction (``dfq.py:244-274``).

Graph B (SSD-head-like; range setting only):

    c1 -> b1 -> r1 --+--> c2 -> b2 -> r2 --+-> cat  (graph output)
                     +--> c5 (no BN) ------+

exercises case (d) — conv-without-BN range propagation through the
layer's own weights (``utils/layer_transform.py:459-475``).  NB the
reference's ``bias_correction`` CRASHES on a targ layer fed by such a
cat (it walks to the wrong-width BN, ``dfq.py:287``) — the reference
never runs that path, so neither graph asks it to.

Skipped when the reference tree is absent.
"""

import inspect
import os
import sys
from collections import OrderedDict

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not available"
)

H = W = 16


@pytest.fixture(scope="module")
def ref_mods():
    torch = pytest.importorskip("torch")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import importlib

    return (
        torch,
        importlib.import_module("utils.quantize"),
        importlib.import_module("utils.layer_transform"),
        importlib.import_module("dfq"),
    )


def _make_layers(torch, ref_quantize, rng):
    QuantNConv2d = ref_quantize.QuantNConv2d

    def conv(i, o, k, pad=0, bias=False):
        c = QuantNConv2d(i, o, k, padding=pad, bias=bias)
        wv = rng.normal(0, 0.5, (o, i, k, k)).astype(np.float32)
        c.weight.data.copy_(torch.from_numpy(wv))
        if bias:
            bv = rng.normal(0, 0.2, o).astype(np.float32)
            c.bias.data.copy_(torch.from_numpy(bv))
        return c

    def bn(c):
        b = torch.nn.BatchNorm2d(c)
        b.weight.data.copy_(torch.from_numpy(rng.lognormal(0, 0.4, c).astype(np.float32)))
        b.bias.data.copy_(torch.from_numpy(rng.normal(0.4, 0.4, c).astype(np.float32)))
        b.running_mean.copy_(torch.from_numpy(rng.normal(0, 0.2, c).astype(np.float32)))
        b.running_var.copy_(torch.from_numpy(rng.lognormal(0, 0.4, c).astype(np.float32)))
        b.eval()
        return b

    return conv, bn


def _draw_params(rng2, spec):
    params = {}
    for name, kind, args in spec:
        if kind == "conv":
            i, o, k, bias = args
            params[name] = {
                "weight": rng2.normal(0, 0.5, (o, i, k, k)).astype(np.float32)
            }
            if bias:
                params[name]["bias"] = rng2.normal(0, 0.2, o).astype(np.float32)
        else:
            (c,) = args
            params[name] = {
                "gamma": rng2.lognormal(0, 0.4, c).astype(np.float32),
                "beta": rng2.normal(0.4, 0.4, c).astype(np.float32),
                "mean": rng2.normal(0, 0.2, c).astype(np.float32),
                "var": rng2.lognormal(0, 0.4, c).astype(np.float32),
            }
    return params


# ---------------------------------------------------------------------------
# Graph A — ASPP-like: cat of two BN branches + interpolate, with correction


@pytest.fixture(scope="module")
def aspp_pipelines(ref_mods):
    torch, ref_quantize, ref_lt, ref_dfq = ref_mods
    import torch.nn.functional as F

    rng = np.random.default_rng(11)
    conv, bn = _make_layers(torch, ref_quantize, rng)

    class CatNet(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.c1, self.b1 = conv(3, 8, 3, pad=1), bn(8)
            self.r1 = torch.nn.ReLU()
            self.c2, self.b2 = conv(8, 8, 3, pad=1), bn(8)
            self.r2 = torch.nn.ReLU()
            self.pool = torch.nn.AvgPool2d(2)
            self.c3, self.b3 = conv(8, 8, 1), bn(8)
            self.r3 = torch.nn.ReLU()
            self.c4 = conv(16, 6, 1)

        def forward(self, x):
            x = self.r1(self.b1(self.c1(x)))
            a = self.r2(self.b2(self.c2(x)))
            b = self.r3(self.b3(self.c3(self.pool(x))))
            b = F.interpolate(b, size=(H, W), mode="bilinear", align_corners=True)
            y = torch.cat([a, b], 1)
            return self.c4(y)

    model = CatNet()
    model.eval()

    src, first = inspect.getsourcelines(CatNet.forward)
    ln_interp = first + next(i for i, l in enumerate(src) if "F.interpolate" in l)
    ln_cat = first + next(i for i, l in enumerate(src) if "torch.cat" in l)
    interp_op = f"F_interpolate_{ln_interp}_1"
    cat_op = f"torch_cat_{ln_cat}_2"

    graph_t = OrderedDict(
        [
            ("c1", model.c1), ("b1", model.b1), ("r1", model.r1),
            ("c2", model.c2), ("b2", model.b2), ("r2", model.r2),
            ("pool", model.pool),
            ("c3", model.c3), ("b3", model.b3), ("r3", model.r3),
            ("interp_1", interp_op),
            ("cat_1", cat_op),
            ("c4", model.c4),
        ]
    )
    bottoms = {
        "c1": ["Data"], "b1": ["c1"], "r1": ["b1"],
        "c2": ["r1"], "b2": ["c2"], "r2": ["b2"],
        "pool": ["r1"], "c3": ["pool"], "b3": ["c3"], "r3": ["b3"],
        "interp_1": ["r3"],
        "cat_1": ["r2", "interp_1"],
        "c4": ["cat_1"],
    }
    qms = [ref_quantize.QuantMeasure(num_bits=8) for _ in range(3)]
    ref_lt.module_tensor_op = ref_lt.CustomTensorOP(
        qms, [(interp_op, interp_op), (cat_op, cat_op)]
    )
    model.add_module("custom_tensor_op", ref_lt.module_tensor_op)
    model.eval()

    targ = [ref_quantize.QuantNConv2d]
    ref_lt.merge_batchnorm(model, graph_t, bottoms, targ)
    ref_dfq.bias_correction(graph_t, bottoms, targ, bits_weight=8)
    graph_t = ref_lt.quantize_targ_layer(graph_t, 8, 16, targ)
    ref_lt.set_quant_minmax(graph_t, bottoms, verbose=False)

    # ---- ours, same weights
    from dfq_tpu.graph.ir import GraphBuilder
    from dfq_tpu.passes import bias_correction, fold_batchnorm, set_quant_ranges
    from dfq_tpu.passes.weight_quant import quantize_layer_weights

    rng2 = np.random.default_rng(11)
    params = _draw_params(rng2, [
        ("c1", "conv", (3, 8, 3, False)), ("b1", "bn", (8,)),
        ("c2", "conv", (8, 8, 3, False)), ("b2", "bn", (8,)),
        ("c3", "conv", (8, 8, 1, False)), ("b3", "bn", (8,)),
        ("c4", "conv", (16, 6, 1, False)),
    ])

    b = GraphBuilder()
    x = b.input("data")
    x = b.conv("c1", x, 3, 8, (3, 3), padding=(1, 1))
    x = b.bn("b1", x, 8)
    x = b.relu("r1", x)
    a = b.conv("c2", x, 8, 8, (3, 3), padding=(1, 1))
    a = b.bn("b2", a, 8)
    a = b.relu("r2", a)
    p = b.avgpool("pool", x, window=(2, 2))
    p = b.conv("c3", p, 8, 8, (1, 1))
    p = b.bn("b3", p, 8)
    p = b.relu("r3", p)
    p = b.interpolate("interp_1", p, size=(H, W), mode="bilinear",
                      align_corners=True)
    y = b.concat("cat_1", [a, p])
    y = b.conv("c4", y, 16, 6, (1, 1))
    g = b.build([y])

    gf, pf = fold_batchnorm(g, params)
    pc = bias_correction(gf, pf, bits_weight=8)
    pq = quantize_layer_weights(gf, pc, bits_weight=8, bits_bias=16)
    ranges = set_quant_ranges(gf, pq)

    return torch, ref_lt, model, graph_t, qms, gf, pq, ranges


def test_cat_graph_ranges_match(aspp_pipelines):
    torch, ref_lt, model, graph_t, qms, gf, pq, ranges = aspp_pipelines
    # conv sites (c4's input exercises the cat min/max merge)
    for name in ("c1", "c2", "c3", "c4"):
        qm = graph_t[name].quant
        lo, hi = ranges[f"{name}:in0"]
        assert lo == pytest.approx(float(qm.running_min), rel=1e-3, abs=1e-4), name
        assert hi == pytest.approx(float(qm.running_max), rel=1e-3, abs=1e-4), name
    # tensor-op sites: interpolate (1 qm) then cat (2 qms)
    lo, hi = ranges["interp_1:in0"]
    assert lo == pytest.approx(float(qms[0].running_min), rel=1e-3, abs=1e-4)
    assert hi == pytest.approx(float(qms[0].running_max), rel=1e-3, abs=1e-4)
    for i in range(2):
        lo, hi = ranges[f"cat_1:in{i}"]
        assert lo == pytest.approx(float(qms[1 + i].running_min), rel=1e-3, abs=1e-4), i
        assert hi == pytest.approx(float(qms[1 + i].running_max), rel=1e-3, abs=1e-4), i


def test_cat_graph_corrected_weights_match(aspp_pipelines):
    torch, ref_lt, model, graph_t, qms, gf, pq, ranges = aspp_pipelines
    for name in ("c1", "c2", "c3", "c4"):
        np.testing.assert_allclose(
            pq[name]["weight"], graph_t[name].weight.detach().numpy(),
            rtol=1e-4, atol=1e-5, err_msg=name,
        )
        if graph_t[name].bias is not None:
            np.testing.assert_allclose(
                pq[name]["bias"], graph_t[name].bias.detach().numpy(),
                rtol=1e-3, atol=2e-4, err_msg=name,
            )


def test_cat_graph_forward_matches(aspp_pipelines):
    torch, ref_lt, model, graph_t, qms, gf, pq, ranges = aspp_pipelines
    import jax
    from dfq_tpu.graph.executor import execute

    rng = np.random.default_rng(4)
    x = np.clip(rng.normal(0, 1, (2, H, W, 3)), -2.11790393, 2.64).astype(
        np.float32
    )
    for m in model.modules():
        if hasattr(m, "update_stat"):
            m.update_stat = False
    ref_lt.replace_op()
    try:
        with torch.no_grad():
            ref = model(
                torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))
            ).numpy().transpose(0, 2, 3, 1)
    finally:
        ref_lt.restore_op()

    ours = np.asarray(
        jax.jit(lambda v: execute(gf, pq, v, act_ranges=ranges))(x)
    )
    assert ours.shape == ref.shape
    diff = np.abs(ours - ref)
    scale = np.abs(ref).mean() + 1e-12
    # shallow graph: only isolated rounding-boundary flips possible
    assert diff.mean() / scale < 2e-3, diff.mean() / scale


# ---------------------------------------------------------------------------
# Graph B — SSD-head-like: conv without BN into a cat (case d)


def test_case_d_conv_without_bn_ranges_match(ref_mods):
    torch, ref_quantize, ref_lt, ref_dfq = ref_mods
    rng = np.random.default_rng(21)
    conv, bn = _make_layers(torch, ref_quantize, rng)

    c1, b1 = conv(3, 8, 3, pad=1), bn(8)
    r1 = torch.nn.ReLU()
    c2, b2 = conv(8, 4, 1), bn(4)
    r2 = torch.nn.ReLU()
    c5 = conv(8, 4, 1, bias=True)  # no BN: the SSD detection head

    graph_t = OrderedDict(
        [
            ("c1", c1), ("b1", b1), ("r1", r1),
            ("c2", c2), ("b2", b2), ("r2", r2),
            ("c5", c5),
            ("cat_1", "torch_cat_0_2"),
        ]
    )
    bottoms = {
        "c1": ["Data"], "b1": ["c1"], "r1": ["b1"],
        "c2": ["r1"], "b2": ["c2"], "r2": ["b2"],
        "c5": ["r1"],
        "cat_1": ["r2", "c5"],
    }
    qms = [ref_quantize.QuantMeasure(num_bits=8) for _ in range(2)]
    ref_lt.module_tensor_op = ref_lt.CustomTensorOP(
        qms, [("torch_cat_0_2", "torch_cat_0_2")]
    )
    for m in (c1, b1, c2, b2, c5):
        m.eval()
    for q in qms:
        q.eval()

    targ = [ref_quantize.QuantNConv2d]
    ref_lt.merge_batchnorm(None, graph_t, bottoms, targ)
    graph_t = ref_lt.quantize_targ_layer(graph_t, 8, 16, targ)
    ref_lt.set_quant_minmax(graph_t, bottoms, verbose=False)

    # ---- ours
    from dfq_tpu.graph.ir import GraphBuilder
    from dfq_tpu.passes import fold_batchnorm, set_quant_ranges
    from dfq_tpu.passes.weight_quant import quantize_layer_weights

    rng2 = np.random.default_rng(21)
    params = _draw_params(rng2, [
        ("c1", "conv", (3, 8, 3, False)), ("b1", "bn", (8,)),
        ("c2", "conv", (8, 4, 1, False)), ("b2", "bn", (4,)),
        ("c5", "conv", (8, 4, 1, True)),
    ])
    b = GraphBuilder()
    x = b.input("data")
    x = b.conv("c1", x, 3, 8, (3, 3), padding=(1, 1))
    x = b.bn("b1", x, 8)
    x = b.relu("r1", x)
    a = b.conv("c2", x, 8, 4, (1, 1))
    a = b.bn("b2", a, 4)
    a = b.relu("r2", a)
    d = b.conv("c5", x, 8, 4, (1, 1), bias=True)
    y = b.concat("cat_1", [a, d])
    g = b.build([y])

    gf, pf = fold_batchnorm(g, params)
    pq = quantize_layer_weights(gf, pf, bits_weight=8, bits_bias=16)
    ranges = set_quant_ranges(gf, pq)

    for name in ("c1", "c2", "c5"):
        qm = graph_t[name].quant
        lo, hi = ranges[f"{name}:in0"]
        assert lo == pytest.approx(float(qm.running_min), rel=1e-3, abs=1e-4), name
        assert hi == pytest.approx(float(qm.running_max), rel=1e-3, abs=1e-4), name
    # the cat's c5 branch carries the case-(d) propagated range
    for i in range(2):
        lo, hi = ranges[f"cat_1:in{i}"]
        assert lo == pytest.approx(float(qms[i].running_min), rel=1e-3, abs=1e-4), i
        assert hi == pytest.approx(float(qms[i].running_max), rel=1e-3, abs=1e-4), i
