"""End-to-end numerical parity against the ACTUAL reference implementation.

The reference's graph passes operate on plain ``OrderedDict`` graphs +
bottoms maps (the missing PyTransformer submodule only *builds* those
structures), so for a linear CNN we can construct them by hand, run the
real reference code (torch) and our passes on identical weights, and
compare every intermediate:

    BN fold -> relations -> cross-layer equalization -> bias absorption
    -> bias correction -> data-free activation ranges

This is the strongest available oracle: not a re-derivation of formulas
but the reference functions themselves (``/root/reference/dfq.py``,
``utils/layer_transform.py``, ``utils/relation.py``).

Skipped when the reference tree is absent.
"""

import os
import sys
from collections import OrderedDict

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not available"
)


@pytest.fixture(scope="module")
def ref_modules():
    torch = pytest.importorskip("torch")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import importlib

    ref_quantize = importlib.import_module("utils.quantize")
    ref_lt = importlib.import_module("utils.layer_transform")
    ref_relation = importlib.import_module("utils.relation")
    ref_dfq = importlib.import_module("dfq")
    return torch, ref_quantize, ref_lt, ref_relation, ref_dfq


def _build_torch_chain(torch, ref_quantize, seed=0):
    """conv -> bn -> relu -> dwconv -> bn -> relu -> pwconv -> bn -> relu
    -> conv (the canonical equalizable chain incl. depthwise)."""
    rng = np.random.default_rng(seed)
    QuantNConv2d = ref_quantize.QuantNConv2d

    def conv(i, o, k, groups=1, pad=0):
        c = QuantNConv2d(i, o, k, padding=pad, groups=groups, bias=False)
        w = rng.normal(0, 0.5, (o, i // groups, k, k)).astype(np.float32)
        c.weight.data.copy_(torch.from_numpy(w))
        return c

    def bn(c):
        b = torch.nn.BatchNorm2d(c)
        b.weight.data.copy_(
            torch.from_numpy(rng.lognormal(0, 0.5, c).astype(np.float32))
        )
        b.bias.data.copy_(
            torch.from_numpy(rng.normal(0.5, 0.5, c).astype(np.float32))
        )
        b.running_mean.copy_(
            torch.from_numpy(rng.normal(0, 0.2, c).astype(np.float32))
        )
        b.running_var.copy_(
            torch.from_numpy(rng.lognormal(0, 0.5, c).astype(np.float32))
        )
        b.eval()
        return b

    graph = OrderedDict(
        [
            ("c1", conv(3, 8, 3, pad=1)),
            ("b1", bn(8)),
            ("r1", torch.nn.ReLU()),
            ("c2", conv(8, 8, 3, groups=8, pad=1)),
            ("b2", bn(8)),
            ("r2", torch.nn.ReLU()),
            ("c3", conv(8, 16, 1)),
            ("b3", bn(16)),
            ("r3", torch.nn.ReLU()),
            ("c4", conv(16, 4, 3, pad=1)),
        ]
    )
    bottoms = {
        "c1": ["Data"], "b1": ["c1"], "r1": ["b1"], "c2": ["r1"],
        "b2": ["c2"], "r2": ["b2"], "c3": ["r2"], "b3": ["c3"],
        "r3": ["b3"], "c4": ["r3"],
    }
    return graph, bottoms


def _build_our_chain(torch_graph):
    from dfq_tpu.graph.ir import GraphBuilder

    b = GraphBuilder()
    x = b.input("data")
    x = b.conv("c1", x, 3, 8, (3, 3), padding=(1, 1))
    x = b.bn("b1", x, 8)
    x = b.relu("r1", x)
    x = b.conv("c2", x, 8, 8, (3, 3), padding=(1, 1), groups=8)
    x = b.bn("b2", x, 8)
    x = b.relu("r2", x)
    x = b.conv("c3", x, 8, 16, (1, 1))
    x = b.bn("b3", x, 16)
    x = b.relu("r3", x)
    x = b.conv("c4", x, 16, 4, (3, 3), padding=(1, 1))
    g = b.build([x])

    params = {}
    for name, mod in torch_graph.items():
        if name.startswith("c"):
            params[name] = {"weight": mod.weight.detach().numpy().copy()}
            if mod.bias is not None:
                params[name]["bias"] = mod.bias.detach().numpy().copy()
        elif name.startswith("b"):
            params[name] = {
                "gamma": mod.weight.detach().numpy().copy(),
                "beta": mod.bias.detach().numpy().copy(),
                "mean": mod.running_mean.numpy().copy(),
                "var": mod.running_var.numpy().copy(),
            }
    return g, params


@pytest.fixture(scope="module")
def both_pipelines(ref_modules):
    torch, ref_quantize, ref_lt, ref_relation, ref_dfq = ref_modules
    tg, bottoms = _build_torch_chain(torch, ref_quantize)
    g, params = _build_our_chain(tg)

    targ = [ref_quantize.QuantNConv2d]

    # --- reference pipeline (mutates tg in place)
    ref_lt.merge_batchnorm(None, tg, bottoms, targ_type=targ)
    rels_ref = ref_relation.create_relation(tg, bottoms, targ)
    ref_dfq.cross_layer_equalization(tg, rels_ref, targ, converge_thres=2e-7)
    ref_dfq.bias_absorption(tg, rels_ref, bottoms, 3)
    ref_dfq.bias_correction(tg, bottoms, targ, bits_weight=8)
    ref_lt.set_quant_minmax(tg, bottoms, verbose=False)

    # --- our pipeline
    from dfq_tpu.passes import (
        bias_absorption,
        bias_correction,
        create_relations,
        cross_layer_equalization,
        fold_batchnorm,
        set_quant_ranges,
    )

    gf, pf = fold_batchnorm(g, params)
    rels = create_relations(gf)
    p1 = cross_layer_equalization(gf, pf, rels)
    p2 = bias_absorption(gf, p1, rels)
    p3 = bias_correction(gf, p2, bits_weight=8)
    ranges = set_quant_ranges(gf, p3)

    return tg, rels_ref, g, gf, p3, rels, ranges


def test_relations_match(both_pipelines):
    tg, rels_ref, g, gf, ours, rels, ranges = both_pipelines
    ref_pairs = {(r.get_idxs()[0], r.get_idxs()[1]) for r in rels_ref}
    our_pairs = {(r.first, r.second) for r in rels}
    assert our_pairs == ref_pairs


def test_weights_and_biases_match(both_pipelines):
    tg, rels_ref, g, gf, ours, rels, ranges = both_pipelines
    for name in ("c1", "c2", "c3", "c4"):
        w_ref = tg[name].weight.detach().numpy()
        np.testing.assert_allclose(
            ours[name]["weight"], w_ref, rtol=1e-4, atol=1e-5,
            err_msg=f"weight mismatch in {name}",
        )
        if tg[name].bias is not None:
            b_ref = tg[name].bias.detach().numpy()
            np.testing.assert_allclose(
                ours[name]["bias"], b_ref, rtol=1e-3, atol=1e-4,
                err_msg=f"bias mismatch in {name}",
            )


def test_bn_stats_match(both_pipelines):
    tg, rels_ref, g, gf, ours, rels, ranges = both_pipelines
    for name in ("b1", "b2", "b3"):
        np.testing.assert_allclose(
            ours[name]["stat_std"], tg[name].fake_weight.numpy(),
            rtol=1e-4, atol=1e-5, err_msg=f"stat_std mismatch in {name}",
        )
        np.testing.assert_allclose(
            ours[name]["stat_mean"], tg[name].fake_bias.numpy(),
            rtol=1e-3, atol=1e-4, err_msg=f"stat_mean mismatch in {name}",
        )


def test_activation_ranges_match(both_pipelines):
    tg, rels_ref, g, gf, ours, rels, ranges = both_pipelines
    for name in ("c1", "c2", "c3", "c4"):
        qm = tg[name].quant
        lo_ref = float(qm.running_min)
        hi_ref = float(qm.running_max)
        lo, hi = ranges[f"{name}:in0"]
        assert lo == pytest.approx(lo_ref, rel=1e-3, abs=1e-4), name
        assert hi == pytest.approx(hi_ref, rel=1e-3, abs=1e-4), name
