"""Reference parity on a residual (add) topology — exercises the
Gaussian branch-merge range logic (reference ``set_quant_minmax`` cases
b/c, ``utils/layer_transform.py:485-607``) and add-aware bias
correction, against the actual reference implementation.

The reference quantizes traced tensor ops through a global
``CustomTensorOP`` whose quantizers are consumed in traced order; here
that structure is constructed by hand for one ``add``.
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
def pipelines(request):
    torch = pytest.importorskip("torch")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import importlib

    ref_quantize = importlib.import_module("utils.quantize")
    ref_lt = importlib.import_module("utils.layer_transform")
    ref_dfq = importlib.import_module("dfq")

    rng = np.random.default_rng(7)
    QuantNConv2d = ref_quantize.QuantNConv2d

    def conv(i, o, k, pad=0):
        c = QuantNConv2d(i, o, k, padding=pad, bias=False)
        w = rng.normal(0, 0.5, (o, i, k, k)).astype(np.float32)
        c.weight.data.copy_(torch.from_numpy(w))
        return c

    def bn(c):
        b = torch.nn.BatchNorm2d(c)
        b.weight.data.copy_(torch.from_numpy(rng.lognormal(0, 0.4, c).astype(np.float32)))
        b.bias.data.copy_(torch.from_numpy(rng.normal(0.4, 0.4, c).astype(np.float32)))
        b.running_mean.copy_(torch.from_numpy(rng.normal(0, 0.2, c).astype(np.float32)))
        b.running_var.copy_(torch.from_numpy(rng.lognormal(0, 0.4, c).astype(np.float32)))
        b.eval()
        return b

    # c1 -> b1 -> r1 -> c2 -> b2 -> add(r1, b2) -> r2 -> c3
    tg = OrderedDict(
        [
            ("c1", conv(3, 8, 3, pad=1)),
            ("b1", bn(8)),
            ("r1", torch.nn.ReLU()),
            ("c2", conv(8, 8, 3, pad=1)),
            ("b2", bn(8)),
            ("add_1", "add_1"),  # traced tensor-op node (string)
            ("r2", torch.nn.ReLU()),
            ("c3", conv(8, 4, 1)),
        ]
    )
    bottoms = {
        "c1": ["Data"], "b1": ["c1"], "r1": ["b1"], "c2": ["r1"],
        "b2": ["c2"], "add_1": ["r1", "b2"], "r2": ["add_1"],
        "c3": ["r2"],
    }

    # hand-built CustomTensorOP: one traced add with two quantizers
    qms = [ref_quantize.QuantMeasure(num_bits=8), ref_quantize.QuantMeasure(num_bits=8)]
    ref_lt.module_tensor_op = ref_lt.CustomTensorOP(qms, [("add_1", "add_99_2")])

    targ = [QuantNConv2d]
    ref_lt.merge_batchnorm(None, tg, bottoms, targ_type=targ)
    ref_dfq.bias_correction(tg, bottoms, targ, bits_weight=8)
    ref_lt.set_quant_minmax(tg, bottoms, verbose=False)

    # ---- ours
    from dfq_tpu.graph.ir import GraphBuilder
    from dfq_tpu.passes import bias_correction, fold_batchnorm, set_quant_ranges

    b = GraphBuilder()
    x = b.input("data")
    x = b.conv("c1", x, 3, 8, (3, 3), padding=(1, 1))
    x = b.bn("b1", x, 8)
    x = b.relu("r1", x)
    skip = x
    x = b.conv("c2", x, 8, 8, (3, 3), padding=(1, 1))
    x = b.bn("b2", x, 8)
    x = b.add("add_1", skip, x)
    x = b.relu("r2", x)
    x = b.conv("c3", x, 8, 4, (1, 1))
    g = b.build([x])

    params = {}
    for name, mod in tg.items():
        if isinstance(mod, str):
            continue
        if name.startswith("c"):
            params[name] = {"weight": None}
        # weights were mutated in place by the reference; rebuild from a
        # fresh copy is impossible — instead rerun our pipeline from the
        # SAME pre-pass weights captured below.
    # capture pre-pass state by rebuilding: rerun with same seed
    rng2 = np.random.default_rng(7)
    params = {}
    for name in ("c1", "c2", "c3"):
        i, o, k = {"c1": (3, 8, 3), "c2": (8, 8, 3), "c3": (8, 4, 1)}[name]
        params[name] = {
            "weight": rng2.normal(0, 0.5, (o, i, k, k)).astype(np.float32)
        }
        # consume the BN draws in the same order as the torch build
        if name != "c3":
            c = 8
            params["b" + name[1]] = {
                "gamma": rng2.lognormal(0, 0.4, c).astype(np.float32),
                "beta": rng2.normal(0.4, 0.4, c).astype(np.float32),
                "mean": rng2.normal(0, 0.2, c).astype(np.float32),
                "var": rng2.lognormal(0, 0.4, c).astype(np.float32),
            }

    gf, pf = fold_batchnorm(g, params)
    pc = bias_correction(gf, pf, bits_weight=8)
    ranges = set_quant_ranges(gf, pc)
    return tg, qms, pc, ranges


def test_add_site_ranges_match(pipelines):
    tg, qms, ours, ranges = pipelines
    # the two add-input quantizers (1-to-1 case at the add)
    for i in range(2):
        lo_ref = float(qms[i].running_min)
        hi_ref = float(qms[i].running_max)
        lo, hi = ranges[f"add_1:in{i}"]
        assert lo == pytest.approx(lo_ref, rel=1e-3, abs=1e-4), i
        assert hi == pytest.approx(hi_ref, rel=1e-3, abs=1e-4), i


def test_post_add_gaussian_merge_matches(pipelines):
    tg, qms, ours, ranges = pipelines
    # c3's input range comes from the rectified-Gaussian sum merge
    qm = tg["c3"].quant
    lo, hi = ranges["c3:in0"]
    assert lo == pytest.approx(float(qm.running_min), rel=1e-3, abs=1e-4)
    assert hi == pytest.approx(float(qm.running_max), rel=1e-3, abs=1e-4)


def test_add_aware_bias_correction_matches(pipelines):
    tg, qms, ours, ranges = pipelines
    for name in ("c2", "c3"):
        ref_bias = tg[name].bias.detach().numpy()
        np.testing.assert_allclose(
            ours[name]["bias"], ref_bias, rtol=1e-3, atol=1e-4,
            err_msg=f"bias mismatch in {name}",
        )
