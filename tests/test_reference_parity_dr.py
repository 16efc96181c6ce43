"""Whole-MobileNetV2 +DR (distilled-range) parity against the ACTUAL
reference code — the last README-table column not previously diffed
whole-model (round-3 verdict missing #3).

The reference's +DR path (``main_cls.py:183-186``) is
``set_update_stat(True)`` -> ``update_quant_range`` -> ``set_update_stat
(False)``, where ``update_quant_range`` (``improve_dfq.py:280-297``)
forwards the calibration batches under ``replace_op`` and finally pins
the input-layer range. A structural subtlety this test pins down: every
QuantMeasure on that path is freshly constructed (by ``trans_layers`` /
``switch_layers`` / ``set_layer_bits``) AFTER the script's only
pre-calibration ``model.eval()`` (``main_cls.py:84``), so during
calibration the quantizers are in TRAINING mode: both the
``update_stat`` merge AND the training-EMA branch of
``QuantMeasure.forward`` run, and each site quantizes with the current
batch's own stat (``utils/quantize.py:103-119``). BN modules, by
contrast, are original (eval-mode) modules, so the merged-BN identities
stay identities.

Two levels, mirroring ``test_reference_parity_mnv2.py``:

- calibration-in-isolation: OUR ``calibrate_ranges`` on the REFERENCE's
  post-pipeline weights must reproduce their running ranges to float
  noise;
- whole pipeline: our full +DR stack vs theirs, loose (the two CLE
  implementations converge along different trajectories, ~1e-3 weight
  drift).

Skipped when the reference tree is absent.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not available"
)

from test_reference_parity_mnv2 import _build_ref_graph_dicts  # noqa: E402


@pytest.fixture(scope="module")
def ref_modules():
    torch = pytest.importorskip("torch")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import importlib
    import types

    # improve_dfq imports the missing PyTransformer submodule and
    # tensorboardX at module level (improve_dfq.py:5,9); neither is used
    # by update_quant_range / set_update_stat — stub them so the module
    # imports
    if "PyTransformer.transformers.torchTransformer" not in sys.modules:
        pt = types.ModuleType("PyTransformer")
        pt_t = types.ModuleType("PyTransformer.transformers")
        pt_tt = types.ModuleType("PyTransformer.transformers.torchTransformer")
        pt_tt.TorchTransformer = type("TorchTransformer", (), {})
        sys.modules.setdefault("PyTransformer", pt)
        sys.modules.setdefault("PyTransformer.transformers", pt_t)
        sys.modules["PyTransformer.transformers.torchTransformer"] = pt_tt
    if "tensorboardX" not in sys.modules:
        tbx = types.ModuleType("tensorboardX")
        tbx.SummaryWriter = type("SummaryWriter", (), {})
        sys.modules["tensorboardX"] = tbx

    ref_quantize = importlib.import_module("utils.quantize")
    ref_lt = importlib.import_module("utils.layer_transform")
    ref_relation = importlib.import_module("utils.relation")
    ref_dfq = importlib.import_module("dfq")
    ref_improve = importlib.import_module("improve_dfq")
    ref_mnv2 = importlib.import_module("modeling.classification.MobileNetV2")
    return torch, ref_quantize, ref_lt, ref_relation, ref_dfq, ref_improve, ref_mnv2


def _swap_modules_distill(torch, ref_quantize, module):
    """Conv2d->QConv2d, Linear->QLinear, ReLU6->ReLU — the reference
    module_dict for ``--distill_range`` (main_cls.py:119-120). The new
    modules are fresh nn.Modules (training=True), exactly as
    ``trans_layers`` leaves them."""
    for name, child in list(module.named_children()):
        if isinstance(child, ref_quantize.QConv2d):
            pass
        elif isinstance(child, torch.nn.Conv2d):
            q = ref_quantize.QConv2d(
                child.in_channels,
                child.out_channels,
                child.kernel_size,
                stride=child.stride,
                padding=child.padding,
                dilation=child.dilation,
                groups=child.groups,
                bias=child.bias is not None,
            )
            q.weight.data.copy_(child.weight.data)
            if child.bias is not None:
                q.bias.data.copy_(child.bias.data)
            setattr(module, name, q)
        elif isinstance(child, torch.nn.Linear):
            q = ref_quantize.QLinear(
                child.in_features, child.out_features, bias=child.bias is not None
            )
            q.weight.data.copy_(child.weight.data)
            if child.bias is not None:
                q.bias.data.copy_(child.bias.data)
            setattr(module, name, q)
        elif isinstance(child, torch.nn.ReLU6):
            setattr(module, name, torch.nn.ReLU(inplace=False))
        else:
            _swap_modules_distill(torch, ref_quantize, child)


def _calib_batches():
    rng = np.random.default_rng(11)
    return [
        np.clip(rng.normal(0, 1, (4, 224, 224, 3)), -2.11790393, 2.64).astype(
            np.float32
        )
        for _ in range(3)
    ]


@pytest.fixture(scope="module")
def dr_pipelines(ref_modules):
    (
        torch,
        ref_quantize,
        ref_lt,
        ref_relation,
        ref_dfq,
        ref_improve,
        ref_mnv2,
    ) = ref_modules
    from dfq_tpu.calib import calibrate_ranges
    from dfq_tpu.models import init_params, mobilenet_v2
    from dfq_tpu.pipeline import QuantConfig, prepare

    our_graph = mobilenet_v2()
    params = init_params(our_graph, seed=2, bn_stats="random")

    model = ref_mnv2.MobileNetV2(width_mult=1)
    model.eval()  # main_cls.py:84 — BNs go (and stay) eval
    _swap_modules_distill(torch, ref_quantize, model)
    with torch.no_grad():
        for node in our_graph:
            p = params.get(node.name)
            if not p:
                continue
            mod = model.get_submodule(node.name)
            if node.op in ("conv", "linear"):
                mod.weight.copy_(torch.from_numpy(p["weight"]))
                if "bias" in p and mod.bias is not None:
                    mod.bias.copy_(torch.from_numpy(p["bias"]))
            elif node.op == "bn":
                mod.weight.copy_(torch.from_numpy(p["gamma"]))
                mod.bias.copy_(torch.from_numpy(p["beta"]))
                mod.running_mean.copy_(torch.from_numpy(p["mean"]))
                mod.running_var.copy_(torch.from_numpy(p["var"]))

    graph_t, bottoms, qms = _build_ref_graph_dicts(
        our_graph, model, torch, ref_lt, ref_quantize
    )
    targ = [ref_quantize.QConv2d, ref_quantize.QLinear]

    # reference +DR pipeline (main_cls.py:146-186; flags: --quantize
    # --relu --equalize --absorption --correction --bits_bias 16
    # --distill_range — note NO quantize_targ_layer in this regime)
    ref_quantize.set_layer_bits(graph_t, 8, 8, 16, targ)
    ref_lt.merge_batchnorm(model, graph_t, bottoms, targ)
    rels_ref = ref_relation.create_relation(graph_t, bottoms, targ)
    ref_dfq.cross_layer_equalization(
        graph_t, rels_ref, targ, visualize_state=False, converge_thres=2e-7
    )
    ref_dfq.bias_absorption(graph_t, rels_ref, bottoms, 3)
    ref_dfq.bias_correction(graph_t, bottoms, targ, bits_weight=8)

    batches = _calib_batches()
    data_t = [
        torch.from_numpy(np.ascontiguousarray(b.transpose(0, 3, 1, 2)))
        for b in batches
    ]

    # drive the reference's OWN calibration functions; this environment
    # has no GPU torch, so .cuda() is stubbed to identity for the call
    ref_improve.set_update_stat(model, [ref_quantize.QuantMeasure], True)
    orig_mod_cuda = torch.nn.Module.cuda
    orig_t_cuda = torch.Tensor.cuda
    torch.nn.Module.cuda = lambda self, *a, **k: self
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        ref_improve.update_quant_range(model, data_t, graph_t, bottoms)
    finally:
        torch.nn.Module.cuda = orig_mod_cuda
        torch.Tensor.cuda = orig_t_cuda
    ref_improve.set_update_stat(model, [ref_quantize.QuantMeasure], False)

    # --- our full +DR pipeline, same weights and batches
    cfg = QuantConfig(
        quantize=True,
        relu=True,
        equalize=True,
        absorption=True,
        correction=True,
        bits_bias=16,
        distill_range=True,
    )
    prep = prepare(our_graph, params, cfg)
    ranges_ours = calibrate_ranges(prep.graph, prep.params, batches)

    return (
        torch,
        ref_quantize,
        model,
        graph_t,
        qms,
        our_graph,
        prep,
        batches,
        ranges_ours,
    )


def _ref_ranges(graph_t, qms, our_graph):
    out = {}
    idx = 0
    for node in our_graph:
        if node.op in ("conv", "linear"):
            qm = graph_t[node.name].quant
            out[f"{node.name}:in0"] = (
                float(qm.running_min),
                float(qm.running_max),
            )
        elif node.op == "add":
            for i in range(2):
                out[f"{node.name}:in{i}"] = (
                    float(qms[idx].running_min),
                    float(qms[idx].running_max),
                )
                idx += 1
        elif node.op == "global_mean":
            out[f"{node.name}:in0"] = (
                float(qms[idx].running_min),
                float(qms[idx].running_max),
            )
            idx += 1
    return out


def test_dr_calibration_exact_given_same_weights(dr_pipelines):
    """Calibration semantics in isolation: with the REFERENCE's
    post-pipeline weights converted over, our calibrate_ranges must
    reproduce the reference's running ranges to cross-backend float
    noise on every one of the ~75 sites — the update_stat merge, the
    training-mode EMA, the quantize-with-batch-stat forwards, and the
    input pin all have to line up for this to hold."""
    (
        torch,
        ref_quantize,
        model,
        graph_t,
        qms,
        our_graph,
        prep,
        batches,
        _,
    ) = dr_pipelines
    from dfq_tpu.calib import calibrate_ranges
    from dfq_tpu.passes import quantize_layer_weights

    # reference weights (raw — QConv2d fake-quants per forward) -> our
    # pre-quantized equivalents (identical math: one-shot per-tensor
    # min/max at W8/B16, utils/quantize.py:193-199 vs weight_quant.py)
    params_ref = {k: dict(v) for k, v in prep.params.items()}
    for node in our_graph:
        if node.op not in ("conv", "linear"):
            continue
        mod = graph_t[node.name]
        params_ref[node.name]["weight"] = mod.weight.detach().numpy().copy()
        if mod.bias is not None:
            params_ref[node.name]["bias"] = mod.bias.detach().numpy().copy()
    params_ref = quantize_layer_weights(
        prep.graph, params_ref, bits_weight=8, bits_bias=16
    )

    ours = calibrate_ranges(prep.graph, params_ref, batches)
    ref = _ref_ranges(graph_t, qms, our_graph)

    errs = {}
    for key, (lo_r, hi_r) in ref.items():
        lo_o, hi_o = ours[key]
        span = max(hi_r - lo_r, 1e-6)
        errs[key] = max(abs(lo_o - lo_r), abs(hi_o - hi_r)) / span
    assert len(errs) >= 70  # 53 layer sites + 10 adds x 2 + mean
    ranked = sorted(errs.items(), key=lambda kv: -kv[1])
    print("worst site errors:", ranked[:5])
    # torch-CPU-vs-XLA float noise (~1e-6 relative per conv) amplifies
    # through the ~60 rounding sites of the quantize-with-batch-stat
    # forwards: a single rounding flip moves a max-stat by a full grid
    # step (~0.4% of span), so the deepest blocks (features.14-16)
    # drift up to ~6e-3 while the bulk matches to <5e-4 — the same
    # chaotic tail the forward-parity test documents
    # one grid-step flip on a single max element moves a 4-sample mean
    # stat by ~1e-3 of span (255-step grid / 4 samples), so: bulk of
    # sites below half that, 90% within ~2 flips, worst within a few
    assert ranked[0][1] < 1e-2, ranked[:5]
    n_tight = sum(1 for e in errs.values() if e < 5e-4)
    assert n_tight >= 0.6 * len(errs), (n_tight, len(errs), ranked[:10])
    n_mid = sum(1 for e in errs.values() if e < 2e-3)
    assert n_mid >= 0.9 * len(errs), (n_mid, len(errs), ranked[:10])
    # input pin exact (the reference fills float32 buffers, so its
    # readback is the f32 rounding of the literals)
    assert ours[f"{_stem(our_graph)}:in0"] == (-2.11790393, 2.64)
    lo_p, hi_p = ref[f"{_stem(our_graph)}:in0"]
    assert lo_p == float(np.float32(-2.11790393))
    assert hi_p == float(np.float32(2.64))


def _stem(our_graph):
    for node in our_graph:
        if node.op == "conv":
            return node.name
    raise AssertionError


def test_dr_whole_pipeline_ranges_close(dr_pipelines):
    """Full-stack +DR: our pipeline (vectorized CLE trajectory) vs the
    reference's. CLE drift (~1e-3 on weights) propagates into the
    calibration forwards, so this is a closeness check; the isolation
    test above carries the exactness claim."""
    (_, _, _, graph_t, qms, our_graph, _, _, ranges_ours) = dr_pipelines
    ref = _ref_ranges(graph_t, qms, our_graph)
    n_tight = 0
    for key, (lo_r, hi_r) in ref.items():
        lo_o, hi_o = ranges_ours[key]
        span = max(hi_r - lo_r, 1e-6)
        err = max(abs(lo_o - lo_r), abs(hi_o - hi_r)) / span
        assert err < 5e-2, (key, (lo_o, hi_o), (lo_r, hi_r), err)
        if err < 5e-3:
            n_tight += 1
    assert n_tight >= 0.9 * len(ref), (n_tight, len(ref))
