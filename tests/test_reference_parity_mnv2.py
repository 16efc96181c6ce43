"""Whole-MobileNetV2 end-to-end parity against the ACTUAL reference
pipeline — the strongest in-environment substitute for the README
accuracy gate (no torchvision / datasets / pretrained blobs exist here,
``/root/reference/.MISSING_LARGE_BLOBS``).

The reference's own torch MobileNetV2
(``/root/reference/modeling/classification/MobileNetV2.py:132``) is
built, its Conv2d/Linear/ReLU6 modules swapped to
QuantNConv2d/QuantNLinear/ReLU (the ``switch_layers`` semantics,
``main_cls.py:116-132`` — PyTransformer is a missing submodule, so the
swap and the traced graph/bottoms OrderedDicts are generated here
programmatically from OUR graph IR, whose node names equal torch module
paths).  Identical weights are loaded both ways, then the reference's
full pass stack runs against ours:

    set_layer_bits -> merge_batchnorm -> create_relation ->
    cross_layer_equalization -> bias_absorption -> bias_correction ->
    quantize_targ_layer -> set_quant_minmax      (main_cls.py:146-188)

and we assert: every equalized/corrected/quantized weight matches, every
activation-site range matches (all ~60 conv sites + 10 residual adds x 2
+ global mean), and the fake-quant forward logits match on a batch (the
reference forward runs under its real ``replace_op`` monkey-patching,
``utils/layer_transform.py:16-149``).

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
    ref_mnv2 = importlib.import_module("modeling.classification.MobileNetV2")
    return torch, ref_quantize, ref_lt, ref_relation, ref_dfq, ref_mnv2


def _swap_modules(torch, ref_quantize, module):
    """Conv2d->QuantNConv2d, Linear->QuantNLinear, ReLU6->ReLU — the
    reference module_dict swap (main_cls.py:124-127) without the missing
    PyTransformer.trans_layers."""
    for name, child in list(module.named_children()):
        if isinstance(child, ref_quantize.QuantNConv2d):
            pass
        elif isinstance(child, torch.nn.Conv2d):
            q = ref_quantize.QuantNConv2d(
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
            q = ref_quantize.QuantNLinear(
                child.in_features, child.out_features, bias=child.bias is not None
            )
            q.weight.data.copy_(child.weight.data)
            if child.bias is not None:
                q.bias.data.copy_(child.bias.data)
            setattr(module, name, q)
        elif isinstance(child, torch.nn.ReLU6):
            setattr(module, name, torch.nn.ReLU(inplace=False))
        else:
            _swap_modules(torch, ref_quantize, child)


# torch.mean call site in the reference model forward
# (modeling/classification/MobileNetV2.py:112); residual add at :63.
# The traced graph KEY embeds the op with a dot ('torch.mean…') — the
# relation walker string-matches on the key (utils/relation.py:43) — while
# the CustomTensorOP module name uses underscores (layer_transform.py:77).
_MEAN_KEY = "torch.mean_112_1"
_MEAN_OP = "torch_mean_112_1"
_ADD_OP = "add_63_2"


def _build_ref_graph_dicts(our_graph, model, torch, ref_lt, ref_quantize):
    """Generate the (graph, bottoms) OrderedDicts PyTransformer would have
    traced (string nodes for tensor ops, 'Data' source), plus the
    CustomTensorOP holding the traced-order tensor-op quantizers."""
    graph_t = OrderedDict()
    bottoms = {}
    name_tensor_op = []
    qms = []
    keymap = {"data": "Data"}
    for node in our_graph:
        if node.op == "input":
            continue
        key = node.name
        if node.op in ("conv", "linear", "bn", "relu", "relu6"):
            graph_t[key] = model.get_submodule(node.name)
        elif node.op == "add":
            graph_t[key] = key  # string node, key contains 'add'
            name_tensor_op.append((key, _ADD_OP))
            qms.append(ref_quantize.QuantMeasure(num_bits=8))
            qms.append(ref_quantize.QuantMeasure(num_bits=8))
        elif node.op == "global_mean":
            key = _MEAN_KEY  # traced key embeds 'torch.mean'
            graph_t[key] = _MEAN_OP
            name_tensor_op.append((_MEAN_OP, _MEAN_OP))
            qms.append(ref_quantize.QuantMeasure(num_bits=8))
        else:
            raise AssertionError(f"unexpected op {node.op}")
        keymap[node.name] = key
        bottoms[key] = [keymap[i] for i in node.inputs]
    ref_lt.module_tensor_op = ref_lt.CustomTensorOP(qms, name_tensor_op)
    # the reference attaches the container to the model (switch_layers,
    # layer_transform.py:183) so model.eval() reaches the tensor-op
    # quantizers — without this they stay in training mode and quantize
    # with batch statistics during the forward
    model.add_module("custom_tensor_op", ref_lt.module_tensor_op)
    return graph_t, bottoms, qms


@pytest.fixture(scope="module")
def pipelines(ref_modules):
    torch, ref_quantize, ref_lt, ref_relation, ref_dfq, ref_mnv2 = ref_modules
    from dfq_tpu.models import init_params, mobilenet_v2
    from dfq_tpu.pipeline import QuantConfig, prepare

    our_graph = mobilenet_v2()
    params = init_params(our_graph, seed=0, bn_stats="random")

    # --- reference model with OUR weights (node names == module paths)
    model = ref_mnv2.MobileNetV2(width_mult=1)
    model.eval()
    _swap_modules(torch, ref_quantize, model)
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
    targ = [ref_quantize.QuantNConv2d, ref_quantize.QuantNLinear]

    # --- reference pipeline (main_cls.py:146-188; Int8** flagship flags:
    # --quantize --relu --equalize --absorption --correction --bits_bias 16)
    ref_quantize.set_layer_bits(graph_t, 8, 8, 16, targ)
    ref_lt.merge_batchnorm(model, graph_t, bottoms, targ)
    rels_ref = ref_relation.create_relation(graph_t, bottoms, targ)
    ref_dfq.cross_layer_equalization(
        graph_t, rels_ref, targ, visualize_state=False, converge_thres=2e-7
    )
    ref_dfq.bias_absorption(graph_t, rels_ref, bottoms, 3)
    ref_dfq.bias_correction(graph_t, bottoms, targ, bits_weight=8)
    graph_t = ref_lt.quantize_targ_layer(graph_t, 8, 16, targ)
    ref_lt.set_quant_minmax(graph_t, bottoms, verbose=False)

    # --- our pipeline, same weights
    cfg = QuantConfig(
        quantize=True,
        relu=True,
        equalize=True,
        absorption=True,
        correction=True,
        bits_bias=16,
    )
    prep = prepare(our_graph, params, cfg)

    return torch, ref_lt, model, graph_t, qms, rels_ref, our_graph, prep


def test_relations_match(pipelines):
    _, _, _, _, _, rels_ref, our_graph, prep = pipelines
    from dfq_tpu.passes import create_relations

    ref_pairs = {(r.get_idxs()[0], r.get_idxs()[1]) for r in rels_ref}
    ours = create_relations(our_graph.map_ops({"relu6": "relu"}))
    our_pairs = {(r.first, r.second) for r in ours if r.bn is not None}
    assert our_pairs == ref_pairs
    assert len(ref_pairs) >= 30  # whole-model coverage, not a toy chain


def test_weights_match(pipelines):
    _, _, _, graph_t, _, _, our_graph, prep = pipelines
    for node in our_graph:
        if node.op not in ("conv", "linear"):
            continue
        mod = graph_t[node.name]
        w_ref = mod.weight.detach().numpy()
        w_ours = prep.params[node.name]["weight"]
        # weights sit on the 8-bit grid; a tiny CLE float drift can flip
        # a round-half boundary by exactly one step on isolated elements.
        step = float(w_ref.max() - w_ref.min()) / 255.0
        diff = np.abs(w_ours - w_ref)
        exact = float(np.mean(diff <= 1e-3 * np.abs(w_ref) + 1e-5))
        assert exact >= 0.999, (node.name, exact)
        assert diff.max() <= 1.5 * step, (node.name, diff.max(), step)
        if mod.bias is not None:
            b_ref = mod.bias.detach().numpy()
            b_ours = prep.params[node.name]["bias"]
            # biases sit on the 16-bit grid (one-step round-half flips),
            # and bias_correction feeds each flipped WEIGHT grid step into
            # the bias via eps*E[x] — so isolated elements may differ by a
            # few weight steps.
            bstep = (b_ref.max() - b_ref.min()) / (2**16 - 1)
            bdiff = np.abs(b_ours - b_ref)
            bulk = float(np.mean(bdiff <= 1.5 * bstep + 1e-4))
            assert bulk >= 0.97, (node.name, bulk)
            assert bdiff.max() <= 1.5 * bstep + 6.5 * step + 1e-4, (
                node.name, bdiff.max(), bstep, step,
            )


def test_layer_site_ranges_match(pipelines):
    _, _, _, graph_t, _, _, our_graph, prep = pipelines
    checked = 0
    for node in our_graph:
        if node.op not in ("conv", "linear"):
            continue
        qm = graph_t[node.name].quant
        lo, hi = prep.act_ranges[f"{node.name}:in0"]
        assert lo == pytest.approx(float(qm.running_min), rel=1e-3, abs=1e-4), (
            node.name
        )
        assert hi == pytest.approx(float(qm.running_max), rel=1e-3, abs=1e-4), (
            node.name
        )
        checked += 1
    assert checked >= 53  # 52 convs + classifier


def test_tensor_op_site_ranges_match(pipelines):
    _, _, _, _, qms, _, our_graph, prep = pipelines
    idx = 0
    n_add = 0
    for node in our_graph:
        if node.op == "add":
            for i in range(2):
                qm = qms[idx]
                lo, hi = prep.act_ranges[f"{node.name}:in{i}"]
                assert lo == pytest.approx(
                    float(qm.running_min), rel=1e-3, abs=1e-4
                ), (node.name, i)
                assert hi == pytest.approx(
                    float(qm.running_max), rel=1e-3, abs=1e-4
                ), (node.name, i)
                idx += 1
            n_add += 1
        elif node.op == "global_mean":
            qm = qms[idx]
            lo, hi = prep.act_ranges[f"{node.name}:in0"]
            assert lo == pytest.approx(float(qm.running_min), rel=1e-3, abs=1e-4)
            assert hi == pytest.approx(float(qm.running_max), rel=1e-3, abs=1e-4)
            idx += 1
    assert n_add == 10 and idx == len(qms)


def _torch_forward(torch, ref_lt, model, x_nhwc):
    model.eval()
    # reference quirk: set_layer_bits constructs QuantMeasure(bits_activation)
    # POSITIONALLY (utils/quantize.py:366 vs :93) — 8 lands in update_stat,
    # which is truthy, so layer quantizers mutate their ranges with batch
    # stats during eval.  Disable for a deterministic data-free comparison
    # (the reference's own set_update_stat utility, improve_dfq.py:299).
    for m in model.modules():
        if hasattr(m, "update_stat"):
            m.update_stat = False
    ref_lt.replace_op()
    try:
        with torch.no_grad():
            return model(
                torch.from_numpy(
                    np.ascontiguousarray(x_nhwc.transpose(0, 3, 1, 2))
                )
            ).numpy()
    finally:
        ref_lt.restore_op()


def _ref_final_state(graph_t, qms, our_graph, prep):
    """The reference pipeline's FINAL quantized weights and activation
    ranges, mapped onto our graph/params/site-key structure."""
    params = {k: dict(v) for k, v in prep.params.items()}
    ranges = {}
    idx = 0
    for node in our_graph:
        if node.op in ("conv", "linear"):
            mod = graph_t[node.name]
            params[node.name]["weight"] = mod.weight.detach().numpy().copy()
            if mod.bias is not None:
                params[node.name]["bias"] = mod.bias.detach().numpy().copy()
            qm = mod.quant
            ranges[f"{node.name}:in0"] = (
                float(qm.running_min), float(qm.running_max)
            )
        elif node.op == "add":
            for i in range(2):
                ranges[f"{node.name}:in{i}"] = (
                    float(qms[idx].running_min), float(qms[idx].running_max)
                )
                idx += 1
        elif node.op == "global_mean":
            ranges[f"{node.name}:in0"] = (
                float(qms[idx].running_min), float(qms[idx].running_max)
            )
            idx += 1
    return params, ranges


def test_executor_logits_match_reference_forward(pipelines):
    """Executor parity in isolation: with the REFERENCE's final weights
    and ranges injected, our fake-quant executor must reproduce the
    reference's monkey-patched torch forward.

    Two assertions with different strengths:
    - mid-network activations match to float noise (~1e-7 relative): the
      executor semantics (site placement, quant math, conv/add/mean) are
      identical;
    - final logits match loosely: past ~block 10, torch-CPU-vs-XLA-CPU
      f32 accumulation-order differences (~1e-6) start flipping isolated
      rounding boundaries at the ~60 quant sites and the flips amplify
      chaotically with depth — irreducible across backends, and small
      against the quantization noise itself."""
    torch, ref_lt, model, graph_t, qms, _, our_graph, prep = pipelines
    import jax
    from dfq_tpu.graph import executor as ex
    from dfq_tpu.graph.executor import execute

    rng = np.random.default_rng(3)
    x = np.clip(rng.normal(0, 1, (4, 224, 224, 3)), -2.11790393, 2.64).astype(
        np.float32
    )
    probe = "features.8.conv.6"
    mod = model.get_submodule(probe)
    cap = {}
    h = mod.register_forward_hook(
        lambda m, i, o: cap.__setitem__("ref", o.detach().numpy())
    )
    try:
        ref = _torch_forward(torch, ref_lt, model, x)
    finally:
        h.remove()

    params_ref, ranges_ref = _ref_final_state(graph_t, qms, our_graph, prep)
    orig_conv = ex._conv

    def conv_cap(v, node, p, **kw):
        out = orig_conv(v, node, p, **kw)
        if node.name == probe:
            cap["ours"] = np.asarray(out)
        return out

    ex._conv = conv_cap
    try:
        ours = np.asarray(
            execute(prep.graph, params_ref, x, act_ranges=ranges_ref)
        )
    finally:
        ex._conv = orig_conv

    mid_ref = cap["ref"].transpose(0, 2, 3, 1)
    mid_scale = np.abs(mid_ref).mean() + 1e-12
    mid_diff = np.abs(cap["ours"] - mid_ref).mean() / mid_scale
    # observed ~3e-4 at batch 4 (a handful of one-grid-step flips from
    # upstream boundary crossings), vs ~1.6e-2 at the logits
    assert mid_diff < 2e-3, mid_diff

    assert ours.shape == ref.shape
    diff = np.abs(ours - ref)
    scale = np.abs(ref).mean() + 1e-12
    assert diff.mean() / scale < 3e-2, diff.mean() / scale
    # random-weight logits have near-tie top ranks; under the chaotic
    # tail drift exact argmax can flip on isolated samples
    top5 = np.argsort(ref, -1)[:, -5:]
    assert all(ours[i].argmax() in top5[i] for i in range(len(ours)))
    assert float(np.mean(ours.argmax(-1) == ref.argmax(-1))) >= 0.75


def test_pipeline_logits_close_to_reference(pipelines):
    """End-to-end: OUR pipeline's fake-quant logits vs the reference
    pipeline's.  The two CLE implementations converge along different
    trajectories (vectorized sweeps vs per-channel Python loops), leaving
    ~1e-3-relative weight/range differences that compound through the 53
    convs and ~60 rounding sites — so this is a closeness check at that
    scale, while the tight checks above pin each stage separately."""
    torch, ref_lt, model, _, _, _, _, prep = pipelines
    import jax
    from dfq_tpu.graph.executor import execute

    rng = np.random.default_rng(3)
    x = np.clip(rng.normal(0, 1, (4, 224, 224, 3)), -2.11790393, 2.64).astype(
        np.float32
    )
    ref = _torch_forward(torch, ref_lt, model, x)
    ours = np.asarray(
        jax.jit(
            lambda v: execute(
                prep.graph, prep.params, v, act_ranges=prep.act_ranges
            )
        )(x)
    )
    diff = np.abs(ours - ref)
    scale = np.abs(ref).mean() + 1e-12
    assert diff.mean() / scale < 5e-2, diff.mean() / scale
    # top-1 decisions should still track closely
    top3 = np.argsort(ref, -1)[:, -3:]
    assert all(ours[i].argmax() in top3[i] for i in range(len(ours)))


# ---------------------------------------------------------------------------
# the signed / Int8' (ncnn) regime — the convert pipeline's pass stack
# (convert_ncnn.py:101-122: CLE and bias correction with signed=True,
# 32-bit bias, NO one-shot weight quantization)


@pytest.fixture(scope="module")
def signed_pipelines(ref_modules):
    torch, ref_quantize, ref_lt, ref_relation, ref_dfq, ref_mnv2 = ref_modules
    from dfq_tpu.models import init_params, mobilenet_v2
    from dfq_tpu.pipeline import QuantConfig, prepare

    our_graph = mobilenet_v2()
    params = init_params(our_graph, seed=1, bn_stats="random")

    model = ref_mnv2.MobileNetV2(width_mult=1)
    model.eval()
    _swap_modules(torch, ref_quantize, model)
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
    targ = [ref_quantize.QuantNConv2d, ref_quantize.QuantNLinear]

    ref_quantize.set_layer_bits(graph_t, 8, 8, 32, targ)
    ref_lt.merge_batchnorm(model, graph_t, bottoms, targ)
    rels_ref = ref_relation.create_relation(graph_t, bottoms, targ)
    ref_dfq.cross_layer_equalization(
        graph_t, rels_ref, targ, visualize_state=False,
        converge_thres=2e-7, signed=True,
    )
    ref_dfq.bias_correction(graph_t, bottoms, targ, bits_weight=8, signed=True)
    ref_lt.set_quant_minmax(graph_t, bottoms, verbose=False)

    cfg = QuantConfig(
        quantize=True, relu=True, equalize=True, correction=True,
        bits_bias=32, signed=True,
    )
    prep = prepare(our_graph, params, cfg)
    return graph_t, qms, our_graph, prep


def test_signed_regime_weights_match(signed_pipelines):
    graph_t, qms, our_graph, prep = signed_pipelines
    # the convert pipeline never one-shot-quantizes weights, so compare
    # the PRE-quantization params (prep.params_fp); only CLE-trajectory
    # float drift separates the implementations
    for node in our_graph:
        if node.op not in ("conv", "linear"):
            continue
        w_ref = graph_t[node.name].weight.detach().numpy()
        w_ours = prep.params_fp[node.name]["weight"]
        diff = np.abs(w_ours - w_ref)
        close = float(np.mean(diff <= 1e-3 * np.abs(w_ref) + 1e-5))
        assert close >= 0.999, (node.name, close)


def test_signed_regime_ranges_match(signed_pipelines):
    graph_t, qms, our_graph, prep = signed_pipelines
    checked = 0
    for node in our_graph:
        if node.op not in ("conv", "linear"):
            continue
        qm = graph_t[node.name].quant
        lo, hi = prep.act_ranges[f"{node.name}:in0"]
        assert lo == pytest.approx(float(qm.running_min), rel=1e-3, abs=1e-4), (
            node.name
        )
        assert hi == pytest.approx(float(qm.running_max), rel=1e-3, abs=1e-4), (
            node.name
        )
        checked += 1
    assert checked >= 53
