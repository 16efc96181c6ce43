"""Jittable interpreter for the graph IR.

Pure function of ``(params, x, act_ranges)`` with the graph closed over as
static structure — the whole forward traces once under ``jax.jit`` and XLA
fuses elementwise chains into the convs. Activations are NHWC, convs run
via ``lax.conv_general_dilated`` (MXU path); fake quantization at the
reference's quantizer sites is inlined when ``act_ranges`` provides a
range for the site.

Capture modes replace the reference's forward hooks / stateful
QuantMeasure.update_stat:

- ``capture="bn_inputs"``: also return per-(sample, channel) mean/std of
  every BN input (ZeroQ distillation targets,
  ``/root/reference/ZeroQ/distill_data.py:183-204``).
- ``capture="minmax"``: also return per-site (mean-of-per-sample-min,
  mean-of-per-sample-max) (QuantMeasure.update_stat semantics,
  ``/root/reference/utils/quantize.py:103-107``).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from dfq_tpu.graph.ir import Graph, node_sites
from dfq_tpu.quant.core import fake_quant


def _conv(x, node, p, precision=lax.Precision.HIGHEST):
    w = p["weight"]  # OIHW
    attrs = node.attrs
    w_hwio = jnp.transpose(w, (2, 3, 1, 0))
    ph, pw = attrs["padding"]
    out = lax.conv_general_dilated(
        x,
        w_hwio.astype(x.dtype),
        window_strides=attrs["stride"],
        padding=((ph, ph), (pw, pw)),
        rhs_dilation=attrs["dilation"],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=attrs["groups"],
        # default: full-f32 accumulation — the quantization simulation's
        # accuracy contract requires exact float math (low-precision
        # passes would alias with the quantization error being
        # measured). Distillation may relax to bf16 (measured safe for
        # the BN-statistics loss; calib/distill.py compute_dtype).
        precision=precision,
    )
    b = p.get("bias")
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def _linear(x, node, p, precision=lax.Precision.HIGHEST):
    out = jnp.dot(x, p["weight"].T.astype(x.dtype), precision=precision)
    b = p.get("bias")
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def _bn(x, node, p):
    eps = node.attrs.get("eps", 1e-5)
    inv = lax.rsqrt(p["var"] + eps)
    return (x - p["mean"]) * inv * p["gamma"] + p["beta"]


def _pool(x, node, kind):
    wh, ww = node.attrs["window"]
    sh, sw = node.attrs["stride"]
    ph, pw = node.attrs["padding"]
    pads = ((0, 0), (ph, ph), (pw, pw), (0, 0))
    dims = (1, wh, ww, 1)
    strides = (1, sh, sw, 1)
    if kind == "max":
        return lax.reduce_window(x, -jnp.inf, lax.max, dims, strides, pads)
    # avg with count_include_pad=True (torch AvgPool2d default)
    summed = lax.reduce_window(x, 0.0, lax.add, dims, strides, pads)
    return summed / (wh * ww)


def _interp_matrix(in_len: int, out_len: int, align_corners: bool):
    """Dense (out_len, in_len) bilinear interpolation matrix: each row
    holds the two taps ``(1-w, w)`` of one output coordinate."""
    if align_corners and out_len > 1:
        cs = jnp.linspace(0.0, in_len - 1.0, out_len)
    else:
        scale = in_len / out_len
        cs = jnp.clip(
            (jnp.arange(out_len) + 0.5) * scale - 0.5, 0.0, in_len - 1.0
        )
    i0 = jnp.floor(cs).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, in_len - 1)
    w1 = cs - i0
    rows = jnp.arange(out_len)
    a = jnp.zeros((out_len, in_len), jnp.float32)
    a = a.at[rows, i0].add(1.0 - w1)
    a = a.at[rows, i1].add(w1)
    return a


def _resize_bilinear(
    x, out_size, align_corners: bool, precision=lax.Precision.HIGHEST
):
    """Separable bilinear resize as two MXU matmuls.

    Mathematically identical to the gather formulation (each output
    pixel is the same 2x2 tap combination; the interpolation matrices
    carry exactly those taps), but gathers run far below HBM peak on
    TPU while these are plain f32 matmuls: the DeepLab final 129->513
    upsample measured 3.87 ms/step (26% of the whole b8 step) as
    gathers (PROF trace, round 4) vs sub-ms as matmuls."""
    n, h, w, c = x.shape
    oh, ow = out_size
    a_h = _interp_matrix(h, oh, align_corners)
    a_w = _interp_matrix(w, ow, align_corners)
    # rows: [oh,h] x [n,h,(w c)] -> [n,oh,w,c]
    rows = jnp.einsum("Oh,bhwc->bOwc", a_h, x, precision=precision)
    # cols: [ow,w] x [n,oh,w,c] -> [n,oh,ow,c]
    return jnp.einsum("Ow,bhwc->bhOc", a_w, rows, precision=precision)


def _interpolate(x, node, precision=lax.Precision.HIGHEST):
    attrs = node.attrs
    if attrs.get("size") is not None:
        out_size = attrs["size"]
    else:
        scale = attrs["scale"]
        out_size = (int(x.shape[1] * scale), int(x.shape[2] * scale))
    if attrs.get("mode", "bilinear") == "nearest":
        n, h, w, c = x.shape
        oh, ow = out_size
        yi = (jnp.arange(oh) * (h / oh)).astype(jnp.int32)
        xi = (jnp.arange(ow) * (w / ow)).astype(jnp.int32)
        return jnp.take(jnp.take(x, yi, axis=1), xi, axis=2)
    return _resize_bilinear(
        x, out_size, attrs.get("align_corners", True), precision=precision
    )


def _per_sample_minmax(v):
    flat = v.reshape(v.shape[0], -1)
    return jnp.mean(jnp.min(flat, axis=-1)), jnp.mean(jnp.max(flat, axis=-1))


def execute(
    graph: Graph,
    params: Dict[str, Dict[str, Any]],
    x: jnp.ndarray,
    *,
    act_ranges: Optional[Dict[str, Tuple[Any, Any]]] = None,
    bits_act: int = 8,
    capture: Optional[str] = None,
    self_quant: bool = False,
    weight_bits: Optional[int] = None,
    bias_bits: int = 16,
    precision=lax.Precision.HIGHEST,
):
    """Run the graph. Returns output (or tuple of outputs), plus an aux
    dict when ``capture`` is set.

    ``act_ranges`` maps site key -> (min, max); any listed site's input is
    fake-quantized with ``bits_act`` bits (reference QuantMeasure eval path,
    ``utils/quantize.py:115-119``).

    ``weight_bits`` enables the reference's ``--trainable`` regime
    (``QuantConv2d.forward``, ``utils/quantize.py:220-231``): conv/linear
    weights are fake-quantized per-forward with per-tensor min/max, and
    biases with ``bias_bits`` (skipped at 32, mirroring the bias-grid
    regimes) — instead of being pre-quantized in place once.
    """
    act_ranges = act_ranges or {}
    env: Dict[str, jnp.ndarray] = {}
    aux: Dict[str, Any] = {}

    def site_value(node, i, val):
        key = f"{node.name}:in{i}"
        is_site = key in node_sites(node)
        if capture == "minmax" and is_site:
            aux[key] = _per_sample_minmax(val)
        if self_quant and is_site:
            # QuantMeasure training branch: quantize with THIS batch's
            # mean-of-per-sample min/max (utils/quantize.py:109-119)
            mn, mx = aux[key] if key in aux else _per_sample_minmax(val)
            return fake_quant(val, mn, mx, bits=bits_act)
        if key in act_ranges:
            mn, mx = act_ranges[key]
            val = fake_quant(val, mn, mx, bits=bits_act)
        return val

    input_names = graph.input_names()
    if len(input_names) != 1:
        raise NotImplementedError("single-input graphs only")
    env[input_names[0]] = x

    for node in graph:
        if node.op == "input":
            continue
        ins = [env[i] for i in node.inputs]
        has_sites = node.op in {
            "conv",
            "linear",
            "add",
            "concat",
            "global_mean",
            "interpolate",
            "softmax",
        }
        if has_sites:
            n_q = len(node_sites(node))
            ins = [
                site_value(node, i, v) if i < n_q else v for i, v in enumerate(ins)
            ]
        p = params.get(node.name, {})
        op = node.op
        if weight_bits is not None and op in ("conv", "linear"):
            w = p["weight"]
            p = dict(p)
            p["weight"] = fake_quant(
                w, jnp.min(w), jnp.max(w), bits=weight_bits
            )
            b = p.get("bias")
            if b is not None and bias_bits < 32:
                p["bias"] = fake_quant(b, jnp.min(b), jnp.max(b), bits=bias_bits)
        if op == "conv":
            out = _conv(ins[0], node, p, precision=precision)
        elif op == "linear":
            out = _linear(ins[0], node, p, precision=precision)
        elif op == "bn":
            if capture == "bn_inputs":
                # statistics always in f32 (bf16 compute_dtype runs
                # would otherwise lose the loss targets' precision)
                v = ins[0].astype(jnp.float32)
                red = (1, 2) if v.ndim == 4 else tuple(range(1, v.ndim - 1))
                mean = jnp.mean(v, axis=red)
                # unbiased std over the reduced elements (torch.std default,
                # ZeroQ/distill_data.py:190)
                n_el = 1
                for a in red:
                    n_el *= v.shape[a]
                var = jnp.var(v, axis=red) * (n_el / max(n_el - 1, 1))
                # eps inside the sqrt: d/dv sqrt(v) blows up at dead
                # channels (zero variance), which random/saturated models
                # do hit during distillation
                aux[node.name] = (mean, jnp.sqrt(var + 1e-8))
            out = _bn(ins[0], node, p)
        elif op == "identity" or op == "dropout":
            if capture == "bn_inputs" and "stat_std" in p:
                # folded BN: distillation targets come from stat buffers;
                # still capture the input stats at this site.
                v = ins[0].astype(jnp.float32)
                red = (1, 2) if v.ndim == 4 else tuple(range(1, v.ndim - 1))
                mean = jnp.mean(v, axis=red)
                n_el = 1
                for a in red:
                    n_el *= v.shape[a]
                var = jnp.var(v, axis=red) * (n_el / max(n_el - 1, 1))
                aux[node.name] = (mean, jnp.sqrt(var + 1e-8))
            out = ins[0]
        elif op == "relu":
            out = jax.nn.relu(ins[0])
        elif op == "relu6":
            out = jnp.clip(ins[0], 0.0, 6.0)
        elif op == "add":
            out = ins[0] + ins[1]
        elif op == "concat":
            out = jnp.concatenate(ins, axis=node.attrs.get("axis", -1))
        elif op == "global_mean":
            out = jnp.mean(ins[0], axis=(1, 2))
        elif op == "global_pool":
            out = jnp.mean(ins[0], axis=(1, 2), keepdims=True)
        elif op == "avgpool":
            out = _pool(ins[0], node, "avg")
        elif op == "maxpool":
            out = _pool(ins[0], node, "max")
        elif op == "pad":
            t, b_, l, r = node.attrs["pads"]
            out = jnp.pad(ins[0], ((0, 0), (t, b_), (l, r), (0, 0)))
        elif op == "interpolate":
            out = _interpolate(ins[0], node)
        elif op == "softmax":
            out = jax.nn.softmax(ins[0], axis=node.attrs.get("axis", -1))
        elif op == "l2norm":
            # F.normalize(p=2, dim=channel) * scale: v / max(||v||, eps)
            # (torch eps=1e-12), reference scaled_l2_norm.py:14-16
            v = ins[0]
            norm = jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True))
            out = v / jnp.maximum(norm, 1e-12) * p["scale"]
        elif op == "reshape":
            v = ins[0]
            out = v.reshape((v.shape[0],) + tuple(node.attrs["shape"]))
        elif op == "permute_nchw":
            # logical-NCHW permute applied to an NHWC tensor
            v = jnp.transpose(ins[0], (0, 3, 1, 2))
            v = jnp.transpose(v, node.attrs["perm"])
            out = v
        else:
            raise NotImplementedError(f"op {op!r}")
        if capture == "layer_outputs" and op in ("conv", "linear"):
            # per-channel mean output over batch and spatial positions.
            # Deviation from the reference: improve_dfq.py:364 SUMS over
            # spatial before subtracting from the bias — an HxW-fold
            # overcorrection; its call site is dead code
            # (main_cls.py:166-177), so the corrected (mean) semantics is
            # used here.
            v = jnp.mean(out, axis=0)
            if v.ndim > 1:
                v = jnp.mean(v, axis=tuple(range(v.ndim - 1)))
            aux[node.name] = v
        env[node.name] = out

    outs = tuple(env[o] for o in graph.outputs)
    result = outs[0] if len(outs) == 1 else outs
    if capture is not None:
        return result, aux
    return result
