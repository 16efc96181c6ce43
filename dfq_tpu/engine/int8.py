"""True INT8 execution engine.

The reference's only real-int8 path is exporting to ncnn and running its
CPU kernels (``/root/reference/convert_ncnn.py``,
``inference_cls.cpp``) — everything else is FP32 fake-quant simulation.
Here int8 is executed natively on the TPU MXU:

- conv/linear weights stored as int8 with per-output-channel symmetric
  scales (the granularity ncnn uses for weights,
  ``convert_ncnn.py:188-192``, and ZeroQ uses throughout),
- activations quantized per-tensor asymmetric (zero-point) from the
  data-free / distilled ranges,
- convolutions run ``int8 x int8 -> int32`` (``preferred_element_type=
  int32``) so the MXU's int8 path is used; the zero-point cross term is
  folded via precomputed per-channel weight sums:
  ``conv(x, w) = s_in*s_w * (conv(q, qw) - zp * colsum(qw))``,
- dequant + bias + activation are f32 VPU epilogues XLA fuses into the
  conv; non-conv ops (add/concat/pool/softmax) run in f32 with the same
  site fake-quant as the simulation, preserving its accuracy contract.

``lower_int8`` consumes a :class:`~dfq_tpu.pipeline.PreparedModel`
(using its post-pass, pre-weight-quant ``params_fp``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from dfq_tpu.graph.executor import _bn, _interpolate, _pool
from dfq_tpu.graph.ir import Graph, node_sites
from dfq_tpu.pipeline import PreparedModel
from dfq_tpu.quant.core import fake_quant


@dataclasses.dataclass
class Int8Layer:
    qweight: np.ndarray  # int8, OIHW (conv) or [out, in] (linear)
    w_scale: np.ndarray  # f32 [O] per-output-channel symmetric scale
    # f32 [O]; snapped to the bias-bit grid when cfg.bits_bias < 32
    # (bits_bias=32 keeps raw f32 — the ncnn Int8' regime,
    # /root/reference/convert_ncnn.py:29)
    bias: Optional[np.ndarray]
    wsum: np.ndarray  # int32 [O] sum of qweight over (in, spatial)
    in_scale: float
    in_zp: int  # int8-domain zero point (range [-128, 127])


@dataclasses.dataclass
class Int8Model:
    graph: Graph
    layers: Dict[str, Int8Layer]
    act_ranges: Dict[str, Tuple[float, float]]
    bits_act: int = 8


def _quantize_weight_per_channel(w: np.ndarray, bits: int = 8):
    qmax = 2.0 ** (bits - 1) - 1.0
    flat = np.abs(w.reshape(w.shape[0], -1))
    amax = flat.max(axis=1)
    scale = np.maximum(amax / qmax, 1e-12).astype(np.float32)
    shape = (-1,) + (1,) * (w.ndim - 1)
    q = np.clip(np.round(w / scale.reshape(shape)), -qmax - 1, qmax)
    return q.astype(np.int8), scale


def lower_int8(prepared: PreparedModel, bits_act: Optional[int] = None) -> Int8Model:
    graph = prepared.graph
    params = prepared.params_fp or prepared.params
    # regime bit-widths come from the config (the reference's
    # set_layer_bits semantics, utils/quantize.py:359-372): W<bits_weight>
    # per-channel weights, A<bits_activation> activations. Weights wider
    # than 8 bits cannot ride the MXU int8 path.
    bits_w = prepared.cfg.bits_weight
    if bits_w > 8:
        raise ValueError(
            f"true-int8 engine supports bits_weight <= 8, got {bits_w}; "
            "use the fake-quant simulator for wider regimes"
        )
    if bits_act is None:
        bits_act = prepared.cfg.bits_activation
    if bits_act > 8:
        raise ValueError(
            f"true-int8 engine supports bits_activation <= 8, got {bits_act}"
        )
    layers: Dict[str, Int8Layer] = {}
    for node in graph:
        if node.op not in ("conv", "linear"):
            continue
        site = f"{node.name}:in0"
        if site not in prepared.act_ranges:
            continue  # unquantized layer stays f32
        lo, hi = prepared.act_ranges[site]
        qmax_a = 2.0**bits_act - 1.0
        in_scale = max((hi - lo) / qmax_a, 1e-8)
        # uint-domain zp snapped to the grid, shifted to int8 domain
        zp_u = int(np.clip(np.round(-lo / in_scale), 0, qmax_a))
        in_zp = zp_u - 128

        p = params[node.name]
        w = np.asarray(p["weight"], np.float32)
        qw, w_scale = _quantize_weight_per_channel(w, bits=bits_w)
        wsum = qw.astype(np.int32).reshape(qw.shape[0], -1).sum(axis=1).astype(np.int32)
        bias = p.get("bias")
        if bias is not None:
            bias = np.asarray(bias, np.float32)
            # bias-bit grid per the regime legend (README.md:5-8):
            # Int8** = 16-bit bias, Int8* = 8-bit, Int8' = raw 32-bit.
            # Same per-tensor min/max snap as quantize_layer_weights.
            bits_bias = prepared.cfg.bits_bias
            if bits_bias < 32 and bias.size:
                from dfq_tpu.quant.core import fake_quant_np

                bias = fake_quant_np(
                    bias, float(bias.min()), float(bias.max()),
                    bits=bits_bias, symmetric=prepared.cfg.signed,
                )
        layers[node.name] = Int8Layer(
            qweight=qw,
            w_scale=w_scale,
            bias=bias,
            wsum=wsum,
            in_scale=float(in_scale),
            in_zp=in_zp,
        )
    return Int8Model(
        graph=graph,
        layers=layers,
        act_ranges=dict(prepared.act_ranges),
        bits_act=bits_act,
    )


def _quantize_act(x, layer: Int8Layer, qmax: float = 255.0):
    """f32 -> int8 with the layer's input qparams. ``qmax`` is the
    activation grid's unsigned max (2^bits - 1); narrower regimes still
    ride the int8 MXU path, just on a coarser grid."""
    q = jnp.round(x / layer.in_scale) + (layer.in_zp + 128)
    q = jnp.clip(q, 0.0, qmax) - 128.0
    return q.astype(jnp.int8)


def _b2s_applicable(node, h: int) -> bool:
    """Whether the batch-to-space fold is exact for this conv shape."""
    a = node.attrs
    kh, _ = a["kernel"]
    sh, _ = a["stride"]
    ph, _ = a["padding"]
    return (
        a["dilation"] == (1, 1)
        and kh >= sh
        and ph > 0  # the seam IS the per-image padding; p=0 has no seam
        and (h + 2 * ph) % sh == 0
    )


def _int8_conv_b2s(xq, node, qw_hwio, zp: int):
    """Batch-to-space fold of an int8 conv: stack the batch along H with
    zero-point seam rows so XLA sees a batch-1, B*(H+2p)-tall image.

    Bit-exact by construction: each image is individually padded with
    ``zp`` rows (exactly what :func:`_int8_conv` would inject), the
    padded blocks are concatenated along H, and a VALID conv is run over
    the stack. Because every block is ``h + 2p`` rows (a multiple of the
    stride), block starts land on the stride grid, so block ``i``'s
    first ``out_h`` output rows are exactly the per-image conv's
    outputs; the ``(2p + k - s)/s`` rows computed across each seam are
    garbage and sliced away after an exact reshape. Rationale: XLA's
    conv configs for batch 16-64 at MNV2's early spatial sizes collapse
    to 17-31 GB/s (PERFORMANCE.md "small-batch serving"); the fold
    presents those convs with the batch-128-shaped problem they run
    well at."""
    a = node.attrs
    kh, _ = a["kernel"]
    sh, sw = a["stride"]
    ph, pw = a["padding"]
    b, h, w, c = xq.shape
    hp = h + 2 * ph
    xq = jnp.pad(
        xq,
        ((0, 0), (ph, ph), (pw, pw), (0, 0)),
        constant_values=np.int8(zp),
    )
    xf = xq.reshape(1, b * hp, w + 2 * pw, c)
    # trailing zp rows so the VALID conv emits exactly b * hp/s rows
    if kh - sh > 0:
        xf = jnp.pad(
            xf,
            ((0, 0), (0, kh - sh), (0, 0), (0, 0)),
            constant_values=np.int8(zp),
        )
    acc = lax.conv_general_dilated(
        xf,
        qw_hwio,
        window_strides=(sh, sw),
        padding=((0, 0), (0, 0)),
        rhs_dilation=a["dilation"],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=a["groups"],
        preferred_element_type=jnp.int32,
    )
    out_h = (hp - kh) // sh + 1
    acc = acc.reshape(b, hp // sh, acc.shape[2], acc.shape[3])
    return acc[:, :out_h]


def _int8_conv(xq, node, qw_hwio, zp: int):
    """int8 conv with correct zero-point padding: real 0 quantizes to
    ``zp``, so spatial padding must inject ``zp`` (XLA pads 0) before the
    ``acc - zp * colsum(w)`` fold is exact at the borders."""
    ph, pw = node.attrs["padding"]
    if (ph, pw) != (0, 0):
        xq = jnp.pad(
            xq,
            ((0, 0), (ph, ph), (pw, pw), (0, 0)),
            constant_values=np.int8(zp),
        )
    return lax.conv_general_dilated(
        xq,
        qw_hwio,
        window_strides=node.attrs["stride"],
        padding=((0, 0), (0, 0)),
        rhs_dilation=node.attrs["dilation"],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=node.attrs["groups"],
        preferred_element_type=jnp.int32,
    )


def _shifted_slices(xq, node, zp: int):
    """zp-pad then take the k_h*k_w stride/dilation-aware shifted views
    of an int8 activation — the common front half of the shift9/im2col
    conv-as-matmul lowerings. Returns the list of [B,oh,ow,Cin] slices
    in (ky, kx) row-major tap order."""
    a = node.attrs
    kh, kw = a["kernel"]
    sh, sw = a["stride"]
    ph, pw = a["padding"]
    dh, dw = a["dilation"]
    if (ph, pw) != (0, 0):
        xq = jnp.pad(
            xq,
            ((0, 0), (ph, ph), (pw, pw), (0, 0)),
            constant_values=np.int8(zp),
        )
    b, hp, wp, cin = xq.shape
    oh = (hp - dh * (kh - 1) - 1) // sh + 1
    ow = (wp - dw * (kw - 1) - 1) // sw + 1
    slices = []
    for ky in range(kh):
        for kx in range(kw):
            y0, x0 = ky * dh, kx * dw
            slices.append(
                lax.slice(
                    xq,
                    (0, y0, x0, 0),
                    (b, y0 + (oh - 1) * sh + 1, x0 + (ow - 1) * sw + 1, cin),
                    (1, sh, sw, 1),
                )
            )
    return slices


def _int8_conv_shift9(xq, node, qw_hwio, zp: int):
    """Dense k*k int8 conv as k^2 ACCUMULATED matmuls over shifted views:
    ``acc = sum_{ky,kx} slice(pad(x, zp), ky, kx) @ W[ky, kx]`` with each
    term a ``[B*oh*ow, Cin] x [Cin, Cout]`` int8->int32 ``dot_general``.

    Bit-exact vs :func:`_int8_conv` (integer accumulation, same taps,
    same zp padding; tests/test_int8_fused.py). Rationale: XLA's spatial
    k3-conv configs cap near ~80 TOPS on v5e while its int8 matmuls hit
    ~276 TOPS (PERFORMANCE.md kernel table) — this presents the same
    MACs matmul-shaped. The cost is materializing k^2 shifted copies of
    the activation (9x HBM reads for k3), so it pays only where the
    conv is compute-bound, which is what scripts/ab_im2col.py measures
    per shape class. Supports stride/dilation; groups must be 1."""
    slices = _shifted_slices(xq, node, zp)
    kh, kw = node.attrs["kernel"]
    acc = None
    for i in range(kh * kw):
        wk = qw_hwio[i // kw, i % kw]  # [Cin, Cout]
        d = lax.dot_general(
            slices[i], wk, (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        acc = d if acc is None else acc + d
    return acc


def _int8_conv_im2col(xq, node, qw_hwio, zp: int):
    """Dense k*k int8 conv as ONE matmul over the concatenated shifted
    views (classic im2col): ``[B,oh,ow,k^2*Cin] @ [k^2*Cin, Cout]``.
    Bit-exact like :func:`_int8_conv_shift9`; trades the accumulation
    chain for a single bigger dot at the price of materializing the
    k^2*Cin patch tensor (one extra full write+read vs shift9's reads).
    Tap order matches ``qw_hwio.reshape(kh*kw*cin, cout)`` row-major."""
    slices = _shifted_slices(xq, node, zp)
    kh, kw = node.attrs["kernel"]
    cin, cout = qw_hwio.shape[2], qw_hwio.shape[3]
    xcat = jnp.concatenate(slices, axis=-1)
    return lax.dot_general(
        xcat, qw_hwio.reshape(kh * kw * cin, cout),
        (((3,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


def execute_int8(model: Int8Model, params_f32, x: jnp.ndarray, weights=None):
    """Run the int8 graph. ``params_f32`` supplies any layers that were
    not lowered (plus BN identities). Jittable; close over ``model``.

    ``weights`` optionally overrides the lowered int8 constants with a
    dict ``{name: {"qweight", "wsum", "scale", "bias"}}`` of device
    arrays passed as jit ARGUMENTS — conv qweight in HWIO, linear
    qweight as [in, out], so the last dim is the output channel. This is
    the tensor-parallel entry: shard that last dim over a model axis
    (``parallel.tp``) and GSPMD partitions every conv and inserts the
    collectives."""
    graph = model.graph
    env: Dict[str, jnp.ndarray] = {}
    act_ranges = model.act_ranges

    def site_fq(node, i, val):
        key = f"{node.name}:in{i}"
        if key in act_ranges:
            lo, hi = act_ranges[key]
            val = fake_quant(val, lo, hi, bits=model.bits_act)
        return val

    input_names = graph.input_names()
    env[input_names[0]] = x

    for node in graph:
        if node.op == "input":
            continue
        env[node.name] = _run_node(node, model, params_f32, env, site_fq, weights)

    outs = tuple(env[o] for o in graph.outputs)
    return outs[0] if len(outs) == 1 else outs


def _run_node(node, model, params_f32, env, site_fq, weights=None):
    with jax.named_scope(node.name):
        return _run_node_inner(node, model, params_f32, env, site_fq, weights)


def _run_node_inner(node, model, params_f32, env, site_fq, weights=None):
    ins = [env[i] for i in node.inputs]
    op = node.op
    if op in ("conv", "linear") and node.name in model.layers:
        layer = model.layers[node.name]
        ov = (weights or {}).get(node.name)
        xq = _quantize_act(ins[0], layer, qmax=2.0**model.bits_act - 1.0)
        if op == "conv":
            qw = (
                ov["qweight"] if ov is not None
                else jnp.transpose(jnp.asarray(layer.qweight), (2, 3, 1, 0))
            )
            acc = _int8_conv(xq, node, qw, layer.in_zp)
        else:
            qw = (
                ov["qweight"] if ov is not None
                else jnp.asarray(layer.qweight).T
            )
            acc = lax.dot_general(
                xq,
                qw,
                (((xq.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
        # zero-point cross term: zp * colsum(qw)
        wsum = ov["wsum"] if ov is not None else jnp.asarray(layer.wsum, jnp.int32)
        acc = acc - layer.in_zp * wsum
        w_scale = ov["scale"] if ov is not None else layer.w_scale
        out = acc.astype(jnp.float32) * (layer.in_scale * w_scale)
        bias = ov.get("bias") if ov is not None else layer.bias
        if bias is not None:
            out = out + bias
    elif op == "conv":
        from dfq_tpu.graph.executor import _conv

        out = _conv(site_fq(node, 0, ins[0]), node, params_f32[node.name])
    elif op == "linear":
        from dfq_tpu.graph.executor import _linear

        out = _linear(site_fq(node, 0, ins[0]), node, params_f32[node.name])
    elif op == "bn":
        out = _bn(ins[0], node, params_f32[node.name])
    elif op in ("identity", "dropout"):
        out = ins[0]
    elif op == "relu":
        out = jax.nn.relu(ins[0])
    elif op == "relu6":
        out = jnp.clip(ins[0], 0.0, 6.0)
    elif op == "add":
        a = site_fq(node, 0, ins[0])
        b = site_fq(node, 1, ins[1])
        out = a + b
    elif op == "concat":
        vals = [site_fq(node, i, v) for i, v in enumerate(ins)]
        out = jnp.concatenate(vals, axis=node.attrs.get("axis", -1))
    elif op == "global_mean":
        out = jnp.mean(site_fq(node, 0, ins[0]), axis=(1, 2))
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
        out = _interpolate(site_fq(node, 0, ins[0]), node)
    elif op == "softmax":
        out = jax.nn.softmax(site_fq(node, 0, ins[0]), axis=node.attrs.get("axis", -1))
    elif op == "reshape":
        v = ins[0]
        out = v.reshape((v.shape[0],) + tuple(node.attrs["shape"]))
    elif op == "l2norm":
        v = site_fq(node, 0, ins[0])
        norm = jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True))
        out = v / jnp.maximum(norm, 1e-12) * params_f32[node.name]["scale"]
    elif op == "permute_nchw":
        v = jnp.transpose(ins[0], (0, 3, 1, 2))
        out = jnp.transpose(v, node.attrs["perm"])
    else:
        raise NotImplementedError(f"int8 engine: op {op!r}")
    return out
