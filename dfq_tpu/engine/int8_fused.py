"""Fused int8-to-int8 execution: activations stay int8 between layers.

The baseline engine (``int8.py``) dequantizes every conv output to f32
and re-quantizes at the next conv's input — simple, bit-matches the
simulator, but every inter-layer tensor crosses HBM at 4 bytes/elem.
Here each conv's requantization to its consumer's input grid is fused
into the conv epilogue, so inter-layer tensors are int8 (1 byte/elem):

    q_out = clip(round((acc - zp_in*colsum) * (s_in*s_w/s_out)
                       + relu/relu6 clamp + zp_out))

- ReLU becomes a clamp at the output zero point; ReLU6 a clamp at
  quant(6). Both exact w.r.t. quantize(act(f32)) because the activation
  is monotone and the output grid is fixed.
- Residual adds dequantize both int8 operands, add in f32, requantize —
  an elementwise chain XLA fuses; tensors entering/leaving stay int8.
- Ops without a quantized consumer (final logits, pools into
  unquantized heads) emit f32.

The int8 tensor carried on an edge uses the CONSUMER's site quantization
params; multi-consumer outputs are produced once and rescaled per extra
consumer (int8 -> int8, still 1 byte traffic).

Numerical note: vs the baseline engine this applies one extra rounding
(producer requant instead of exact f32 handoff) — the same relaxation
every deployed int8 runtime (ncnn included) makes.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from dfq_tpu.engine.int8 import (
    Int8Model,
    _b2s_applicable,
    _int8_conv,
    _int8_conv_b2s,
    _int8_conv_im2col,
    _int8_conv_shift9,
)
from dfq_tpu.graph.ir import Graph


@dataclasses.dataclass
class QTensor:
    q: jnp.ndarray  # int8
    scale: float
    zp: int  # int8-domain zero point

    def dequant(self) -> jnp.ndarray:
        return (self.q.astype(jnp.float32) - self.zp) * self.scale


def _site_params(model: Int8Model, site: str) -> Optional[Tuple[float, int]]:
    if site not in model.act_ranges:
        return None
    lo, hi = model.act_ranges[site]
    qmax = 2.0**model.bits_act - 1.0
    scale = max((hi - lo) / qmax, 1e-8)
    zp_u = int(np.clip(np.round(-lo / scale), 0, qmax))
    return scale, zp_u - 128


def _quantize_f32(x, scale: float, zp: int) -> jnp.ndarray:
    q = jnp.round(x / scale) + (zp + 128)
    return (jnp.clip(q, 0.0, 255.0) - 128.0).astype(jnp.int8)


def _requant_i8(t: QTensor, scale: float, zp: int) -> jnp.ndarray:
    if t.scale == scale and t.zp == zp:
        return t.q
    r = (t.q.astype(jnp.float32) - t.zp) * (t.scale / scale) + (zp + 128)
    return (jnp.clip(jnp.round(r), 0.0, 255.0) - 128.0).astype(jnp.int8)


def _s2d_weights(qw: np.ndarray) -> np.ndarray:
    """Rewrite an odd-k, stride-2, pad-(k//2) stem conv's OIHW int8
    weights into the exact space-to-depth(2) equivalent:
    ceil(k/2)-kernel stride-1 conv over 4x the channels. Tap (di, dj)
    maps to kernel position (di//2, dj//2) and packed channel
    ((di%2)*2 + dj%2)*C + c; unused positions are zero (so wsum is
    unchanged). k=3 -> k2 (the MNV2 stem); k=7 -> k4 (the ResNet
    stem, lane utilization 3->12 channels on the input stream)."""
    o, c, kh, kw = qw.shape
    k2h, k2w = (kh + 1) // 2, (kw + 1) // 2
    w2 = np.zeros((o, 4 * c, k2h, k2w), np.int8)
    for di in range(kh):
        for dj in range(kw):
            ki, pi = di // 2, di % 2
            kj, pj = dj // 2, dj % 2
            w2[:, (pi * 2 + pj) * c : (pi * 2 + pj) * c + c, ki, kj] = qw[:, :, di, dj]
    return w2


def _space_to_depth2(xq: jnp.ndarray, zp: int, pad: int = 1) -> jnp.ndarray:
    """Pad by ``pad`` with zp then pack 2x2 pixel patches into channels:
    [N, H, W, C] -> [N, (H+2p)/2, (W+2p)/2, 4C]. Requires H+2p even."""
    n, h, w, c = xq.shape
    xp = jnp.pad(
        xq,
        ((0, 0), (pad, pad), (pad, pad), (0, 0)),
        constant_values=np.int8(zp),
    )
    hp, wp = h + 2 * pad, w + 2 * pad
    y = xp.reshape(n, hp // 2, 2, wp // 2, 2, c)
    y = jnp.transpose(y, (0, 1, 3, 2, 4, 5))
    return y.reshape(n, hp // 2, wp // 2, 4 * c)


# ops through which an output grid propagates backward unchanged:
# quantize-then-clamp equals clamp-then-quantize for monotone grid +
# monotone op (relu/relu6/maxpool), and identity ops trivially
_GRID_PASSTHROUGH = {"relu", "relu6", "bn", "identity", "dropout", "maxpool"}
# NOTE "pad" is deliberately NOT grid-passthrough: threading int8
# through DeepLab's conv -> relu -> pad -> conv dilated-backbone chains
# is bit-compatible (real 0 == the zero point) but measured 1.4 ms/step
# SLOWER at 513^2 b8 in BOTH resize variants (same-session A/B,
# DEEPLAB_AB_r04.json) — XLA's configs for those f32 interludes beat
# its int8 ones at that geometry. The int8-domain pad branch below
# still executes when the producer is already a QTensor.


def _consumer_plan(
    graph: Graph, model: Int8Model
) -> Dict[str, Optional[Tuple[float, int]]]:
    """For each node, the int8 params its output should carry: the params
    of the first quantized consumer site reachable through grid-
    passthrough ops (None -> keep f32). Computed with one reverse
    topological sweep."""
    plan: Dict[str, Optional[Tuple[float, int]]] = {}
    for node in reversed(list(graph)):
        for idx, inp in enumerate(node.inputs):
            sp: Optional[Tuple[float, int]] = None
            if node.name in model.layers and idx == 0:
                layer = model.layers[node.name]
                sp = (layer.in_scale, layer.in_zp)
            else:
                sp = _site_params(model, f"{node.name}:in{idx}")
            if sp is None and node.op in _GRID_PASSTHROUGH:
                sp = plan.get(node.name)
            if inp not in plan or (plan[inp] is None and sp is not None):
                plan[inp] = sp
    return plan


def _find_fusable_blocks(graph: Graph, model: Int8Model, plan):
    """Identify inverted-residual chains
    ``pw-expand -> relu(6) -> dw3x3 s1 -> relu(6) -> pw-project [-> add]``
    whose site grids line up with the engine's consumer plan, so the
    whole block can run as one Pallas kernel (``fused_block_int8``)
    bit-exactly. Returns {expand_name: info}."""

    def walk(name, skips):
        """Next non-identity single consumer; folded-BN/identity/dropout
        nodes pass int8 tensors through unchanged in this engine, so a
        fused chain may span them (they land on the skip list)."""
        while True:
            cs = graph.consumers(name)
            if len(cs) != 1 or name in graph.outputs:
                return None
            n = graph[cs[0]]
            if n.op in ("bn", "identity", "dropout"):
                skips.append(n.name)
                name = n.name
                continue
            return n

    act_hi = {"relu": 3.4e38, "relu6": 6.0}
    blocks = {}
    for node in graph:
        if node.op != "conv" or node.name not in model.layers:
            continue
        a = node.attrs
        if not (
            a["kernel"] == (1, 1) and a["groups"] == 1
            and a["stride"] == (1, 1) and a["padding"] == (0, 0)
        ):
            continue
        skips: List[str] = []
        r1 = walk(node.name, skips)
        if r1 is None or r1.op not in act_hi or r1.name in graph.outputs:
            continue
        dw = walk(r1.name, skips)
        if dw is None or dw.op != "conv" or dw.name not in model.layers:
            continue
        da = dw.attrs
        if not (
            da["kernel"] == (3, 3) and da["groups"] == da["in_ch"]
            and da["stride"] == (1, 1) and da["padding"] == (1, 1)
            and da["dilation"] == (1, 1)
        ):
            continue
        r2 = walk(dw.name, skips)
        if r2 is None or r2.op not in act_hi or r2.name in graph.outputs:
            continue
        pj = walk(r2.name, skips)
        if pj is None or pj.op != "conv" or pj.name not in model.layers:
            continue
        pa = pj.attrs
        if not (
            pa["kernel"] == (1, 1) and pa["groups"] == 1
            and pa["stride"] == (1, 1) and pa["padding"] == (0, 0)
        ):
            continue
        Le, Ld, Lp = (model.layers[n.name] for n in (node, dw, pj))
        # the engine's grids through the chain must be exactly the next
        # layer's input params (no intermediate requants)
        if plan.get(node.name) != (Ld.in_scale, Ld.in_zp):
            continue
        if plan.get(dw.name) != (Lp.in_scale, Lp.in_zp):
            continue
        xname = node.inputs[0]
        if plan.get(xname) is None or pj.name in graph.outputs:
            continue
        info = {
            "dw": dw.name, "pj": pj.name,
            "skip": skips + [r1.name, dw.name, r2.name],
            "act1_hi": act_hi[r1.op], "act2_hi": act_hi[r2.op],
            "x": xname, "res": None, "p_grid": None, "final": pj.name,
            "out_grid": plan.get(pj.name),
        }
        skips2: List[str] = []
        add = walk(pj.name, skips2)
        p_alias = skips2[-1] if skips2 else pj.name
        if (
            add is not None and add.op == "add"
            and xname in add.inputs and p_alias in add.inputs
            and add.name not in graph.outputs
            and pa["out_ch"] == a["in_ch"]
        ):
            xi = add.inputs.index(xname)
            sp_x = _site_params(model, f"{add.name}:in{xi}")
            sp_p = _site_params(model, f"{add.name}:in{1 - xi}")
            if (
                sp_x is not None and sp_p is not None
                and plan.get(pj.name) == sp_p
            ):
                info.update(
                    res=sp_x, p_grid=sp_p, final=add.name,
                    out_grid=plan.get(add.name),
                )
                info["skip"] += [pj.name] + skips2
        blocks[node.name] = info
    return blocks


def auto_config(batch_per_device: int) -> Tuple[int, bool]:
    """Measured batch-dependent engine policy -> (dw_dense_max_ch,
    stem_s2d). XLA's grouped-conv config for the C=32 112^2 dw collapses
    to ~1.5 GB/s at per-device batch <= 8 (dense-diagonal rewrite is
    4.5x end-to-end there, a loss from batch 16 up), and the s2d stem
    wins +5% at batch 128 but loses 14%/6% at batch 8/32 — all
    same-session A/Bs in scripts/ab_dw_dense.py / ab_s2d.py. The inputs
    here are PER-DEVICE batches: under GSPMD each shard runs at
    global_batch / n_data devices."""
    return (32 if batch_per_device <= 8 else 0, batch_per_device >= 64)


def _chpad_target(cin: int, kernel, groups: int) -> int:
    """Channel-pad target for dense k3 convs with lane-misaligned Cin,
    or 0. Measured (scripts/ab_chpad.py, CHPAD_r05.json): XLA's spatial
    k3-conv configs cap near ~80-110 TOPS when Cin is not a multiple of
    128 but run at the ~250-340 TOPS matmul-class rate when it is —
    zero-weight padding to the next 128 multiple is bit-exact (zero
    weight rows contribute nothing) and won 3.24x on DeepLab's
    decoder dominator (Cin=304) and 1.55x on ASPP d12 (Cin=320). The
    1.35 ratio gate keeps the padded-MAC overhead below the measured
    break-even (Cin=64 -> 128 doubles the MACs and LOSES at stride 1)."""
    if groups != 1:
        return 0
    if cin < 4:
        # image stems (Cin=3): dword alignment alone is a measured
        # 1.22x on the r18 k7s2 stem kernel (0.538 -> 0.442 ms,
        # STEM_r05.json); applies to any kernel size
        return 4
    if tuple(kernel) != (3, 3):
        return 0
    if cin <= 128 or cin % 128 == 0:
        return 0
    t = ((cin + 127) // 128) * 128
    return t if t <= cin * 1.35 else 0


def _dense_diag_weights(qw: np.ndarray) -> np.ndarray:
    """Depthwise OIHW [C,1,kh,kw] int8 -> dense [C,C,kh,kw] with the taps
    on the diagonal: dw3x3(x, w) == conv3x3(x, W), bit-exact (same int8
    taps, zeros elsewhere; colsum/wsum unchanged). Trades 9*C x the MACs
    for running on the MXU instead of the VPU's 9-tap shifted path —
    profitable for small C where the VPU tap structure, not HBM, is the
    bound (PERFORMANCE.md 'depthwise story')."""
    c, _, kh, kw = qw.shape
    w = np.zeros((c, c, kh, kw), np.int8)
    w[np.arange(c), np.arange(c)] = qw[:, 0]
    return w


def execute_int8_fused(
    model: Int8Model,
    params_f32,
    x: jnp.ndarray,
    use_pallas: bool = False,
    stem_s2d="auto",
    fuse_blocks: bool = False,
    dw_dense_max_ch="auto",
    per_device_batch: int | None = None,
    dw_dense_max_h="auto",
    b2s_min_h: int = 0,
    k3_matmul: str = "auto",
    k3_matmul_min_ch: int = 0,
    chpad_k3: bool = True,
    profile_barriers: bool = False,
):
    """``use_pallas=True`` routes pointwise convs / linear layers through
    the Pallas int8 matmul kernel and stride-1 depthwise 3x3 convs
    through the Pallas depthwise kernel (``dfq_tpu/ops/pallas_int8.py``);
    the default XLA path is currently faster end-to-end on v5e (XLA's
    int8 convs hit ~276 TOPS kernel-level) but the kernels are the
    substrate for further fusion work.

    ``dw_dense_max_ch``: depthwise convs with C <= this threshold run as
    dense-diagonal convs on the MXU instead of grouped convs on the VPU
    (bit-exact rewrite, see :func:`_dense_diag_weights`); 0 disables.
    The default ``"auto"`` enables it (threshold 32) only for tiny
    batches: XLA's grouped-conv config for the C=32 112^2 dw collapses
    to ~1.5 GB/s at batch <= 8 (measured: the dense rewrite is 4.5x
    end-to-end at batch 8, +14% at batch 4, and a loss from batch 16 up
    — PERFORMANCE.md "small-batch serving").

    ``b2s_min_h``: batch-to-space fold (bit-exact, see
    ``engine/int8.py:_int8_conv_b2s``) for k3p1 convs with input
    H >= this; 0 disables.

    ``k3_matmul``: lower dense k3 convs (groups=1, any stride/dilation)
    as matmuls instead of XLA spatial convs — ``"shift9"`` (9
    accumulated shifted-view dots) or ``"im2col"`` (one concatenated
    dot); bit-exact rewrites (``engine/int8.py:_int8_conv_shift9``,
    tests/test_int8_fused.py). ``k3_matmul_min_ch`` applies it only to
    convs with in_ch >= the threshold (the matmul form pays a 9x
    activation re-read, so only compute-bound shapes profit —
    scripts/ab_im2col.py measures which). The default ``"auto"`` applies
    shift9 to DILATED dense k3 with in_ch >= 256 only: XLA's dilated
    spatial-conv configs cap at 43-46 TOPS and shift9 wins 10-12%
    whole-model on DeepLab-Xception/DRN/R101 (``K3_DILATED_r05.json``),
    while non-dilated k3 after channel padding is a measured loss
    (``IM2COL_r05.json``). ``"off"`` disables.

    ``chpad_k3`` (default ON): zero-weight channel padding of dense k3
    convs whose Cin is lane-misaligned, up to the next multiple of 128
    when that costs <= 1.35x the MACs — bit-exact, measured 3.24x on
    the DeepLab decoder dominator (see :func:`_chpad_target`).

    ``profile_barriers``: profiling-only mode
    that stops dw convs fusing into neighbors so traces carry true dw
    rows. ``per_device_batch``: resolve the "auto" policies against this
    instead of ``x.shape[0]`` (sharded callers: pass global/n_data)."""
    if dw_dense_max_ch == "auto" or stem_s2d == "auto":
        # NOTE: under GSPMD the leading dim here is the GLOBAL batch but
        # XLA configures convs per-shard — sharded callers must either
        # pass ``per_device_batch`` (global/n_data) or resolve the
        # policy themselves and pass explicit values (parallel/eval.py
        # does the latter).
        auto_dw, auto_stem = auto_config(per_device_batch or x.shape[0])
        if dw_dense_max_ch == "auto":
            dw_dense_max_ch = auto_dw
        if stem_s2d == "auto":
            stem_s2d = auto_stem
    if dw_dense_max_h == "auto":
        # spatial cap for the dense-dw rewrite: the grouped-dw config
        # collapse extends to 150^2 at batch 1 (SSD b1: dense 8.8%
        # faster) but not at batch >= 8 (SSD b8: grouped 7.9% faster;
        # DeepLab 257^2 b8: grouped 8.5% faster) — SSD_POLICY_r05.json
        # / DEEPLAB_POLICY_r05.json
        dw_dense_max_h = 160 if (per_device_batch or x.shape[0]) <= 1 else 128
    if model.bits_act != 8:
        # the fused epilogues clamp on the 8-bit grid; narrow-activation
        # regimes (A4/A6) run through the baseline engine, which threads
        # the grid width everywhere
        raise ValueError(
            "fused int8 engine requires bits_act=8; use execute_int8 "
            f"for A{model.bits_act} regimes"
        )
    graph = model.graph
    plan = _consumer_plan(graph, model)
    fused = _find_fusable_blocks(graph, model, plan) if fuse_blocks else {}
    done: set = set()
    env: Dict[str, Any] = {}

    def get_f32(name: str) -> jnp.ndarray:
        v = env[name]
        return v.dequant() if isinstance(v, QTensor) else v

    def get_i8(name: str, scale: float, zp: int) -> jnp.ndarray:
        v = env[name]
        if isinstance(v, QTensor):
            return _requant_i8(v, scale, zp)
        return _quantize_f32(v, scale, zp)

    def emit(name: str, out_f32):
        """Store a node output, quantizing per the consumer plan."""
        sp = plan.get(name)
        if sp is None:
            env[name] = out_f32
        else:
            env[name] = QTensor(_quantize_f32(out_f32, sp[0], sp[1]), sp[0], sp[1])

    input_names = graph.input_names()
    env[input_names[0]] = x

    def _exec_node(node):
        op = node.op
        if op == "input":
            return
        name = node.name
        if name in done:
            return
        if name in fused:
            info = fused[name]
            v = env[info["x"]]
            from dfq_tpu.ops.pallas_int8 import fused_block_fits, fused_block_int8

            Le = model.layers[name]
            Ld = model.layers[info["dw"]]
            Lp = model.layers[info["pj"]]
            E = Le.qweight.shape[0]
            if isinstance(v, QTensor) and fused_block_fits(
                v.q.shape[1], v.q.shape[2], v.q.shape[3], E, Lp.qweight.shape[0]
            ):
                out = fused_block_int8(
                    v.q,
                    Le.qweight.reshape(E, -1).T,
                    np.asarray(Le.in_scale * Le.w_scale, np.float32),
                    Le.bias
                    if Le.bias is not None
                    else np.zeros(E, np.float32),
                    Le.wsum,
                    Ld.qweight[:, 0].reshape(E, 9).T,
                    np.asarray(Ld.in_scale * Ld.w_scale, np.float32),
                    Ld.bias
                    if Ld.bias is not None
                    else np.zeros(E, np.float32),
                    Lp.qweight.reshape(Lp.qweight.shape[0], E).T,
                    np.asarray(Lp.in_scale * Lp.w_scale, np.float32),
                    Lp.bias
                    if Lp.bias is not None
                    else np.zeros(Lp.qweight.shape[0], np.float32),
                    Lp.wsum,
                    x_grid=(v.scale, v.zp),
                    c1_grid=(Le.in_scale, Le.in_zp),
                    e_grid=(Ld.in_scale, Ld.in_zp),
                    d_grid=(Lp.in_scale, Lp.in_zp),
                    act1_hi=info["act1_hi"],
                    act2_hi=info["act2_hi"],
                    res_grid=info["res"],
                    p_grid=info.get("p_grid"),
                    out_grid=info["out_grid"],
                )
                og = info["out_grid"]
                env[info["final"]] = (
                    out if og is None else QTensor(out, og[0], og[1])
                )
                done.update(info["skip"])
                done.add(info["final"])
                return
        if op in ("conv", "linear") and name in model.layers:
            layer = model.layers[name]
            xq = get_i8(node.inputs[0], layer.in_scale, layer.in_zp)
            sp = plan.get(name)

            # k3 stems only: the k7 (ResNet) s2d rewrite is exact
            # (helpers + unit test cover it) but measured a 3.7% LOSS
            # at b128 (33,658 -> 32,401 img/s, R18_S2D_r04.json) —
            # XLA's native k7s2 conv beats the k4s1-over-12ch form, so
            # it never engages
            is_stem = (
                stem_s2d
                and op == "conv"
                and graph[node.inputs[0]].op == "input"
                and node.attrs["kernel"] == (3, 3)
                and node.attrs["stride"] == (2, 2)
                and node.attrs["padding"] == (1, 1)
                and node.attrs["groups"] == 1
                and node.attrs["dilation"] == (1, 1)
                and x.shape[1] % 2 == 0
            )
            if is_stem:
                # exact space-to-depth rewrite: k3s2p1 over C channels ->
                # k2s1 valid over 4C channels (larger K, half the rows)
                xs = _space_to_depth2(xq, layer.in_zp, pad=1)
                w2 = _s2d_weights(layer.qweight)
                qw = jnp.transpose(jnp.asarray(w2), (2, 3, 1, 0))
                acc = lax.conv_general_dilated(
                    xs, qw, (1, 1), ((0, 0), (0, 0)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.int32,
                )
                acc = acc - layer.in_zp * jnp.asarray(layer.wsum, jnp.int32)
                out = acc.astype(jnp.float32) * (layer.in_scale * layer.w_scale)
                if layer.bias is not None:
                    out = out + layer.bias
                emit(name, out)
                return

            is_pw = (
                op == "conv"
                and node.attrs["kernel"] == (1, 1)
                and node.attrs["groups"] == 1
                and node.attrs["stride"] == (1, 1)
                and node.attrs["padding"] == (0, 0)
            )
            is_dw1 = (
                op == "conv"
                and node.attrs["kernel"] == (3, 3)
                and node.attrs["groups"] == node.attrs["in_ch"]
                and node.attrs["stride"] == (1, 1)
                and node.attrs["padding"] == (1, 1)
                and node.attrs["dilation"] == (1, 1)
            )
            if use_pallas and (is_pw or op == "linear" or is_dw1):
                from dfq_tpu.ops.pallas_int8 import (
                    dw3x3_int8_requant,
                    matmul_int8_requant,
                )

                comb_scale = jnp.asarray(layer.in_scale * layer.w_scale)
                bias = jnp.asarray(
                    layer.bias
                    if layer.bias is not None
                    else np.zeros(layer.qweight.shape[0], np.float32)
                )
                s_out, zp_out = sp if sp is not None else (1.0, 0)
                if is_dw1:
                    w9 = jnp.asarray(
                        layer.qweight[:, 0].reshape(layer.qweight.shape[0], 9).T
                    )
                    q = dw3x3_int8_requant(
                        xq, w9, comb_scale, bias,
                        zp_in=layer.in_zp, s_out=float(s_out), zp_out=int(zp_out),
                        out_f32=sp is None,
                    )
                else:
                    shp = xq.shape
                    x2d = xq.reshape(-1, shp[-1])
                    w2d = jnp.asarray(
                        layer.qweight.reshape(layer.qweight.shape[0], -1).T
                    )
                    q = matmul_int8_requant(
                        x2d, w2d, comb_scale, bias,
                        jnp.asarray(layer.wsum, jnp.int32),
                        zp_in=layer.in_zp, s_out=float(s_out), zp_out=int(zp_out),
                        out_f32=sp is None,
                    )
                    out_ch = layer.qweight.shape[0]
                    q = q.reshape(shp[:-1] + (out_ch,))
                if sp is None:
                    env[name] = q
                else:
                    env[name] = QTensor(q, sp[0], sp[1])
                return

            if op == "conv":
                a = node.attrs
                if (
                    a["groups"] > 1
                    and a["groups"] == a["in_ch"] == layer.qweight.shape[0]
                    and a["in_ch"] <= dw_dense_max_ch
                    # spatial gate (r5): the grouped-dw config collapse
                    # the rewrite cures is a SMALL-spatial phenomenon
                    # (112^2 at b<=8: 4.5x win); at segmentation sizes
                    # XLA's grouped dw is fine and the 9C-x-MAC
                    # overhead costs — DeepLab@513 b8 measured 8.5%
                    # FASTER with dense-dw off (DEEPLAB_POLICY_r05.json).
                    # SSD@300 b8 (150^2 dw, just past the gate):
                    # measured neutral-to-positive to keep gated off
                    # (SSD_POLICY_r05.json)
                    and xq.shape[1] <= dw_dense_max_h
                ):
                    # dw-on-MXU: dense-diagonal rewrite (bit-exact)
                    qw = jnp.transpose(
                        jnp.asarray(_dense_diag_weights(layer.qweight)),
                        (2, 3, 1, 0),
                    )
                    node_d = node.replace(attrs={**node.attrs, "groups": 1})
                    acc = _int8_conv(xq, node_d, qw, layer.in_zp)
                else:
                    cpad = (
                        _chpad_target(a["in_ch"], a["kernel"], a["groups"])
                        if chpad_k3
                        else 0
                    )
                    if cpad:
                        # bit-exact: padded activation channels (any
                        # value; zp for cleanliness) meet zero weight
                        # rows; wsum/bias/scales unchanged
                        xq = jnp.pad(
                            xq,
                            ((0, 0), (0, 0), (0, 0), (0, cpad - a["in_ch"])),
                            constant_values=np.int8(layer.in_zp),
                        )
                        qw_np = np.concatenate(
                            [
                                layer.qweight,
                                np.zeros(
                                    (
                                        layer.qweight.shape[0],
                                        cpad - a["in_ch"],
                                    )
                                    + layer.qweight.shape[2:],
                                    np.int8,
                                ),
                            ],
                            axis=1,
                        )
                        node = node.replace(attrs={**a, "in_ch": cpad})
                        a = node.attrs
                        qw = jnp.transpose(jnp.asarray(qw_np), (2, 3, 1, 0))
                    else:
                        qw = jnp.transpose(
                            jnp.asarray(layer.qweight), (2, 3, 1, 0)
                        )
                    _dil = tuple(a.get("dilation", (1, 1)))
                    if a["kernel"] == (3, 3) and a["groups"] == 1 and (
                        (k3_matmul in ("shift9", "im2col")
                         and a["in_ch"] >= k3_matmul_min_ch)
                        or (k3_matmul == "auto" and _dil != (1, 1)
                            and a["in_ch"] >= 256)
                    ):
                        # dense k3 conv as matmul-shaped work (bit-exact).
                        # "auto": shift9 for DILATED convs only — XLA's
                        # spatial configs for dilated k3 cap at 43-46
                        # TOPS (PROF_XC_r05) and shift9 wins 10-12%
                        # whole-model on all three dilated backbones
                        # (K3_DILATED_r05.json: Xception 187->205, DRN
                        # 199->222, R101 326->366 img/s @513 b4), while
                        # the non-dilated 129^2 decoder conv was a
                        # measured LOSS post-chpad (IM2COL_r05.json)
                        k3_fn = (
                            _int8_conv_im2col
                            if k3_matmul == "im2col"
                            else _int8_conv_shift9
                        )
                        acc = k3_fn(xq, node, qw, layer.in_zp)
                    elif (
                        b2s_min_h
                        and xq.shape[0] > 1
                        and xq.shape[1] >= b2s_min_h
                        and _b2s_applicable(node, xq.shape[1])
                    ):
                        # batch-to-space fold (bit-exact; see
                        # engine/int8.py:_int8_conv_b2s)
                        acc = _int8_conv_b2s(xq, node, qw, layer.in_zp)
                    else:
                        acc = _int8_conv(xq, node, qw, layer.in_zp)
            else:
                acc = lax.dot_general(
                    xq, jnp.asarray(layer.qweight).T,
                    (((xq.ndim - 1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
            acc = acc - layer.in_zp * jnp.asarray(layer.wsum, jnp.int32)
            out = acc.astype(jnp.float32) * (layer.in_scale * layer.w_scale)
            if layer.bias is not None:
                out = out + layer.bias
            # activation fused into the epilogue when the only consumer is
            # a relu/relu6 whose own consumer drives the grid
            emit(name, out)
        elif op == "relu":
            v = env[node.inputs[0]]
            if isinstance(v, QTensor):
                # exact: clamp at the zero point in the int domain
                q = jnp.maximum(v.q, jnp.int8(v.zp))
                env[name] = QTensor(q, v.scale, v.zp)
                sp = plan.get(name)
                if sp is not None and sp != (v.scale, v.zp):
                    env[name] = QTensor(
                        _requant_i8(env[name], sp[0], sp[1]), sp[0], sp[1]
                    )
            else:
                emit(name, jax.nn.relu(v))
        elif op == "relu6":
            v = env[node.inputs[0]]
            if isinstance(v, QTensor):
                hi = int(np.clip(np.round(6.0 / v.scale) + v.zp, -128, 127))
                q = jnp.clip(v.q, jnp.int8(v.zp), jnp.int8(hi))
                env[name] = QTensor(q, v.scale, v.zp)
                sp = plan.get(name)
                if sp is not None and sp != (v.scale, v.zp):
                    env[name] = QTensor(
                        _requant_i8(env[name], sp[0], sp[1]), sp[0], sp[1]
                    )
            else:
                emit(name, jnp.clip(v, 0.0, 6.0))
        elif op == "add":
            sp0 = _site_params(model, f"{name}:in0")
            sp1 = _site_params(model, f"{name}:in1")
            a = env[node.inputs[0]]
            b = env[node.inputs[1]]
            # dequantize through the site grids (keeps simulator semantics)
            af = (
                _requant_i8(a, *sp0).astype(jnp.float32) * sp0[0]
                - sp0[1] * sp0[0]
                if isinstance(a, QTensor) and sp0
                else get_f32(node.inputs[0])
            )
            bf = (
                _requant_i8(b, *sp1).astype(jnp.float32) * sp1[0]
                - sp1[1] * sp1[0]
                if isinstance(b, QTensor) and sp1
                else get_f32(node.inputs[1])
            )
            emit(name, af + bf)
        elif op in ("bn", "identity", "dropout"):
            v = env[node.inputs[0]]
            env[name] = v  # folded BN is identity; pass int8 through
        elif op in ("maxpool",):
            v = env[node.inputs[0]]
            if isinstance(v, QTensor):
                from dfq_tpu.graph.executor import _pool

                # max pooling commutes with the monotone quantization grid
                q = _pool(v.q.astype(jnp.float32), node, "max").astype(jnp.int8)
                env[name] = QTensor(q, v.scale, v.zp)
            else:
                from dfq_tpu.graph.executor import _pool

                emit(name, _pool(v, node, "max"))
        elif op == "concat" and all(
            isinstance(env[i], QTensor) for i in node.inputs
        ) and plan.get(name) is not None and all(
            _site_params(model, f"{name}:in{i}") is not None
            for i in range(len(node.inputs))
        ):
            # int8-domain concat: requant each branch onto its site grid
            # and then onto the consumer grid (the same two roundings
            # the f32 fallback applies), concatenating int8 — 1/4 the
            # traffic of the f32 path (DeepLab's decoder cat measured
            # ~1 ms/step through the fallback)
            sp = plan[name]
            parts = []
            for i, inp in enumerate(node.inputs):
                spi = _site_params(model, f"{name}:in{i}")
                q_site = QTensor(
                    _requant_i8(env[inp], spi[0], spi[1]), spi[0], spi[1]
                )
                parts.append(_requant_i8(q_site, sp[0], sp[1]))
            env[name] = QTensor(
                jnp.concatenate(parts, axis=node.attrs.get("axis", -1)),
                sp[0],
                sp[1],
            )
        elif op == "pad":
            v = env[node.inputs[0]]
            t_, b_, l, r = node.attrs["pads"]
            if isinstance(v, QTensor):
                # pad in the int8 domain: real 0 quantizes exactly to
                # the zero point, so this is the f32 zero-pad without
                # the dequant -> f32 pad -> requant round trip (the
                # DeepLab trace showed the standalone pads costing
                # ~0.9 ms/step through the f32 fallback)
                q = jnp.pad(
                    v.q,
                    ((0, 0), (t_, b_), (l, r), (0, 0)),
                    constant_values=np.int8(v.zp),
                )
                env[name] = QTensor(q, v.scale, v.zp)
            else:
                emit(
                    name,
                    jnp.pad(v, ((0, 0), (t_, b_), (l, r), (0, 0))),
                )
        else:
            # generic f32 fallback for remaining ops
            from dfq_tpu.graph.executor import _interpolate, _pool

            ins_f = [get_f32(i) for i in node.inputs]

            def site_fq(i, val):
                sp = _site_params(model, f"{name}:in{i}")
                if sp is None:
                    return val
                qv = _quantize_f32(val, sp[0], sp[1])
                return (qv.astype(jnp.float32) - sp[1]) * sp[0]

            if op == "conv":
                from dfq_tpu.graph.executor import _conv

                out = _conv(site_fq(0, ins_f[0]), node, params_f32[name])
            elif op == "linear":
                from dfq_tpu.graph.executor import _linear

                out = _linear(site_fq(0, ins_f[0]), node, params_f32[name])
            elif op == "concat":
                vals = [site_fq(i, v) for i, v in enumerate(ins_f)]
                out = jnp.concatenate(vals, axis=node.attrs.get("axis", -1))
            elif op == "global_mean":
                out = jnp.mean(site_fq(0, ins_f[0]), axis=(1, 2))
            elif op == "global_pool":
                out = jnp.mean(ins_f[0], axis=(1, 2), keepdims=True)
            elif op == "avgpool":
                out = _pool(ins_f[0], node, "avg")
            elif op == "pad":
                t_, b_, l, r = node.attrs["pads"]
                out = jnp.pad(ins_f[0], ((0, 0), (t_, b_), (l, r), (0, 0)))
            elif op == "interpolate":
                # bf16-grade matmul precision for the resize: its error
                # (~1e-3 relative) is far below the int8 grids that
                # bracket this op in the serving path, and the HIGHEST
                # f32 einsum was the slower half of the resize cost
                out = _interpolate(
                    site_fq(0, ins_f[0]), node,
                    precision=lax.Precision.DEFAULT,
                )
            elif op == "softmax":
                out = jax.nn.softmax(
                    site_fq(0, ins_f[0]), axis=node.attrs.get("axis", -1)
                )
            elif op == "reshape":
                v = ins_f[0]
                out = v.reshape((v.shape[0],) + tuple(node.attrs["shape"]))
            elif op == "l2norm":
                v = site_fq(0, ins_f[0])
                norm = jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True))
                out = (
                    v / jnp.maximum(norm, 1e-12) * params_f32[name]["scale"]
                )
            elif op == "permute_nchw":
                v = jnp.transpose(ins_f[0], (0, 3, 1, 2))
                out = jnp.transpose(v, node.attrs["perm"])
            else:
                raise NotImplementedError(f"fused int8 engine: op {op!r}")
            emit(name, out)


    def _barrier_val(v):
        if isinstance(v, QTensor):
            return QTensor(lax.optimization_barrier(v.q), v.scale, v.zp)
        return lax.optimization_barrier(v)

    for node in graph:
        if node.op == "input" or node.name in done:
            continue
        # profiling-only mode: optimization_barrier around depthwise
        # convs so XLA cannot fuse them into neighbor fusions — device
        # traces then carry TRUE dw rows instead of dw time riding on a
        # neighbor's row (round-3 trace aliasing). Changes scheduling,
        # so never enabled on the serving path.
        is_dw = node.op == "conv" and node.attrs.get("groups", 1) > 1
        if profile_barriers and is_dw:
            for i in node.inputs:
                env[i] = _barrier_val(env[i])
        # named scope labels every HLO with its graph-node for
        # per-layer attribution in device traces (utils/profiling)
        with jax.named_scope(node.name):
            _exec_node(node)
        if profile_barriers and is_dw and node.name in env:
            env[node.name] = _barrier_val(env[node.name])

    outs: List[jnp.ndarray] = []
    for o in graph.outputs:
        outs.append(get_f32(o))
    return outs[0] if len(outs) == 1 else tuple(outs)
