"""Export an Int8Model to the native runtime format.

The ncnn deployment triple (``model_int8.param/bin`` + ``.table``,
reference ``convert_ncnn.py:141-209``) maps to:

- ``<prefix>.dfqparam`` — line-based text: graph nodes with attributes,
  per-layer quantization metadata, tensor directory (name, dtype, dims,
  byte offset into the blob);
- ``<prefix>.dfqbin`` — concatenated little-endian raw tensors.

Read by the C++ runtime in ``native/`` (``dfqrt``).
"""

from __future__ import annotations

import os
from typing import Any, Dict, List

import numpy as np

from dfq_tpu.engine.int8 import Int8Model

_DTYPES = {np.dtype("int8"): "i8", np.dtype("float32"): "f32", np.dtype("int32"): "i32"}


def save_native_artifact(
    prefix: str, model: Int8Model, params_f32: Dict[str, Dict[str, Any]]
) -> None:
    graph = model.graph
    lines: List[str] = ["dfqrt 1"]
    tensors: List[np.ndarray] = []
    tensor_lines: List[str] = []
    offset = 0

    def add_tensor(name: str, arr: np.ndarray) -> str:
        nonlocal offset
        arr = np.ascontiguousarray(arr)
        if arr.dtype == np.float64:
            arr = arr.astype(np.float32)
        if arr.dtype == np.int64:
            arr = arr.astype(np.int32)
        dt = _DTYPES[arr.dtype]
        dims = " ".join(str(d) for d in arr.shape)
        tensor_lines.append(
            f"tensor {name} {dt} {arr.ndim} {dims} {offset} {arr.nbytes}"
        )
        tensors.append(arr)
        offset += arr.nbytes
        return name

    for node in graph:
        attrs: List[str] = []
        for k, v in node.attrs.items():
            if v is None or isinstance(v, bool):
                attrs.append(f"{k}={int(bool(v)) if v is not None else -1}")
            elif isinstance(v, (tuple, list)):
                attrs.append(f"{k}={','.join(str(x) for x in v)}")
            elif isinstance(v, str):
                attrs.append(f"{k}={v}")
            else:
                attrs.append(f"{k}={v}")
        # activation-range fake-quant sites for non-lowered inputs
        from dfq_tpu.graph.ir import node_sites

        for i, site in enumerate(node_sites(node)):
            if node.name in model.layers and i == 0:
                continue  # folded into the int8 layer's input quant
            if site in model.act_ranges:
                lo, hi = model.act_ranges[site]
                attrs.append(f"aq{i}={lo},{hi}")

        if node.name in model.layers:
            layer = model.layers[node.name]
            qn = node.name.replace(" ", "_")
            add_tensor(f"{qn}#qw", layer.qweight)
            add_tensor(f"{qn}#ws", layer.w_scale)
            add_tensor(f"{qn}#wsum", layer.wsum)
            attrs.append(f"q=1")
            attrs.append(f"in_scale={layer.in_scale!r}")
            attrs.append(f"in_zp={layer.in_zp}")
            if layer.bias is not None:
                add_tensor(f"{qn}#b", layer.bias)
                attrs.append("qbias=1")
        elif node.name in params_f32 and node.op in ("conv", "linear", "bn"):
            p = params_f32[node.name]
            for k in ("weight", "bias", "gamma", "beta", "mean", "var"):
                if p.get(k) is not None:
                    add_tensor(f"{node.name}#{k}", np.asarray(p[k]))
                    attrs.append(f"p_{k}=1")

        ins = " ".join(node.inputs)
        lines.append(
            f"node {node.op} {node.name} {len(node.inputs)} {ins} "
            f"{len(attrs)} {' '.join(attrs)}".rstrip()
        )

    lines.append(f"outputs {len(graph.outputs)} {' '.join(graph.outputs)}")
    lines.append(f"bits_act {model.bits_act}")
    lines.extend(tensor_lines)

    os.makedirs(os.path.dirname(prefix) or ".", exist_ok=True)
    with open(prefix + ".dfqparam", "w") as f:
        f.write("\n".join(lines) + "\n")
    with open(prefix + ".dfqbin", "wb") as f:
        for arr in tensors:
            f.write(arr.tobytes())
