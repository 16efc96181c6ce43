"""Uniform quantization primitives.

Implements the quantization math of the DFQ reference
(``/root/reference/utils/quantize.py:49-74``) as pure functions, usable both
on host (numpy, exact float32 — the reference itself notes CPU math is the
more accurate variant, ``utils/quantize.py:18-21``) and inside jitted TPU
programs (jax.numpy).

Semantics (per-tensor, ``num_bits`` = b):

- asymmetric (default): ``qmin = 0``, ``qmax = 2**b - 1``,
  ``scale = (max - min) / qmax`` (clamped to >= 1e-8);
  ``qdq(x) = round(clip((x - min)/scale, qmin, qmax)) * scale + min``.
- symmetric signed: ``qmin = -2**(b-1)``, ``qmax = 2**(b-1) - 1``,
  ``scale = max(|max|, |min|) / qmax``; ``qdq(x) = round(clip(x/scale,
  qmin, qmax)) * scale``.

Rounding is round-half-to-even in both numpy and XLA, matching torch.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class QSpec:
    """Static quantization spec for one tensor site."""

    bits: int = 8
    symmetric: bool = False
    per_channel: bool = False  # weights only; axis 0 = output channels

    @property
    def qmin(self) -> int:
        return -(2 ** (self.bits - 1)) if self.symmetric else 0

    @property
    def qmax(self) -> int:
        return (2 ** (self.bits - 1)) - 1 if self.symmetric else (2**self.bits) - 1


def quant_params(min_value, max_value, bits: int = 8, symmetric: bool = False):
    """Return ``(scale, offset, qmin, qmax)`` for the given range.

    ``offset`` is the real-valued minimum used for affine mapping (0 for
    symmetric). Works on scalars or arrays (per-channel ranges).
    Mirrors reference ``utils/quantize.py:49-66`` including the
    ``max(scale, 1e-8)`` floor and the |max|<|min| swap in symmetric mode.
    """
    xp = jnp if isinstance(min_value, jnp.ndarray) or isinstance(max_value, jnp.ndarray) else np
    if symmetric:
        qmin = -(2.0 ** (bits - 1))
        qmax = 2.0 ** (bits - 1) - 1.0
        amax = xp.maximum(xp.abs(max_value), xp.abs(min_value))
        scale = amax / qmax
        offset = xp.zeros_like(scale)
    else:
        qmin = 0.0
        qmax = 2.0**bits - 1.0
        scale = (xp.asarray(max_value) - min_value) / (qmax - qmin)
        offset = xp.asarray(min_value)
    scale = xp.maximum(scale, 1e-8)
    return scale, offset, qmin, qmax


def fake_quant(x, min_value, max_value, bits: int = 8, symmetric: bool = False):
    """Quantize-dequantize ``x`` with a per-tensor range (jittable).

    Matches reference ``UniformQuantize.forward`` (add/div/clamp/round/
    mul/add order, ``utils/quantize.py:70-74``).
    """
    scale, offset, qmin, qmax = quant_params(min_value, max_value, bits, symmetric)
    q = jnp.round(jnp.clip((x - offset) / scale, qmin, qmax))
    return q * scale + offset


def fake_quant_np(x, min_value, max_value, bits: int = 8, symmetric: bool = False):
    """Host (numpy float32) variant of :func:`fake_quant` for graph passes."""
    x = np.asarray(x, dtype=np.float32)
    scale, offset, qmin, qmax = quant_params(
        np.float32(min_value), np.float32(max_value), bits, symmetric
    )
    q = np.round(np.clip((x - offset) / np.float32(scale), qmin, qmax))
    return (q * np.float32(scale) + offset).astype(np.float32)


def _per_channel_minmax(x, xp):
    flat = x.reshape(x.shape[0], -1)
    return flat.min(axis=-1), flat.max(axis=-1)


def fake_quant_per_channel(x, bits: int = 8, symmetric: bool = False):
    """Per-output-channel (axis 0) quantize-dequantize.

    The ZeroQ standalone pipeline quantizes weights per-output-channel
    (``ZeroQ/utils/quantization_utils/quant_modules.py:120-127``); the real
    int8 engine uses the same granularity.
    """
    xp = jnp if isinstance(x, jnp.ndarray) else np
    mn, mx = _per_channel_minmax(x, xp)
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    scale, offset, qmin, qmax = quant_params(mn, mx, bits, symmetric)
    scale = scale.reshape(shape)
    offset = offset.reshape(shape)
    q = xp.round(xp.clip((x - offset) / scale, qmin, qmax))
    return q * scale + offset


def quantize_int(x, scale, zero_point, qmin: int, qmax: int, dtype=jnp.int8):
    """Real quantization to integers: ``clip(round(x/scale) + zp)``."""
    xp = jnp if isinstance(x, jnp.ndarray) else np
    q = xp.clip(xp.round(x / scale) + zero_point, qmin, qmax)
    return q.astype(dtype)


def dequantize_int(q, scale, zero_point):
    xp = jnp if isinstance(q, jnp.ndarray) else np
    return (q.astype(xp.float32) - zero_point) * scale


def affine_qparams_from_range(min_value: float, max_value: float, bits: int = 8):
    """(scale, zero_point) for int8 storage of an asymmetric range.

    zero_point is the integer such that real 0 maps near it; stored range is
    [0, 2^b-1] in unsigned convention shifted to signed int8 by -128 at the
    engine layer.
    """
    scale, offset, qmin, qmax = quant_params(
        np.float32(min_value), np.float32(max_value), bits, symmetric=False
    )
    zero_point = int(np.round(-offset / scale))
    zero_point = int(np.clip(zero_point, qmin, qmax))
    return float(scale), zero_point


def symmetric_scale_from_range(min_value, max_value, bits: int = 8):
    """Per-tensor or per-channel symmetric scale (ncnn-style,
    ``convert_ncnn.py:188-199`` computes ``128 / max(|min|,|max|)`` — the
    reciprocal of this scale with qmax≈128)."""
    scale, _, _, _ = quant_params(min_value, max_value, bits, symmetric=True)
    return scale
