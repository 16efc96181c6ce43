"""Pallas TPU kernels for the int8 inference hot path.

Two kernels cover where MobileNet-family FLOPs and bytes go:

- :func:`matmul_int8_requant` — pointwise (1x1) convolutions and the
  classifier as an ``[M, K] x [K, N]`` int8 matmul over pixels, MXU
  int8 x int8 -> int32, with the whole dequant/bias/activation/requant
  epilogue fused in VMEM so the output leaves as int8.
- :func:`dw3x3_int8_requant` — stride-1 depthwise 3x3 as nine
  VPU multiply-accumulates over shifted int8 slabs with the same fused
  epilogue. Depthwise is HBM-bound; int8 in/out moves 4x fewer bytes
  than the f32 glue path.

Epilogue semantics shared by both (matches the fused XLA engine,
``dfq_tpu/engine/int8_fused.py``):

    acc   -= zp_in * colsum(w)                (zero-point fold)
    f      = acc * (s_in * s_w[c]) + bias[c]  (dequant + bias)
    f      = clip(f, act_lo, act_hi)          (relu / relu6 / identity)
    q_out  = clip(round(f / s_out) + zp_out, -128, 127)

All tiles padded to the int8 (32, 128) layout grid; M is padded by the
caller helper, K/N/C by construction of the models (multiples of 8; the
helpers pad otherwise).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _interpret() -> bool:
    # interpreter mode on non-TPU backends (CPU test mesh)
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# int8 matmul + requant


def _mm_kernel(x_ref, w_ref, scale_ref, bias_ref, wsum_ref, out_ref, *, meta):
    zp_in, s_out_inv, zp_out, act_lo, act_hi = meta
    acc = jax.lax.dot_general(
        x_ref[:],
        w_ref[:],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    acc = acc - zp_in * wsum_ref[0]
    f = acc.astype(jnp.float32) * scale_ref[0] + bias_ref[0]
    f = jnp.clip(f, act_lo, act_hi)
    q = jnp.round(f * s_out_inv) + zp_out
    out_ref[:] = jnp.clip(q, -128.0, 127.0).astype(jnp.int8)


@functools.partial(
    jax.jit,
    static_argnames=(
        "zp_in", "s_out", "zp_out", "act", "block_m", "block_n", "out_f32",
    ),
)
def matmul_int8_requant(
    x: jnp.ndarray,  # [M, K] int8
    w: jnp.ndarray,  # [K, N] int8
    scale: jnp.ndarray,  # [N] f32: s_in * s_w[c]
    bias: jnp.ndarray,  # [N] f32
    wsum: jnp.ndarray,  # [N] int32
    *,
    zp_in: int,
    s_out: float,
    zp_out: int,
    act: str = "none",  # none | relu | relu6
    block_m: int = 512,
    block_n: int = 512,
    out_f32: bool = False,
):
    M, K = x.shape
    N = w.shape[1]
    act_lo = {"none": -3.4e38, "relu": 0.0, "relu6": 0.0}[act]
    act_hi = {"none": 3.4e38, "relu": 3.4e38, "relu6": 6.0}[act]

    Mp = _round_up(M, 32)
    Np = _round_up(N, 128)
    Kp = _round_up(K, 128)
    if Mp != M:
        x = jnp.pad(x, ((0, Mp - M), (0, 0)), constant_values=np.int8(zp_in))
    if Kp != K:
        x = jnp.pad(x, ((0, 0), (0, Kp - K)), constant_values=np.int8(zp_in))
        # pad K of w with zeros: zp*0 contributes nothing and wsum unchanged
        w = jnp.pad(w, ((0, Kp - K), (0, 0)))
    if Np != N:
        w = jnp.pad(w, ((0, 0), (0, Np - N)))
        scale = jnp.pad(scale, (0, Np - N))
        bias = jnp.pad(bias, (0, Np - N))
        wsum = jnp.pad(wsum, (0, Np - N))
    # Mosaic requires >=2D operands for vector layouts
    scale = scale.reshape(1, Np)
    bias = bias.reshape(1, Np)
    wsum = wsum.reshape(1, Np)

    bm = min(block_m, Mp)
    bn = min(block_n, Np)
    # shrink to divisors
    while Mp % bm:
        bm //= 2
    while Np % bn:
        bn //= 2

    if out_f32:
        def kernel(x_ref, w_ref, scale_ref, bias_ref, wsum_ref, out_ref):
            acc = jax.lax.dot_general(
                x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            acc = acc - zp_in * wsum_ref[0]
            f = acc.astype(jnp.float32) * scale_ref[0] + bias_ref[0]
            out_ref[:] = jnp.clip(f, act_lo, act_hi)

        out_dtype = jnp.float32
    else:
        kernel = functools.partial(
            _mm_kernel, meta=(zp_in, 1.0 / s_out, zp_out, act_lo, act_hi)
        )
        out_dtype = jnp.int8

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Mp, Np), out_dtype),
        grid=(Mp // bm, Np // bn),
        in_specs=[
            pl.BlockSpec((bm, Kp), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Kp, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Np * Kp,
            bytes_accessed=Mp * Kp + Kp * Np + Mp * Np,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(x, w, scale, bias, wsum)
    return out[:M, :N]


# ---------------------------------------------------------------------------
# depthwise 3x3 (stride 1) + requant


def _dw_kernel(x_ref, w_ref, scale_ref, bias_ref, out_ref, *, meta):
    zp_in, s_out_inv, zp_out, act_lo, act_hi, H, W, out_f32 = meta
    # x_ref: [1, H+2, W+2, C] int8 (pre-padded with zp), w_ref: [9, C] i32
    C = x_ref.shape[-1]
    acc = jnp.zeros((H, W, C), jnp.int32)
    for ky in range(3):
        for kx in range(3):
            tap = x_ref[0, ky : ky + H, kx : kx + W, :].astype(jnp.int32) - zp_in
            acc = acc + tap * w_ref[ky * 3 + kx, :]
    f = acc.astype(jnp.float32) * scale_ref[0] + bias_ref[0]
    f = jnp.clip(f, act_lo, act_hi)
    if out_f32:
        out_ref[0] = f
    else:
        q = jnp.round(f * s_out_inv) + zp_out
        out_ref[0] = jnp.clip(q, -128.0, 127.0).astype(jnp.int8)


@functools.partial(
    jax.jit, static_argnames=("zp_in", "s_out", "zp_out", "act", "out_f32")
)
def dw3x3_int8_requant(
    x: jnp.ndarray,  # [N, H, W, C] int8 (unpadded)
    w: jnp.ndarray,  # [9, C] int8 taps (HW-major)
    scale: jnp.ndarray,  # [C] f32: s_in * s_w[c]
    bias: jnp.ndarray,  # [C] f32
    *,
    zp_in: int,
    s_out: float,
    zp_out: int,
    act: str = "none",
    out_f32: bool = False,
):
    N, H, W, C = x.shape
    act_lo = {"none": -3.4e38, "relu": 0.0, "relu6": 0.0}[act]
    act_hi = {"none": 3.4e38, "relu": 3.4e38, "relu6": 6.0}[act]
    Cp = _round_up(C, 128)
    if Cp != C:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, Cp - C)))
        w = jnp.pad(w, ((0, 0), (0, Cp - C)))
        scale = jnp.pad(scale, (0, Cp - C))
        bias = jnp.pad(bias, (0, Cp - C))
    xp = jnp.pad(
        x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=np.int8(zp_in)
    )

    # H-block so each program's working set fits VMEM (acc int32 dominates:
    # BH*W*Cp*4 bytes; budget ~4MB). Halos are materialized host-side by
    # stacking overlapping row slabs — pallas blocks cannot overlap.
    budget = 4 * 1024 * 1024
    bh = next(
        d for d in range(H, 0, -1) if H % d == 0 and (d * W * Cp * 4 <= budget or d == 1)
    )
    n_h = H // bh
    if n_h > 1:
        slabs = jnp.stack(
            [xp[:, i * bh : i * bh + bh + 2] for i in range(n_h)], axis=1
        )  # [N, n_h, bh+2, W+2, Cp]
        xin = slabs.reshape(N * n_h, bh + 2, W + 2, Cp)
        grid_n = N * n_h
        h_eff = bh
    else:
        xin = xp
        grid_n = N
        h_eff = H

    kernel = functools.partial(
        _dw_kernel,
        meta=(zp_in, 1.0 / s_out, zp_out, act_lo, act_hi, h_eff, W, out_f32),
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (grid_n, h_eff, W, Cp), jnp.float32 if out_f32 else jnp.int8
        ),
        grid=(grid_n,),
        in_specs=[
            pl.BlockSpec(
                (1, h_eff + 2, W + 2, Cp), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, h_eff, W, Cp), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=_interpret(),
    )(xin, w.astype(jnp.int32), scale.reshape(1, Cp), bias.reshape(1, Cp))
    if n_h > 1:
        out = out.reshape(N, H, W, Cp)
    return out[..., :C]
