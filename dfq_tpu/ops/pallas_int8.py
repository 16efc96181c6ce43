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


def _dw_flat_kernel(
    x_hbm, w_ref, scale_ref, bias_ref, out_ref, scratch, sems, *, meta
):
    """One program computes a [bh, W] output row slab for one image, on
    the FLAT lane-aligned layout: each image row is a [S, 128] plane of
    the flattened (W * Cp) channel-last vector (F = S*128).

    Why flat: Mosaic requires DMA slices and VMEM tiles aligned to the
    (sublane, 128-lane) grid. An NHWC [.., W, C] layout with C=144-style
    channel counts cannot be DMA'd ("slice shape along dimension 3 must
    be aligned to tiling"), and the kx taps would be unaligned sublane
    windows (pathologically slow to compile). Here everything is
    aligned: the halo rows ride the UNTILED leading axis, and the left/
    right taps become lane/sublane rotations (`pltpu.roll`) with the
    row-boundary wrap masked to the zero-pad value.

    The input stays in HBM; each program DMAs its (bh+2)-row halo window
    into `scratch` — no host-side overlapping-slab stacking or padding
    passes (the round-1 kernel's two extra full HBM trips)."""
    (zp_in, s_out_inv, zp_out, act_lo, act_hi,
     bh, H, n_h, S, ssh, lsh, Cp, out_f32) = meta
    n = pl.program_id(0)
    i = pl.program_id(1)
    r0 = i * bh
    F = S * 128

    body = pltpu.make_async_copy(
        x_hbm.at[n, pl.ds(r0, bh)], scratch.at[pl.ds(1, bh)], sems.at[0]
    )
    body.start()

    def top_dma():
        return pltpu.make_async_copy(
            x_hbm.at[n, pl.ds(jnp.maximum(r0 - 1, 0), 1)],
            scratch.at[pl.ds(0, 1)],
            sems.at[1],
        )

    def bot_dma():
        return pltpu.make_async_copy(
            x_hbm.at[n, pl.ds(jnp.minimum(r0 + bh, H - 1), 1)],
            scratch.at[pl.ds(bh + 1, 1)],
            sems.at[2],
        )

    @pl.when(i > 0)
    def _():
        top_dma().start()

    @pl.when(i == 0)
    def _():
        scratch[0:1] = jnp.full((1, S, 128), zp_in, jnp.int8)

    @pl.when(i < n_h - 1)
    def _():
        bot_dma().start()

    @pl.when(i == n_h - 1)
    def _():
        scratch[bh + 1 : bh + 2] = jnp.full((1, S, 128), zp_in, jnp.int8)

    body.wait()

    @pl.when(i > 0)
    def _():
        top_dma().wait()

    @pl.when(i < n_h - 1)
    def _():
        bot_dma().wait()

    # MAC in f32: per-tap products are < 2^14 and the 9-tap sum of
    # C-channel int8 products stays far below 2^24, so f32 arithmetic is
    # EXACT here and runs faster on the VPU than int32
    q = scratch[:].astype(jnp.float32) - zp_in  # [bh+2, S, 128]
    s_i = jax.lax.broadcasted_iota(jnp.int32, q.shape, 1)
    l_i = jax.lax.broadcasted_iota(jnp.int32, q.shape, 2)
    p = s_i * 128 + l_i  # flat position within the image row

    # left tap: value from flat position p - Cp (the w-1 column)
    c1 = pltpu.roll(q, ssh, axis=1)
    if lsh:
        c1 = pltpu.roll(c1, lsh, axis=2)
        c2 = pltpu.roll(pltpu.roll(q, ssh + 1, axis=1), lsh, axis=2)
        qm = jnp.where(l_i >= lsh, c1, c2)
    else:
        qm = c1
    qm = jnp.where(p < Cp, 0, qm)  # w == 0: zero padding

    # right tap: value from p + Cp (the w+1 column). pltpu.roll requires
    # non-negative shifts, so negative rolls use the modular equivalent.
    d1 = pltpu.roll(q, (S - ssh) % S, axis=1)
    if lsh:
        d1 = pltpu.roll(d1, 128 - lsh, axis=2)
        d2 = pltpu.roll(
            pltpu.roll(q, (S - ssh - 1) % S, axis=1), 128 - lsh, axis=2
        )
        qp = jnp.where(l_i < 128 - lsh, d1, d2)
    else:
        qp = d1
    qp = jnp.where(p >= F - Cp, 0, qp)  # w == W-1: zero padding

    acc = jnp.zeros((bh, S, 128), jnp.float32)
    for ky in range(3):  # ky slices ride the untiled leading axis
        acc = acc + qm[ky : ky + bh] * w_ref[ky * 3 + 0]
        acc = acc + q[ky : ky + bh] * w_ref[ky * 3 + 1]
        acc = acc + qp[ky : ky + bh] * w_ref[ky * 3 + 2]
    f = acc * scale_ref[0] + bias_ref[0]
    f = jnp.clip(f, act_lo, act_hi)
    if out_f32:
        out_ref[0, 0] = f
    else:
        qo = jnp.round(f * s_out_inv) + zp_out
        out_ref[0, 0] = jnp.clip(qo, -128.0, 127.0).astype(jnp.int8)


def _dw_flat_dims(W: int, C: int) -> Tuple[int, int]:
    """Smallest (Wp, Cp) >= (W, C) with (Wp * Cp) % 1024 == 0 — the flat
    layout's DMA-alignment requirement (copied shapes must tile to
    (8 sublanes, 128 lanes), i.e. S = Wp*Cp/128 must be a multiple of
    8).  Prefers padding W (typically +14%: 56->64, 112->128, 28->32)
    over padding C.  The W pad is semantically exact: padded columns
    hold the zero point, which dequantizes to the true zero padding."""
    best = None
    for Cp in range(C, C + 128):
        Wp = W
        while (Wp * Cp) % 1024:
            Wp += 1
        cost = Wp * Cp
        if best is None or cost < best[2]:
            best = (Wp, Cp, cost)
        if cost == W * C:
            break
    return best[0], best[1]


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

    Wp, Cp = _dw_flat_dims(W, C)
    if (Wp, Cp) != (W, C):
        # one extra pad pass host-side (fusable into the producer's
        # output layout); zp-filled W columns dequantize to exact zero
        # padding, padded channels carry zero weights
        x = jnp.pad(
            x, ((0, 0), (0, 0), (0, Wp - W), (0, Cp - C)),
            constant_values=np.int8(zp_in),
        )
        w = jnp.pad(w, ((0, 0), (0, Cp - C)))
        scale = jnp.pad(scale, (0, Cp - C))
        bias = jnp.pad(bias, (0, Cp - C))
    F = Wp * Cp
    S = F // 128
    ssh, lsh = Cp // 128, Cp % 128

    x3 = x.reshape(N, H, S, 128)  # free reshape (contiguous)
    wf = jnp.tile(w.astype(jnp.float32), (1, Wp)).reshape(9, S, 128)
    scale_f = jnp.tile(scale, Wp).reshape(1, S, 128)
    bias_f = jnp.tile(bias, Wp).reshape(1, S, 128)

    # row-slab size: q/qm/qp + roll temps + acc + f dominate at ~20 int32
    # planes of F elems per bh row. Use most of VMEM — fewer, larger
    # programs amortize the per-program DMA-wait and setup cost.
    budget = 10 * 1024 * 1024
    bh = next(
        d
        for d in range(H, 0, -1)
        if H % d == 0 and ((20 * d + 26) * F <= budget or d == 1)
    )
    n_h = H // bh

    kernel = functools.partial(
        _dw_flat_kernel,
        meta=(
            zp_in, 1.0 / s_out, zp_out, act_lo, act_hi,
            bh, H, n_h, S, ssh, lsh, Cp, out_f32,
        ),
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (N, n_h, bh, S, 128), jnp.float32 if out_f32 else jnp.int8
        ),
        grid=(N, n_h),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # stays in HBM; DMA'd
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, bh, S, 128), lambda n, i: (n, i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((bh + 2, S, 128), jnp.int8),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=18 * N * H * F,
            bytes_accessed=2 * N * H * F,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(x3, wf, scale_f, bias_f)
    out = out.reshape(N, H, Wp, Cp)
    return out[:, :, :W, :C]


def _fused_block_vmem(bh: int, W: int, Cp: int, Ep: int, C2p: int) -> int:
    """Working-set estimate (bytes) for one fused-block program: int8
    input slab + requanted copy, expand int32 acc + f32 f1 (live
    together), q1 + dw scratch (int8), dw int32 acc, project int32 acc
    + f32 f2."""
    return (
        2 * (bh + 2) * W * Cp  # input slab + xc requant copy (int8)
        + 8 * (bh + 2) * W * Ep  # expand acc (int32) + f1 (f32)
        + 2 * (bh + 2) * (W + 2) * Ep  # q1 + scratch (int8)
        + 4 * bh * W * Ep  # dw acc (int32)
        + 8 * bh * W * C2p  # project acc (int32) + f2 (f32)
    )


def fused_block_fits(
    H: int, W: int, C: int, E: int, C2: int,
    vmem_budget: int = 4 * 1024 * 1024,
) -> bool:
    """True when some row slab of the block fits the VMEM budget —
    callers (the fused engine's block finder) should skip fusion
    otherwise rather than hit the in-call ValueError."""
    Cp, Ep, C2p = (_round_up(v, 128) for v in (C, E, C2))
    return _fused_block_vmem(1, W, Cp, Ep, C2p) <= vmem_budget


# ---------------------------------------------------------------------------
# whole-block fusion: expand (1x1) -> dw3x3 s1 -> project (1x1) [-> residual]
#
# The inverted-residual block's expanded tensor (6x the block width) is
# the dominant HBM traffic in MobileNet-family nets: the unfused engine
# crosses HBM with it four times (expand-out write, dw-in read, dw-out
# write, project-in read). This kernel keeps it in VMEM for a row slab,
# so per block only the narrow input/output tensors touch HBM. The
# residual add (and the input requants the engine would run as separate
# elementwise passes) are folded into the same kernel. Bit-exact with
# the unfused fused-engine path (same integer accumulation and the same
# f32 epilogue expressions in the same order).


def _fused_block_kernel(
    x_ref, w1_ref, sc1_ref, b1_ref, ws1_ref,
    wd_ref, scd_ref, bd_ref,
    w2_ref, sc2_ref, b2_ref, ws2_ref,
    out_ref, e_scr,
    *, meta,
):
    (
        bh, W, H, n_h,
        s_x, zp_x, s_c1, zp_c1, s_e, zp_e, s_d, zp_d,
        act1_q, act2_q,
        res, s_r, zp_r, s_p, zp_p,
        out_f32, s_o, zp_o,
    ) = meta
    Cp = x_ref.shape[-1]
    Ep = wd_ref.shape[-1]

    xq = x_ref[0]  # [bh+2, W, Cp] int8, grid (s_x, zp_x)

    # requant to the expand conv's input grid (engine get_i8 semantics)
    if (s_x, zp_x) == (s_c1, zp_c1):
        xc = xq
    else:
        r = (xq.astype(jnp.float32) - zp_x) * (s_x / s_c1) + (zp_c1 + 128)
        xc = (jnp.clip(jnp.round(r), 0.0, 255.0) - 128.0).astype(jnp.int8)

    # expand 1x1: [(bh+2)*W, Cp] x [Cp, Ep] on the MXU
    a1 = jax.lax.dot_general(
        xc.reshape((bh + 2) * W, Cp), w1_ref[:],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32,
    )
    a1 = a1 - zp_c1 * ws1_ref[0]
    f1 = a1.astype(jnp.float32) * sc1_ref[0] + b1_ref[0]
    f1 = f1.reshape(bh + 2, W, Ep)
    # out-of-image halo rows must dequantize to 0 so the dw sees true
    # zero padding: f=0 quantizes to exactly zp_e
    si = pl.program_id(0) % n_h
    row = jax.lax.broadcasted_iota(jnp.int32, (bh + 2, 1, 1), 0)
    grow = si * bh + row - 1
    f1 = jnp.where((grow >= 0) & (grow <= H - 1), f1, 0.0)
    # act clamp in the int domain with host-f64 bounds (act1_q = quantized
    # upper bound) — exactly the engine's relu/relu6 int8-clamp semantics
    q1 = jnp.round(f1 / s_e) + (zp_e + 128)
    q1 = (jnp.clip(q1, zp_e + 128.0, act1_q + 128.0) - 128.0).astype(jnp.int8)

    # dw input with W zero-padding in the int8 domain
    e_scr[:, 0:1, :] = jnp.full((bh + 2, 1, Ep), zp_e, jnp.int8)
    e_scr[:, W + 1 : W + 2, :] = jnp.full((bh + 2, 1, Ep), zp_e, jnp.int8)
    e_scr[:, 1 : W + 1, :] = q1

    acc = jnp.zeros((bh, W, Ep), jnp.int32)
    for ky in range(3):
        for kx in range(3):
            tap = e_scr[ky : ky + bh, kx : kx + W, :].astype(jnp.int32) - zp_e
            acc = acc + tap * wd_ref[ky * 3 + kx, :]
    fd = acc.astype(jnp.float32) * scd_ref[0] + bd_ref[0]
    qd = jnp.round(fd / s_d) + (zp_d + 128)
    qd = (jnp.clip(qd, zp_d + 128.0, act2_q + 128.0) - 128.0).astype(jnp.int8)

    # project 1x1: [bh*W, Ep] x [Ep, C2p]
    C2p = w2_ref.shape[-1]
    a2 = jax.lax.dot_general(
        qd.reshape(bh * W, Ep), w2_ref[:],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32,
    )
    a2 = a2 - zp_d * ws2_ref[0]
    f2 = (a2.astype(jnp.float32) * sc2_ref[0] + b2_ref[0]).reshape(bh, W, C2p)

    if res:
        # engine: emit(project) quantizes to the add:in site grid, the
        # add dequantizes both operands through their site grids
        q2 = jnp.round(f2 / s_p) + (zp_p + 128)
        q2 = jnp.clip(q2, 0.0, 255.0) - 128.0
        bf = q2 * s_p - zp_p * s_p
        if (s_x, zp_x) == (s_r, zp_r):
            xr = xq[1 : bh + 1].astype(jnp.float32)
        else:
            rr = (xq[1 : bh + 1].astype(jnp.float32) - zp_x) * (
                s_x / s_r
            ) + (zp_r + 128)
            xr = jnp.clip(jnp.round(rr), 0.0, 255.0) - 128.0
        af = xr * s_r - zp_r * s_r
        f2 = af + bf

    if out_f32:
        out_ref[0] = f2
    else:
        qo = jnp.round(f2 / s_o) + (zp_o + 128)
        out_ref[0] = (jnp.clip(qo, 0.0, 255.0) - 128.0).astype(jnp.int8)


def fused_block_int8(
    x: jnp.ndarray,  # [N, H, W, C] int8 in grid (s_x, zp_x)
    w1: np.ndarray, scale1: np.ndarray, bias1: np.ndarray, wsum1: np.ndarray,
    wd: np.ndarray, scale_d: np.ndarray, bias_d: np.ndarray,
    w2: np.ndarray, scale2: np.ndarray, bias2: np.ndarray, wsum2: np.ndarray,
    *,
    x_grid: Tuple[float, int],
    c1_grid: Tuple[float, int],
    e_grid: Tuple[float, int],
    d_grid: Tuple[float, int],
    act1_hi: float,
    act2_hi: float,
    res_grid: Optional[Tuple[float, int]] = None,  # x's add:in site grid
    p_grid: Optional[Tuple[float, int]] = None,  # project's add:in site grid
    out_grid: Optional[Tuple[float, int]] = None,  # None -> f32 output
    vmem_budget: int = 4 * 1024 * 1024,
):
    """Fused inverted-residual block. Weight args are host numpy:
    ``w1 [C, E]``, ``wd [9, E]`` (HW-major taps), ``w2 [E, C2]``, all
    int8; per-channel ``scaleX = s_in * s_w`` f32; ``wsumX`` int32."""
    N, H, W, C = x.shape
    E = w1.shape[1]
    C2 = w2.shape[1]
    Cp, Ep, C2p = (_round_up(v, 128) for v in (C, E, C2))
    res = res_grid is not None
    if res and C != C2:
        raise ValueError("residual fusion requires in_ch == out_ch")
    if res and p_grid is None:
        raise ValueError("res_grid requires p_grid")

    # int-domain activation upper bounds, computed host-side in f64 —
    # identical to the engine's relu6 clamp (int8_fused.py relu6 branch)
    act1_q = int(np.clip(np.round(act1_hi / e_grid[0]) + e_grid[1], -128, 127))
    act2_q = int(np.clip(np.round(act2_hi / d_grid[0]) + d_grid[1], -128, 127))

    def padc(a, n):
        return np.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, n - a.shape[-1])])

    w1p = padc(np.pad(w1, ((0, Cp - C), (0, 0))), Ep)
    wdp = padc(wd, Ep).astype(np.int32)
    w2p = padc(np.pad(w2, ((0, Ep - E), (0, 0))), C2p)
    sc1, b1, ws1 = (padc(a.reshape(1, -1), Ep) for a in (scale1, bias1, wsum1))
    scd, bd = (padc(a.reshape(1, -1), Ep) for a in (scale_d, bias_d))
    sc2, b2, ws2 = (padc(a.reshape(1, -1), C2p) for a in (scale2, bias2, wsum2))

    s_x, zp_x = x_grid
    # halo rows are masked in-kernel, and padded channels hit zero w1
    # rows, so the pad value only needs to be a valid int8
    xp = jnp.pad(
        x, ((0, 0), (1, 1), (0, 0), (0, Cp - C)), constant_values=np.int8(zp_x)
    )

    # pick the largest row-slab that keeps the working set in VMEM
    def est(bh):
        return _fused_block_vmem(bh, W, Cp, Ep, C2p)

    if est(1) > vmem_budget:
        raise ValueError(
            f"fused_block_int8: even a 1-row slab needs {est(1)} B VMEM "
            f"(> budget {vmem_budget}); run the block unfused"
        )
    bh = next(d for d in range(H, 0, -1) if H % d == 0 and est(d) <= vmem_budget)
    n_h = H // bh
    if n_h > 1:
        slabs = jnp.stack(
            [xp[:, i * bh : i * bh + bh + 2] for i in range(n_h)], axis=1
        )
        xin = slabs.reshape(N * n_h, bh + 2, W, Cp)
    else:
        xin = xp
    grid_n = N * n_h

    meta = (
        bh, W, H, n_h,
        float(s_x), int(zp_x),
        float(c1_grid[0]), int(c1_grid[1]),
        float(e_grid[0]), int(e_grid[1]),
        float(d_grid[0]), int(d_grid[1]),
        act1_q, act2_q,
        res,
        float(res_grid[0]) if res else 0.0, int(res_grid[1]) if res else 0,
        float(p_grid[0]) if res else 0.0, int(p_grid[1]) if res else 0,
        out_grid is None,
        float(out_grid[0]) if out_grid else 0.0,
        int(out_grid[1]) if out_grid else 0,
    )
    kernel = functools.partial(_fused_block_kernel, meta=meta)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (grid_n, bh, W, C2p), jnp.float32 if out_grid is None else jnp.int8
        ),
        grid=(grid_n,),
        in_specs=[
            pl.BlockSpec(
                (1, bh + 2, W, Cp), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 11,
        out_specs=pl.BlockSpec(
            (1, bh, W, C2p), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((bh + 2, W + 2, Ep), jnp.int8)],
        cost_estimate=pl.CostEstimate(
            flops=2 * grid_n * (bh + 2) * W * (Cp * Ep + 9 * Ep)
            + 2 * grid_n * bh * W * Ep * C2p,
            bytes_accessed=grid_n * (bh + 2) * W * Cp
            + grid_n * bh * W * C2p
            + Cp * Ep + Ep * C2p,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(
        xin, jnp.asarray(w1p), jnp.asarray(sc1), jnp.asarray(b1),
        jnp.asarray(ws1), jnp.asarray(wdp), jnp.asarray(scd),
        jnp.asarray(bd), jnp.asarray(w2p), jnp.asarray(sc2),
        jnp.asarray(b2), jnp.asarray(ws2),
    )
    out = out.reshape(N, H, W, C2p)
    return out[..., :C2]
