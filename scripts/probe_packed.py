"""Probe: can a space-to-depth-packed layout accelerate the lane-starved
early MobileNetV2 layers under XLA?

Block-1 dw 3x3 s1 C=32 @ 112^2 uses 32 of 128 lanes at the largest
spatial size (PERFORMANCE.md: the stem segment is 42% of runtime).
Packing 2x2 pixels into channels gives [56^2, 128] tensors; the dw
becomes a grouped conv (groups=C, 4 in / 4 out positions per group,
2x2 taps) and the pointwise convs become groups=4 block-diagonal
matmuls. This measures the layer-level potential before any engine
work.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, ".")
from bench import step_time  # noqa: E402


def main():
    N = 32
    rng = np.random.default_rng(0)

    # A) unpacked dw 3x3 s1, C=32 @ 112^2 (int8 -> int32, zp-folded style)
    C = 32
    x = jnp.asarray(rng.integers(-128, 128, (N, 112, 112, C)), jnp.int8)
    wk = jnp.asarray(rng.integers(-30, 30, (3, 3, 1, C)), jnp.int8)
    scale = jnp.asarray(rng.uniform(1e-3, 1e-2, C), jnp.float32)

    def dw_unpacked(v):
        acc = lax.conv_general_dilated(
            v.astype(jnp.int8), wk, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C,
            preferred_element_type=jnp.int32,
        )
        f = acc.astype(jnp.float32) * scale
        q = jnp.round(f / 0.05) + 121
        return (jnp.clip(q, 0.0, 255.0) - 128.0).astype(jnp.int8)

    # B) packed dw: [56^2, 4C] tensor, grouped conv (4 in / 4 out per ch)
    xp = jnp.asarray(rng.integers(-128, 128, (N, 56, 56, 4 * C)), jnp.int8)
    wp = jnp.asarray(rng.integers(-30, 30, (2, 2, 4, 4 * C)), jnp.int8)
    scale_p = jnp.asarray(rng.uniform(1e-3, 1e-2, 4 * C), jnp.float32)

    def dw_packed(v):
        acc = lax.conv_general_dilated(
            v.astype(jnp.int8), wp, (1, 1), ((1, 0), (1, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C,
            preferred_element_type=jnp.int32,
        )
        f = acc.astype(jnp.float32) * scale_p
        q = jnp.round(f / 0.05) + 121
        return (jnp.clip(q, 0.0, 255.0) - 128.0).astype(jnp.int8)

    # C) unpacked pw 32 -> 16 @ 112^2 vs packed grouped pw @ 56^2
    wpw = jnp.asarray(rng.integers(-30, 30, (1, 1, 32, 16)), jnp.int8)

    def pw_unpacked(v):
        acc = lax.conv_general_dilated(
            v.astype(jnp.int8), wpw, (1, 1), ((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        return acc.astype(jnp.float32).sum(-1, keepdims=True).astype(jnp.int8)

    wpw_p = jnp.asarray(rng.integers(-30, 30, (1, 1, 32, 64)), jnp.int8)

    def pw_packed(v):
        acc = lax.conv_general_dilated(
            v.astype(jnp.int8), wpw_p, (1, 1), ((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=4,
            preferred_element_type=jnp.int32,
        )
        return acc.astype(jnp.float32).sum(-1, keepdims=True).astype(jnp.int8)

    t_a = step_time(lambda v: dw_unpacked(v.astype(jnp.int8)),
                    x.astype(jnp.float32), tag="dw unpacked")
    t_b = step_time(lambda v: dw_packed(v.astype(jnp.int8)),
                    xp.astype(jnp.float32), tag="dw packed")
    t_c = step_time(lambda v: pw_unpacked(v.astype(jnp.int8)),
                    x.astype(jnp.float32), tag="pw unpacked")
    t_d = step_time(lambda v: pw_packed(v.astype(jnp.int8)),
                    xp.astype(jnp.float32), tag="pw packed")
    print(f"RESULT dw: unpacked {t_a*1e6:.0f}us packed {t_b*1e6:.0f}us "
          f"({t_a/t_b:.2f}x), pw: unpacked {t_c*1e6:.0f}us packed "
          f"{t_d*1e6:.0f}us ({t_c/t_d:.2f}x)", file=sys.stderr)


if __name__ == "__main__":
    main()
