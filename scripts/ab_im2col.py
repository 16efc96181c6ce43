"""Same-session kernel-level A/B: XLA conv vs shift9 vs im2col for the
dense-k3 int8 shape class (VERDICT r4, Next #1).

Context: XLA's spatial k3-conv configs cap near ~80 TOPS on v5e while
its int8 matmul configs hit ~276 TOPS (PERFORMANCE.md kernel table).
The shift9 lowering (engine/int8.py:_int8_conv_shift9) presents the
same MACs as 9 accumulated [N*oh*ow, Cin]x[Cin, Cout] matmuls;
im2col as one [N*oh*ow, 9Cin] matmul. Both are bit-exact.

Shapes: DeepLab's decoder dominator (decoder.last_conv.0, 2.38 ms =
28% of the b8@513 step, 78 TOPS in PROF_DEEPLAB_r04.json), its twin,
one ASPP dilated conv, and ResNet-18's four residual-stage k3 shapes
plus a stride-2 downsample at b128.

All candidates timed in ONE process (tunnel variance is +/-20%
cross-session). Output: one JSON object with per-shape ms + TOPS.
"""

import json
import sys

sys.path.insert(0, ".")

import bench

SHAPES = [
    # (tag, B, H, Cin, Cout, stride, pad, dil)
    ("dl_dec0_b8_129", 8, 129, 304, 256, 1, 1, 1),
    ("dl_dec4_b8_129", 8, 129, 256, 256, 1, 1, 1),
    ("dl_aspp_d12_b8_33", 8, 33, 320, 256, 1, 12, 12),
    ("r18_56_c64_b128", 128, 56, 64, 64, 1, 1, 1),
    ("r18_28_c128_b128", 128, 28, 128, 128, 1, 1, 1),
    ("r18_14_c256_b128", 128, 14, 256, 256, 1, 1, 1),
    ("r18_7_c512_b128", 128, 7, 512, 512, 1, 1, 1),
    ("r18_s2_56to28_b128", 128, 56, 64, 128, 2, 1, 1),
]


def main():
    import argparse

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dfq_tpu.engine.int8 import (
        _int8_conv,
        _int8_conv_im2col,
        _int8_conv_shift9,
    )
    from dfq_tpu.graph.ir import Node

    ap = argparse.ArgumentParser()
    ap.add_argument("--only", type=str, default=None,
                    help="substring filter on shape tags")
    args = ap.parse_args()

    bench.enable_compile_cache()
    bench.tunnel_warmup()
    # bare-forward warmup so the first conv never compiles inside a loop
    rng = np.random.default_rng(0)

    results = {}
    for tag, B, H, cin, cout, s, p, d in SHAPES:
        if args.only and args.only not in tag:
            continue
        node = Node(name="c", op="conv", inputs=("x",), attrs={
            "kernel": (3, 3), "stride": (s, s), "padding": (p, p),
            "dilation": (d, d), "groups": 1, "in_ch": cin, "out_ch": cout,
            "bias": False})
        qw = jnp.asarray(rng.integers(-127, 128, (3, 3, cin, cout)), jnp.int8)
        zp = 3
        x = jax.jit(
            lambda: jax.random.randint(
                jax.random.PRNGKey(0), (B, H, H, cin), -128, 128, jnp.int8
            )
        )()
        oh = (H + 2 * p - d * 2 - 1) // s + 1
        macs = B * oh * oh * cin * cout * 9
        est_ms = macs * 2 / 60e12 * 1e3  # assume ~60 TOPS for sizing
        n_small = max(2, int(60 / max(est_ms, 0.05)))
        n_big = n_small * 6
        row = {"macs": macs, "n": [n_small, n_big]}
        for name, fn in [
            ("conv", _int8_conv),
            ("shift9", _int8_conv_shift9),
            ("im2col", _int8_conv_im2col),
        ]:
            t = bench.step_time(
                lambda v, fn=fn: fn(v, node, qw, zp).astype(jnp.float32) * 1e-6,
                x, n_small=n_small, n_big=n_big, tag=f"{tag}/{name}",
            )
            row[name] = {"ms": round(t * 1e3, 3),
                         "tops": round(macs * 2 / t / 1e12, 1)}
            print(f"# {tag} {name}: {t*1e3:.3f} ms = "
                  f"{macs*2/t/1e12:.1f} TOPS", file=sys.stderr)
        row["best"] = min(("conv", "shift9", "im2col"), key=lambda k: row[k]["ms"])
        row["speedup_vs_conv"] = round(
            row["conv"]["ms"] / row[row["best"]]["ms"], 3)
        results[tag] = row
    print(json.dumps({
        "experiment": "dense-k3 int8: XLA conv vs shift9 vs im2col "
                      "(same session, kernel-level)",
        "shapes": results,
    }))


if __name__ == "__main__":
    main()
