"""Same-session A/B: zero-weight channel padding of lane-misaligned
dense k3 int8 convs up to the 128-lane grid.

Discovery from IM2COL_r05.json: dense k3 convs with lane-aligned Cin
already run at XLA's matmul rate (256ch: 315 TOPS, 128: 318, 512: 338)
— the "~80 TOPS k3 class" is a channel-misalignment artifact. DeepLab's
dominator (decoder.last_conv.0, Cin=304 = 2.375 lanes) measures 79
TOPS. Hypothesis: pad Cin 304->384 (3 lanes) with zp-valued activation
columns and ZERO weight rows (exact: zero weights contribute nothing)
and the conv should run near the aligned rate; 1.26x more MACs at ~4x
the rate = ~3x net.

Candidates per shape: conv (baseline), conv_chpad (pad to next multiple
of 128, pad cost INCLUDED), conv_chpad_pre (input already padded — the
engine can make producers emit padded channels, so this is the
steady-state cost).
"""

import json
import sys

sys.path.insert(0, ".")

import bench

SHAPES = [
    # (tag, B, H, Cin, Cout, stride, pad, dil)
    ("dl_dec0_b8_129_c304", 8, 129, 304, 256, 1, 1, 1),
    ("dl_aspp_d12_b8_33_c320", 8, 33, 320, 256, 1, 12, 12),
    ("r18_s2_56to28_c64", 128, 56, 64, 128, 2, 1, 1),
    ("r18_56_c64", 128, 56, 64, 64, 1, 1, 1),
]


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dfq_tpu.engine.int8 import _int8_conv
    from dfq_tpu.graph.ir import Node

    bench.enable_compile_cache()
    bench.tunnel_warmup()
    rng = np.random.default_rng(0)

    results = {}
    for tag, B, H, cin, cout, s, p, d in SHAPES:
        cpad = ((cin + 127) // 128) * 128
        node = Node(name="c", op="conv", inputs=("x",), attrs={
            "kernel": (3, 3), "stride": (s, s), "padding": (p, p),
            "dilation": (d, d), "groups": 1, "in_ch": cin, "out_ch": cout,
            "bias": False})
        node_p = node.replace(attrs={**node.attrs, "in_ch": cpad})
        qw = jnp.asarray(rng.integers(-127, 128, (3, 3, cin, cout)), jnp.int8)
        qw_p = jnp.concatenate(
            [qw, jnp.zeros((3, 3, cpad - cin, cout), jnp.int8)], axis=2)
        zp = 3
        x = jax.jit(
            lambda: jax.random.randint(
                jax.random.PRNGKey(0), (B, H, H, cin), -128, 128, jnp.int8
            )
        )()
        xp = jax.jit(
            lambda: jax.random.randint(
                jax.random.PRNGKey(0), (B, H, H, cpad), -128, 128, jnp.int8
            )
        )()
        oh = (H + 2 * p - d * 2 - 1) // s + 1
        macs = B * oh * oh * cin * cout * 9
        est_ms = macs * 2 / 60e12 * 1e3
        n_small = max(2, int(60 / max(est_ms, 0.05)))
        n_big = n_small * 6

        def conv_base(v):
            return _int8_conv(v, node, qw, zp).astype(jnp.float32) * 1e-6

        def conv_chpad(v):
            vp = jnp.pad(v, ((0, 0), (0, 0), (0, 0), (0, cpad - cin)),
                         constant_values=np.int8(zp))
            return _int8_conv(vp, node_p, qw_p, zp).astype(jnp.float32) * 1e-6

        def conv_chpad_pre(v):
            return _int8_conv(v, node_p, qw_p, zp).astype(jnp.float32) * 1e-6

        row = {"macs": macs, "cin": cin, "cpad": cpad, "n": [n_small, n_big]}
        for name, fn, xx in [("conv", conv_base, x),
                             ("chpad", conv_chpad, x),
                             ("chpad_pre", conv_chpad_pre, xp)]:
            t = bench.step_time(fn, xx, n_small=n_small, n_big=n_big,
                                tag=f"{tag}/{name}")
            row[name] = {"ms": round(t * 1e3, 3),
                         "tops": round(macs * 2 / t / 1e12, 1)}
            print(f"# {tag} {name}: {t*1e3:.3f} ms = "
                  f"{macs*2/t/1e12:.1f} TOPS (logical)", file=sys.stderr)
        row["speedup_chpad"] = round(row["conv"]["ms"] / row["chpad"]["ms"], 3)
        row["speedup_chpad_pre"] = round(
            row["conv"]["ms"] / row["chpad_pre"]["ms"], 3)
        results[tag] = row
    print(json.dumps({
        "experiment": "dense-k3 int8 channel padding to the 128-lane grid "
                      "(same session, kernel-level; TOPS computed on "
                      "LOGICAL unpadded MACs)",
        "shapes": results,
    }))


if __name__ == "__main__":
    main()
