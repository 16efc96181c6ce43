"""Same-session A/B of ResNet-18 stem formulations (VERDICT r4 Weak #1:
r18 at 78.6% of bound, no diagnosis; PROF_R18_r05.json answers: conv1
(k7s2, Cin=3) = 0.97 ms = 26% of the 3.78 ms b128 step at 31 TOPS,
while every body conv runs 93-355 TOPS).

Candidates for the stem (all bit-exact int8 forms):
  conv        XLA k7s2p3 conv, Cin=3 (baseline; physical-padding waste)
  im2col      [N*112^2, 7*7*3=147] x [147, 64] single matmul over
              strided patches (engine helper, stride-aware)
  s2d2        space-to-depth(2): k4s1(... the r4 R18_S2D loss, for
              reference in the same session)
  chpad4      Cin padded 3->4 (dword-aligned c; cheap test of whether
              the config changes)
Plus maxpool int8 standalone (0.215 ms in-trace) for its HBM bound.
"""

import json
import sys

sys.path.insert(0, ".")

import bench


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dfq_tpu.engine.int8 import _int8_conv, _int8_conv_im2col
    from dfq_tpu.engine.int8_fused import _s2d_weights, _space_to_depth2
    from dfq_tpu.graph.ir import Node

    bench.enable_compile_cache()
    bench.tunnel_warmup()
    rng = np.random.default_rng(0)
    B = 128
    zp = 3

    node = Node(name="c", op="conv", inputs=("x",), attrs={
        "kernel": (7, 7), "stride": (2, 2), "padding": (3, 3),
        "dilation": (1, 1), "groups": 1, "in_ch": 3, "out_ch": 64,
        "bias": False})
    qw = jnp.asarray(rng.integers(-127, 128, (7, 7, 3, 64)), jnp.int8)
    x = jax.jit(
        lambda: jax.random.randint(
            jax.random.PRNGKey(0), (B, 224, 224, 3), -128, 128, jnp.int8
        )
    )()
    macs = B * 112 * 112 * 3 * 64 * 49
    out = {"macs_stem": macs}

    node4 = node.replace(attrs={**node.attrs, "in_ch": 4})
    qw4 = jnp.concatenate([qw, jnp.zeros((7, 7, 1, 64), jnp.int8)], axis=2)

    def conv_base(v):
        return _int8_conv(v, node, qw, zp).astype(jnp.float32) * 1e-6

    def conv_im2col(v):
        return _int8_conv_im2col(v, node, qw, zp).astype(jnp.float32) * 1e-6

    def conv_chpad4(v):
        vp = jnp.pad(v, ((0, 0), (0, 0), (0, 0), (0, 1)),
                     constant_values=np.int8(zp))
        return _int8_conv(vp, node4, qw4, zp).astype(jnp.float32) * 1e-6

    n_small, n_big = 40, 240
    for name, fn in [("conv", conv_base), ("im2col", conv_im2col),
                     ("chpad4", conv_chpad4)]:
        t = bench.step_time(fn, x, n_small=n_small, n_big=n_big,
                            tag=f"stem/{name}")
        out[name] = {"ms": round(t * 1e3, 3),
                     "tops": round(macs * 2 / t / 1e12, 1)}
        print(f"# stem {name}: {t*1e3:.3f} ms = {macs*2/t/1e12:.1f} TOPS "
              "(logical)", file=sys.stderr)

    # int8 maxpool 3x3s2 on the stem output shape
    xo = jax.jit(
        lambda: jax.random.randint(
            jax.random.PRNGKey(2), (B, 112, 112, 64), -128, 128, jnp.int8
        )
    )()

    def mp(v):
        r = jax.lax.reduce_window(
            v, np.int8(-128), jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            ((0, 0), (1, 1), (1, 1), (0, 0)),
        )
        return r.astype(jnp.float32) * 1e-6

    t = bench.step_time(mp, xo, n_small=n_small, n_big=n_big, tag="maxpool")
    mp_bytes = B * 112 * 112 * 64 + B * 56 * 56 * 64
    out["maxpool"] = {"ms": round(t * 1e3, 3),
                      "eff_gbps": round(mp_bytes / t / 1e9, 1)}
    print(f"# maxpool: {t*1e3:.3f} ms = {mp_bytes/t/1e9:.0f} GB/s",
          file=sys.stderr)

    # layer1 conv standalone WITH int8 requant epilogue (in-model form),
    # vs the bare acc form the IM2COL probe measured at 204 TOPS
    nodeL = Node(name="c", op="conv", inputs=("x",), attrs={
        "kernel": (3, 3), "stride": (1, 1), "padding": (1, 1),
        "dilation": (1, 1), "groups": 1, "in_ch": 64, "out_ch": 64,
        "bias": False})
    qwL = jnp.asarray(rng.integers(-127, 128, (3, 3, 64, 64)), jnp.int8)
    xL = jax.jit(
        lambda: jax.random.randint(
            jax.random.PRNGKey(3), (B, 56, 56, 64), -128, 128, jnp.int8
        )
    )()
    macsL = B * 56 * 56 * 64 * 64 * 9

    def convL_requant(v):
        acc = _int8_conv(v, nodeL, qwL, zp)
        f = acc.astype(jnp.float32) * 2e-4
        qq = jnp.clip(jnp.round(f / 3e-4) + zp, -128, 127).astype(jnp.int8)
        return qq.astype(jnp.float32) * 1e-6  # consume

    t = bench.step_time(convL_requant, xL, n_small=n_small, n_big=n_big,
                        tag="layer1conv+requant")
    out["layer1_conv_requant"] = {"ms": round(t * 1e3, 3),
                                  "tops": round(macsL * 2 / t / 1e12, 1)}
    print(f"# layer1 conv+requant: {t*1e3:.3f} ms = "
          f"{macsL*2/t/1e12:.1f} TOPS", file=sys.stderr)

    print(json.dumps({
        "experiment": "r18 stem + friends, same-session kernel A/B",
        "results": out,
    }))


if __name__ == "__main__":
    main()
