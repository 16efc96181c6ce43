"""Same-session A/B of space-to-depth stem implementations.

The round-3 trace shows ~0.36 ms/step (6.6%) in data-formatting copies
and pads, much of it around the s2d stem's reshape/transpose (a
relayout copy of the whole 224^2 int8 input plus the packed transpose).
Candidate fix: build the 4 pixel-parity planes with strided slices and
concatenate on channels — same packed-channel order, but XLA can often
fold slices into the consumer without materializing a transpose.

Variants (identical math, bit-exact):
  reshape  - current: pad -> reshape -> transpose -> reshape
  slices   - pad -> 4 strided slices -> concat(channel)
  off      - stem_s2d=False (plain k3s2p1 conv, the pre-r1 baseline)
"""

import json
import sys
import time

sys.path.insert(0, ".")

import bench


def main():
    import argparse

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dfq_tpu.engine import int8_fused
    from dfq_tpu.engine.int8_fused import execute_int8_fused

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--variants", nargs="*", default=["reshape", "slices", "off"],
                    choices=["reshape", "slices", "off"])
    args = ap.parse_args()
    bench.enable_compile_cache()
    bench.tunnel_warmup()
    batch = args.batch
    _, _, prep, model = bench._prep_model("mnv2")
    x = jax.jit(
        lambda: jax.random.normal(
            jax.random.PRNGKey(0), (batch, 224, 224, 3), jnp.float32
        )
    )()

    orig = int8_fused._space_to_depth2

    def s2d_slices(xq, zp):
        xp = jnp.pad(
            xq, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=np.int8(zp)
        )
        parts = [
            xp[:, pi::2, pj::2, :] for pi in (0, 1) for pj in (0, 1)
        ]
        return jnp.concatenate(parts, axis=-1)

    # bit-exactness of the slice variant (device, small shape)
    xv = jnp.asarray(
        np.random.default_rng(0).integers(-128, 128, (2, 8, 8, 3)), jnp.int8
    )
    a = np.asarray(jax.jit(lambda v: orig(v, 3))(xv))
    b = np.asarray(jax.jit(lambda v: s2d_slices(v, 3))(xv))
    assert a.shape == b.shape
    # channel order check: orig packs (pi,pj) blocks interleaved per
    # pixel-pair; slices pack per-plane blocks — verify identical
    np.testing.assert_array_equal(a, b)
    print("# slice variant bit-exact", file=sys.stderr)

    results = {}
    b = batch
    n_small, n_big = bench.loop_counts(b)
    for name in args.variants:
        int8_fused._space_to_depth2 = s2d_slices if name == "slices" else orig
        stem = name != "off"
        t = bench.step_time(
            lambda v, s=stem: execute_int8_fused(model, prep.params, v, stem_s2d=s),
            x,
            n_small=n_small, n_big=n_big,
            tag=f"mnv2 b{b} s2d_{name}",
        )
        results[name] = batch / t
        print(f"# b{batch} s2d={name}: {batch / t:.0f} img/s", file=sys.stderr)
    int8_fused._space_to_depth2 = orig
    print(json.dumps({
        "experiment": f"s2d stem A/B (same session, fused MNV2 b{batch})",
        "img_per_s": {k: round(v, 1) for k, v in results.items()},
    }))


if __name__ == "__main__":
    main()
