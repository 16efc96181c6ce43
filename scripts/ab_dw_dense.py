"""Same-session A/B of the dw-on-MXU dense-diagonal rewrite.

Times the fused MNV2 engine at several ``dw_dense_max_ch`` thresholds in
ONE process (session-to-session tunnel variance is +/-20% and has
produced 2x outliers, so cross-session comparison is meaningless). The
rewrite is bit-exact (tests/test_int8_fused.py::test_dw_dense_diag_bit_exact);
this measures whether moving small-C depthwise convs from the VPU's
9-tap path to the MXU pays at model level — the "Known headroom #2"
experiment from PERFORMANCE.md.

MNV2 dw channel counts: 32,96,144,192 (early, high-res) / 384,576,960
(late, small-res). Threshold 192 moves only the early layers; 1024 all.
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

    from dfq_tpu.engine.int8_fused import execute_int8_fused

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--thresholds", type=int, nargs="*",
                    default=[0, 96, 192, 1024])
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

    results = {}
    n_small, n_big = bench.loop_counts(batch)
    for thresh in args.thresholds:
        t = bench.step_time(
            lambda v: execute_int8_fused(
                model, prep.params, v, dw_dense_max_ch=thresh
            ),
            x,
            n_small=n_small, n_big=n_big,
            tag=f"mnv2 dwdense{thresh}",
        )
        results[thresh] = batch / t
        print(f"# b{batch} dw_dense_max_ch={thresh}: {batch / t:.0f} img/s", file=sys.stderr)
    base = results[args.thresholds[0]]
    print(json.dumps({
        "experiment": f"dw_dense_max_ch A/B (same session, fused MNV2 b{batch})",
        "img_per_s": {str(k): round(v, 1) for k, v in results.items()},
        "speedup_vs_first": {
            str(k): round(v / base, 3) for k, v in results.items()
        },
    }))


if __name__ == "__main__":
    main()
