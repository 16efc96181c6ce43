"""Same-session A/B of the batch-to-space fold (the round-3 "remaining
idea" for the b=16-64 serving cliff, PERFORMANCE.md "small-batch
serving").

Times the fused MNV2 engine at several ``b2s_min_h`` thresholds in ONE
process (session variance is +/-20%; only same-process slopes compare).
The fold is bit-exact (tests/test_int8_fused.py::test_b2s_fold_bit_exact);
this measures whether stacking the batch along H — presenting XLA's conv
emitter with a batch-1 tall-image problem instead of the batch-16-64
configs that collapse to 17-31 GB/s on the stem/early dw convs — pays at
model level.

Thresholds: 0 = off; 112 = only the 112^2 layers (stem output, dw32,
dw96-in); 56 = + the 56^2 layers; 28 = + 28^2; 14 = everything k3p1.
"""

import json
import sys

sys.path.insert(0, ".")

import bench


def main():
    import argparse

    import jax
    import jax.numpy as jnp

    from dfq_tpu.engine.int8_fused import execute_int8_fused

    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="*", default=[8, 16, 32, 64])
    ap.add_argument("--thresholds", type=int, nargs="*",
                    default=[0, 112, 56, 28])
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()
    bench.enable_compile_cache()
    bench.tunnel_warmup()
    _, _, prep, model = bench._prep_model("mnv2")

    rows = []
    for batch in args.batches:
        x = jax.jit(
            lambda: jax.random.normal(
                jax.random.PRNGKey(0), (batch, 224, 224, 3), jnp.float32
            )
        )()
        n_small, n_big = bench.loop_counts(batch)
        results = {}
        for thresh in args.thresholds:
            t = bench.step_time(
                lambda v: execute_int8_fused(
                    model, prep.params, v, b2s_min_h=thresh
                ),
                x,
                n_small=n_small, n_big=n_big,
                tag=f"mnv2 b{batch} b2s{thresh}",
            )
            results[thresh] = round(batch / t, 1)
            print(
                f"# b{batch} b2s_min_h={thresh}: {batch / t:.0f} img/s",
                file=sys.stderr,
            )
        base = results[args.thresholds[0]]
        best = max(results, key=results.get)
        row = {
            "batch": batch,
            "img_s": results,
            "best": best,
            "speedup_best": round(results[best] / base, 3),
        }
        rows.append(row)
        print(json.dumps(row))
    if args.out:
        with open(args.out, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
