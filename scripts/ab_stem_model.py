"""Same-session model-level A/B: Cin=3->4 stem padding on fused
ResNet-18 b128 (kernel-level 1.22x, STEM_r05.json) and fused MNV2 at
b32 (whose k3 stem is s2d-intercepted only at b>=64 — checks the pad
helps or at least doesn't hurt the small-batch regime)."""

import json
import sys

sys.path.insert(0, ".")

import bench


def main():
    import jax
    import jax.numpy as jnp

    from dfq_tpu.engine.int8_fused import execute_int8_fused

    bench.enable_compile_cache()
    bench.tunnel_warmup()

    results = {}
    for which, batch in (("r18", 128), ("mnv2", 32)):
        _, _, prep, model = bench._prep_model(which)
        x = jax.jit(
            lambda b=batch: jax.random.normal(
                jax.random.PRNGKey(0), (b, 224, 224, 3), jnp.float32
            )
        )()
        n_small, n_big = bench.loop_counts(batch)
        row = {}
        for chpad in (False, True):
            t = bench.step_time(
                lambda v, c=chpad: execute_int8_fused(
                    model, prep.params, v, chpad_k3=c
                ),
                x, n_small=n_small, n_big=n_big,
                tag=f"{which} b{batch} chpad={chpad}",
            )
            row[str(chpad)] = {"ms": round(t * 1e3, 3),
                               "img_per_s": round(batch / t, 1)}
            print(f"# {which} b{batch} chpad={chpad}: {t*1e3:.3f} ms = "
                  f"{batch/t:.0f} img/s", file=sys.stderr)
        row["speedup"] = round(row["False"]["ms"] / row["True"]["ms"], 3)
        results[f"{which}_b{batch}"] = row
    print(json.dumps({
        "experiment": "stem Cin=3->4 padding, model-level (same session)",
        "results": results,
    }))


if __name__ == "__main__":
    main()
