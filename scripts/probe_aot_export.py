"""Can the compiled fused executable be serialized into the deployment
artifact for cache-less <1s cold start? (round-3 verdict #8)

The instant-start story rides the machine-local, gitignored
``.jax_cache/``. The true analog of the reference's prebuilt ncnn binary
(``/root/reference/inference_cls.cpp:158-197``) would ship the compiled
executable inside the artifact. Two candidate mechanisms:

1. ``jax.experimental.serialize_executable`` (pickles the PJRT
   executable + in/out trees) — needs ``compile_options`` support in the
   backend and same-topology load;
2. ``jax.export`` (StableHLO) — portable, but deserialization still
   recompiles on load, so it saves tracing only, not compile time.

This probe measures both against the axon TPU plugin and prints a JSON
verdict. Run with NO compile cache to observe honest cold costs.
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    import bench

    out = {"platform": jax.devices()[0].platform,
           "device": str(jax.devices()[0])}

    bench.tunnel_warmup()
    _, _, prep, model = bench._prep_model("mnv2")
    from dfq_tpu.engine.int8_fused import execute_int8_fused

    x = jax.jit(
        lambda: jax.random.normal(
            jax.random.PRNGKey(0), (8, 224, 224, 3), jnp.float32
        )
    )()
    fwd = jax.jit(lambda v: execute_int8_fused(model, prep.params, v))
    t0 = time.time()
    lowered = fwd.lower(x)
    out["trace_lower_s"] = round(time.time() - t0, 2)
    t0 = time.time()
    compiled = lowered.compile()
    out["compile_s"] = round(time.time() - t0, 2)

    # --- mechanism 1: serialize the PJRT executable
    try:
        from jax.experimental import serialize_executable as se

        t0 = time.time()
        payload, in_tree, out_tree = se.serialize(compiled)
        out["pjrt_serialize_s"] = round(time.time() - t0, 2)
        out["pjrt_payload_mb"] = round(len(payload) / 1e6, 2)
        t0 = time.time()
        reloaded = se.deserialize_and_load(payload, in_tree, out_tree)
        out["pjrt_load_s"] = round(time.time() - t0, 2)
        y0 = jax.device_get(compiled(x))
        y1 = jax.device_get(reloaded(x))
        import numpy as np

        out["pjrt_outputs_equal"] = bool(np.array_equal(y0, y1))
        out["pjrt_executable_serialization"] = "SUPPORTED"
    except Exception as e:  # noqa: BLE001 - probe records any failure mode
        out["pjrt_executable_serialization"] = f"UNSUPPORTED: {type(e).__name__}: {e}"[:300]

    # --- mechanism 2: jax.export (StableHLO; saves tracing, not compile)
    try:
        from jax import export as jexport

        t0 = time.time()
        exp = jexport.export(fwd)(x)
        blob = exp.serialize()
        out["stablehlo_export_s"] = round(time.time() - t0, 2)
        out["stablehlo_blob_mb"] = round(len(blob) / 1e6, 2)
        t0 = time.time()
        rt = jexport.deserialize(blob)
        out["stablehlo_deserialize_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        y2 = jax.device_get(jax.jit(rt.call)(x))
        out["stablehlo_first_call_s"] = round(time.time() - t0, 2)
        out["stablehlo_export"] = "SUPPORTED"
    except Exception as e:  # noqa: BLE001
        out["stablehlo_export"] = f"UNSUPPORTED: {type(e).__name__}: {e}"[:300]

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
