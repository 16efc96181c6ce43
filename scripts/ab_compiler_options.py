"""XLA compiler-option sweep via per-compile ``compiler_options`` —
the route that actually reaches the TPU compiler through the tunnel.

``XLA_FLAGS`` with ``--xla_tpu_*`` flags die in the CLIENT's
parse_flags_from_env (XLAFLAGS_r05.json: 'Unknown flag' — the axon PJRT
client only knows generic XLA flags; compilation happens server-side).
``jit(...).lower(x).compile(compiler_options={...})`` ships options in
the compile RPC instead, so TPU-backend knobs can be A/B'd in ONE
session. Unknown options raise at compile — recorded per config.

Targets (same as the flag sweep): fused MNV2 b=32 (the serving cliff)
and the lane-misaligned k3 conv (Cin=304, chpad off).
"""

import json
import sys

sys.path.insert(0, ".")

import bench

CONFIGS = {
    "baseline": {},
    "vmem_96mb": {"xla_tpu_scoped_vmem_limit_kib": "98304"},
    "vmem_32mb": {"xla_tpu_scoped_vmem_limit_kib": "32768"},
    "no_latency_hiding": {"xla_tpu_enable_latency_hiding_scheduler": "false"},
    "aggressive_fusion": {"xla_tpu_enable_aggressive_loop_fusion": "true"},
}


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dfq_tpu.engine.int8 import _int8_conv
    from dfq_tpu.engine.int8_fused import execute_int8_fused
    from dfq_tpu.graph.ir import Node

    # compiler_options vary per compile; the persistent cache would key
    # them correctly, but disable it to be certain nothing is masked
    bench.tunnel_warmup()

    _, _, prep, model = bench._prep_model("mnv2")
    x32 = jax.jit(lambda: jax.random.normal(
        jax.random.PRNGKey(0), (32, 224, 224, 3), jnp.float32))()

    node = Node(name="c", op="conv", inputs=("x",), attrs={
        "kernel": (3, 3), "stride": (1, 1), "padding": (1, 1),
        "dilation": (1, 1), "groups": 1, "in_ch": 304, "out_ch": 256,
        "bias": False})
    rng = np.random.default_rng(0)
    qw = jnp.asarray(rng.integers(-127, 128, (3, 3, 304, 256)), jnp.int8)
    xk = jax.jit(lambda: jax.random.randint(
        jax.random.PRNGKey(1), (8, 129, 129, 304), -128, 128, jnp.int8))()
    macs = 8 * 129 * 129 * 304 * 256 * 9

    results = {}
    for name, opts in CONFIGS.items():
        row = {"options": opts}
        try:
            t = bench.step_time(
                lambda v: execute_int8_fused(
                    model, prep.params, v, chpad_k3=False
                ),
                x32, n_small=10, n_big=60, tag=f"{name}/mnv2b32",
                compiler_options=opts or None,
            )
            row["mnv2_b32"] = {"ms": round(t * 1e3, 3),
                               "img_per_s": round(32 / t, 1)}
            t = bench.step_time(
                lambda v: _int8_conv(v, node, qw, 3).astype(jnp.float32)
                * 1e-6,
                xk, n_small=19, n_big=114, tag=f"{name}/k3c304",
                compiler_options=opts or None,
            )
            row["k3_c304"] = {"ms": round(t * 1e3, 3),
                              "tops": round(macs * 2 / t / 1e12, 1)}
        except Exception as e:  # unknown option, server reject, ...
            row["error"] = str(e)[:300]
        results[name] = row
        print(f"# {name}: {json.dumps(row)[:220]}", file=sys.stderr,
              flush=True)
    base = results.get("baseline", {})
    for name, row in results.items():
        if "mnv2_b32" in row and "mnv2_b32" in base:
            row["speedup_b32"] = round(
                base["mnv2_b32"]["ms"] / row["mnv2_b32"]["ms"], 3)
        if "k3_c304" in row and "k3_c304" in base:
            row["speedup_k3"] = round(
                base["k3_c304"]["ms"] / row["k3_c304"]["ms"], 3)
    print(json.dumps({
        "experiment": "TPU compiler_options sweep (one session, per-compile "
                      "options; chpad disabled on the k3 target)",
        "configs": results,
    }))


if __name__ == "__main__":
    main()
