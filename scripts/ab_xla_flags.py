"""XLA tuning-flag sweep for the two named config ceilings (VERDICT r4,
Next #6): the b=32 serving point (XLA's small-batch conv configs) and a
lane-misaligned dense k3 conv (the pre-chpad DeepLab dominator shape).

XLA_FLAGS are read once at backend init, so every configuration runs in
a FRESH subprocess (strictly sequentially — the tunnel TPU is
single-client). Each child times two targets with the slope method:

  - fused MNV2 b=32 (the cliff point: 8.1k img/s vs 23.5k at b=128)
  - the raw int8 conv at Cin=304/129^2/b8 with chpad disabled (the
    shape class XLA configures at ~79 TOPS)

Parent writes XLAFLAGS_r05.json with per-flag deltas vs baseline. A
null result is a result: these are the last within-stack knobs.
"""

import json
import os
import subprocess
import sys

CHILD = r"""
import sys, json
sys.path.insert(0, ".")
import bench
import jax, jax.numpy as jnp, numpy as np

bench.enable_compile_cache()
bench.tunnel_warmup()
out = {}

_, _, prep, model = bench._prep_model("mnv2")
from dfq_tpu.engine.int8_fused import execute_int8_fused
x32 = jax.jit(lambda: jax.random.normal(jax.random.PRNGKey(0),
                                        (32, 224, 224, 3), jnp.float32))()
t = bench.step_time(lambda v: execute_int8_fused(model, prep.params, v),
                    x32, n_small=10, n_big=60, tag="mnv2 b32")
out["mnv2_b32"] = {"ms": round(t * 1e3, 3), "img_per_s": round(32 / t, 1)}

from dfq_tpu.engine.int8 import _int8_conv
from dfq_tpu.graph.ir import Node
node = Node(name="c", op="conv", inputs=("x",), attrs={
    "kernel": (3, 3), "stride": (1, 1), "padding": (1, 1),
    "dilation": (1, 1), "groups": 1, "in_ch": 304, "out_ch": 256,
    "bias": False})
rng = np.random.default_rng(0)
qw = jnp.asarray(rng.integers(-127, 128, (3, 3, 304, 256)), jnp.int8)
xk = jax.jit(lambda: jax.random.randint(jax.random.PRNGKey(1),
                                        (8, 129, 129, 304), -128, 128,
                                        jnp.int8))()
t = bench.step_time(
    lambda v: _int8_conv(v, node, qw, 3).astype(jnp.float32) * 1e-6,
    xk, n_small=19, n_big=114, tag="k3 c304")
macs = 8 * 129 * 129 * 304 * 256 * 9
out["k3_c304"] = {"ms": round(t * 1e3, 3),
                  "tops": round(macs * 2 / t / 1e12, 1)}
print("CHILD_RESULT " + json.dumps(out))
"""

CONFIGS = {
    "baseline": "",
    "opt_level_3": "--xla_backend_optimization_level=3",
    "vmem_96mb": "--xla_tpu_scoped_vmem_limit_kib=98304",
    "vmem_32mb": "--xla_tpu_scoped_vmem_limit_kib=32768",
    "no_latency_hiding": "--xla_tpu_enable_latency_hiding_scheduler=false",
}


def main():
    results = {}
    for name, flags in CONFIGS.items():
        env = dict(os.environ)
        env["XLA_FLAGS"] = flags
        # fresh process; do NOT share the compile cache across flag
        # configs (cached executables would mask the flag's effect)
        env["DFQ_TPU_DISABLE_COMPILE_CACHE"] = "1"
        print(f"# running config {name!r}: XLA_FLAGS={flags!r}",
              file=sys.stderr, flush=True)
        res = subprocess.run(
            [sys.executable, "-c", CHILD], capture_output=True, text=True,
            timeout=2400, env=env, cwd=".",
        )
        row = {"flags": flags}
        for line in res.stdout.splitlines():
            if line.startswith("CHILD_RESULT "):
                row.update(json.loads(line[len("CHILD_RESULT "):]))
        if "mnv2_b32" not in row:
            row["error"] = (res.stderr.strip()[-400:] or "no output")
        results[name] = row
        print(f"# {name}: {json.dumps(row)[:200]}", file=sys.stderr,
              flush=True)
    base = results.get("baseline", {})
    for name, row in results.items():
        if "mnv2_b32" in row and "mnv2_b32" in base:
            row["speedup_b32_vs_baseline"] = round(
                base["mnv2_b32"]["ms"] / row["mnv2_b32"]["ms"], 3)
        if "k3_c304" in row and "k3_c304" in base:
            row["speedup_k3_vs_baseline"] = round(
                base["k3_c304"]["ms"] / row["k3_c304"]["ms"], 3)
    print(json.dumps({
        "experiment": "XLA flag sweep on the b=32 serving point and the "
                      "lane-misaligned k3 conv (fresh process per config, "
                      "compile cache disabled)",
        "configs": results,
    }))


if __name__ == "__main__":
    main()
