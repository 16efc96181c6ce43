"""Generate the committed golden deployment artifact (``golden/``).

The analog of the reference's checked-in worked int8 example —
``modeling/ncnn/model_quant_relu_equal.{param,bin,table}``, produced by
``/root/reference/convert_ncnn.py:179-209`` — so a fresh clone can run a
deployed artifact through BOTH the JAX int8 engine and the native C++
runtime without regenerating anything.

The model is a small fixed-seed net exercising the deployment-relevant
structures (stem conv, inverted-residual block with an add, global pool,
linear head), converted in the same ncnn-compatible regime convert.py
uses (symmetric signed weights, 32-bit bias — the Int8' rows). Inputs
and JAX-engine logits are pinned as .npy next to the artifact.

Regenerate ONLY for a deliberate semantic change (and say why in the
commit message)::

    python scripts/make_golden_artifact.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")

import jax

jax.config.update("jax_platforms", "cpu")  # pinned logits must be platform-stable

import jax.numpy as jnp
import numpy as np

from dfq_tpu.engine import execute_int8, lower_int8
from dfq_tpu.graph.ir import GraphBuilder
from dfq_tpu.io import save_artifact
from dfq_tpu.io.native_export import save_native_artifact
from dfq_tpu.models import init_params
from dfq_tpu.pipeline import QuantConfig, prepare

GOLDEN = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "golden")


def golden_graph():
    b = GraphBuilder()
    x = b.input("data")
    x = b.conv("stem", x, 3, 8, (3, 3), stride=(2, 2), padding=(1, 1))
    x = b.bn("stem_bn", x, 8)
    x = b.relu6("stem_act", x)
    y = b.conv("exp", x, 8, 24, (1, 1))
    y = b.bn("exp_bn", y, 24)
    y = b.relu6("exp_act", y)
    y = b.conv("dw", y, 24, 24, (3, 3), padding=(1, 1), groups=24)
    y = b.bn("dw_bn", y, 24)
    y = b.relu6("dw_act", y)
    y = b.conv("proj", y, 24, 8, (1, 1))
    y = b.bn("proj_bn", y, 8)
    z = b.add("res", x, y)
    z = b.global_mean("gm", z)
    z = b.linear("fc", z, 8, 10)
    return b.build([z])


def main():
    g = golden_graph()
    p = init_params(g, seed=7, bn_stats="random")
    # ncnn-compatible deployment regime (cli/convert.py): signed
    # symmetric weights, raw 32-bit bias, ReLU6->ReLU + equalization
    cfg = QuantConfig(
        quantize=True, relu=True, equalize=True, signed=True, bits_bias=32
    )
    prep = prepare(g, p, cfg)
    model = lower_int8(prep)
    residual = {k: v for k, v in prep.params.items() if k not in model.layers}

    os.makedirs(GOLDEN, exist_ok=True)
    save_artifact(os.path.join(GOLDEN, "artifact"), model, residual)
    save_native_artifact(os.path.join(GOLDEN, "model_native"), model, residual)

    rng = np.random.default_rng(42)
    x = np.clip(rng.normal(0, 1, (4, 32, 32, 3)), -2.117, 2.64).astype(np.float32)
    logits = np.asarray(
        jax.jit(lambda v: execute_int8(model, prep.params, v))(jnp.asarray(x))
    )
    np.save(os.path.join(GOLDEN, "input.npy"), x)
    np.save(os.path.join(GOLDEN, "logits.npy"), logits)
    print(f"golden artifact written to {GOLDEN}/")
    print(f"logits digest: {np.round(logits, 6).tobytes()[:16].hex()}")


if __name__ == "__main__":
    main()
