"""Native C++ runtime: build, export, and parity with the JAX int8 engine."""

import os
import shutil
import subprocess

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfq_tpu.engine import execute_int8, lower_int8
from dfq_tpu.io.native_export import save_native_artifact
from dfq_tpu.models import init_params, mobilenet_v2
from dfq_tpu.pipeline import QuantConfig, prepare

pytestmark = pytest.mark.skipif(
    shutil.which("cmake") is None, reason="cmake not available"
)


@pytest.fixture(scope="module")
def native_lib():
    from dfq_tpu.engine.native import build_native

    try:
        return build_native()
    except subprocess.CalledProcessError as e:
        pytest.skip(f"native build failed: {e.stderr[-500:]}")


@pytest.fixture(scope="module")
def mnv2_prepared():
    graph = mobilenet_v2()
    params = init_params(graph, seed=0, bn_stats="random")
    cfg = QuantConfig(quantize=True, relu=True, equalize=True, bits_bias=16)
    prep = prepare(graph, params, cfg)
    model = lower_int8(prep)
    return prep, model


def test_native_matches_jax_int8(native_lib, mnv2_prepared, tmp_path):
    from dfq_tpu.engine.native import NativeModel

    prep, model = mnv2_prepared
    prefix = str(tmp_path / "mnv2")
    residual = {k: v for k, v in prep.params.items() if k not in model.layers}
    save_native_artifact(prefix, model, residual)
    assert os.path.exists(prefix + ".dfqparam")
    assert os.path.exists(prefix + ".dfqbin")

    nm = NativeModel(prefix, lib_path=native_lib)
    rng = np.random.default_rng(0)
    x = np.clip(rng.normal(0, 1, (2, 224, 224, 3)), -2.117, 2.64).astype(np.float32)

    ref = np.asarray(jax.jit(lambda v: execute_int8(model, prep.params, v))(jnp.asarray(x)))
    out = nm.forward(x)[0]
    assert out.shape == ref.shape
    # integer conv paths are exact; the float epilogues (scale mul, bias
    # add, requant round) run in different orders in C++ vs XLA, so
    # isolated elements can land one requant step apart
    diff = np.abs(out - ref)
    assert diff.mean() < 2e-3, diff.mean()
    assert diff.max() < 5e-2, diff.max()
    assert float(np.mean(diff < 5e-3)) > 0.9
    # top-1 agreement must be total
    assert (out.argmax(-1) == ref.argmax(-1)).all()


def test_native_tiny_graph_exact(native_lib, tmp_path):
    """Single int8 conv: native and JAX must agree to float rounding."""
    from dfq_tpu.engine.native import NativeModel
    from dfq_tpu.graph.ir import GraphBuilder

    b = GraphBuilder()
    x = b.input("data")
    x = b.conv("c", x, 4, 8, (3, 3), stride=(2, 2), padding=(1, 1))
    x = b.relu("r", x)
    g = b.build([x])
    params = init_params(g, seed=1)
    prep = prepare(g, params, QuantConfig(quantize=False))
    prep.act_ranges = {"c:in0": (-2.0, 2.0)}
    model = lower_int8(prep)
    prefix = str(tmp_path / "tiny")
    save_native_artifact(prefix, model, {})

    nm = NativeModel(prefix, lib_path=native_lib)
    rng = np.random.default_rng(2)
    xin = rng.normal(0, 1, (1, 8, 8, 4)).astype(np.float32)
    ref = np.asarray(
        jax.jit(lambda v: execute_int8(model, prep.params, v))(jnp.asarray(xin))
    )
    out = nm.forward(xin)[0]
    np.testing.assert_allclose(out, ref, atol=1e-5)
