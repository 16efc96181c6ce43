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


def test_native_runs_deeplab_graph(native_lib, tmp_path):
    """The native runtime executes a full DeepLab-MNV2 graph (dilated
    convs, ASPP global-pool branch, interpolate, concat) and matches the
    JAX int8 engine — the deployment path is not classification-only."""
    from dfq_tpu.engine.native import NativeModel
    from dfq_tpu.models import deeplab_mobilenet_v2

    g = deeplab_mobilenet_v2(input_size=65)
    params = init_params(g, seed=0, bn_stats="random")
    cfg = QuantConfig(quantize=True, relu=True, equalize=True, bits_bias=16)
    prep = prepare(g, params, cfg)
    model = lower_int8(prep)
    prefix = str(tmp_path / "deeplab")
    residual = {k: v for k, v in prep.params.items() if k not in model.layers}
    save_native_artifact(prefix, model, residual)

    nm = NativeModel(prefix, lib_path=native_lib)
    rng = np.random.default_rng(1)
    x = np.clip(rng.normal(0, 1, (1, 65, 65, 3)), -2.117, 2.64).astype(np.float32)
    ref = np.asarray(
        jax.jit(lambda v: execute_int8(model, prep.params, v))(jnp.asarray(x))
    )
    out = nm.forward(x)[0]
    assert out.shape == ref.shape == (1, 65, 65, 21)
    diff = np.abs(out - ref)
    # integer conv cores exact; float epilogues may differ by a requant
    # step on isolated elements (same contract as the MNV2 parity test)
    assert diff.mean() < 2e-3, diff.mean()
    assert float(np.mean(diff < 5e-3)) > 0.9
    # per-pixel class decisions agree almost everywhere
    agree = float((out.argmax(-1) == ref.argmax(-1)).mean())
    assert agree > 0.95, agree


def test_native_runs_ssd_graph(native_lib, tmp_path):
    """The native runtime executes the SSD-Lite multi-head graph (two
    outputs, conv-without-BN heads, test-mode softmax) and matches the
    JAX int8 engine's decisions."""
    from dfq_tpu.engine.native import NativeModel
    from dfq_tpu.models import mobilenet_v2_ssd_lite

    g = mobilenet_v2_ssd_lite(num_classes=21)
    params = init_params(g, seed=0, bn_stats="random")
    cfg = QuantConfig(
        quantize=True, relu=True, equalize=True, bits_bias=16,
        is_detection=True,
    )
    prep = prepare(g, params, cfg)
    model = lower_int8(prep)
    prefix = str(tmp_path / "ssd")
    residual = {k: v for k, v in prep.params.items() if k not in model.layers}
    save_native_artifact(prefix, model, residual)

    nm = NativeModel(prefix, lib_path=native_lib)
    rng = np.random.default_rng(2)
    x = np.clip(rng.normal(0, 0.5, (1, 300, 300, 3)), -1, 1).astype(np.float32)
    conf_ref, loc_ref = jax.jit(
        lambda v: execute_int8(model, prep.params, v)
    )(jnp.asarray(x))
    outs = nm.forward(x)
    assert len(outs) == 2
    conf, loc = outs
    conf_ref, loc_ref = np.asarray(conf_ref), np.asarray(loc_ref)
    assert conf.shape == conf_ref.shape == (1, 3000, 21)
    assert loc.shape == loc_ref.shape == (1, 3000, 4)
    np.testing.assert_allclose(conf.sum(-1), 1.0, atol=1e-4)
    assert np.abs(conf - conf_ref).mean() < 5e-3
    assert np.abs(loc - loc_ref).mean() < np.abs(loc_ref).mean() * 0.1
