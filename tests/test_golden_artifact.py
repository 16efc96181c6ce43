"""The committed golden deployment artifact (``golden/``) must load and
reproduce its pinned outputs through BOTH execution stacks — the JAX
int8 engine and the native C++ runtime — from a fresh clone, with no
regeneration step. Analog of the reference's checked-in
``modeling/ncnn/model_quant_relu_equal.{param,bin,table}`` example.
Regenerate with ``scripts/make_golden_artifact.py`` ONLY for a
deliberate semantic change."""

import os
import shutil
import subprocess

import jax
import jax.numpy as jnp
import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "golden")


@pytest.fixture(scope="module")
def pinned():
    x = np.load(os.path.join(GOLDEN, "input.npy"))
    logits = np.load(os.path.join(GOLDEN, "logits.npy"))
    return x, logits


def test_golden_artifact_jax_engine(pinned):
    from dfq_tpu.engine import execute_int8
    from dfq_tpu.io import load_artifact

    x, want = pinned
    model, residual = load_artifact(os.path.join(GOLDEN, "artifact"))
    got = np.asarray(
        jax.jit(lambda v: execute_int8(model, residual, v))(jnp.asarray(x))
    )
    assert got.shape == want.shape == (4, 10)
    # same platform-stable integer path + f32 epilogues: byte-stable
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)
    np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))


def test_golden_artifact_fused_engine(pinned):
    from dfq_tpu.engine.int8_fused import execute_int8_fused
    from dfq_tpu.io import load_artifact

    x, want = pinned
    model, residual = load_artifact(os.path.join(GOLDEN, "artifact"))
    got = np.asarray(
        jax.jit(lambda v: execute_int8_fused(model, residual, v))(jnp.asarray(x))
    )
    # fused applies one extra rounding per int8 edge: decisions must hold
    assert np.isfinite(got).all()
    np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))


@pytest.mark.skipif(shutil.which("cmake") is None, reason="cmake not available")
def test_golden_artifact_native_runtime(pinned):
    from dfq_tpu.engine.native import NativeModel, build_native

    try:
        lib = build_native()
    except subprocess.CalledProcessError as e:
        pytest.skip(f"native build failed: {e.stderr[-500:]}")
    x, want = pinned
    nm = NativeModel(os.path.join(GOLDEN, "model_native"), lib_path=lib)
    got = nm.forward(x)[0]
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-4)
    np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))
