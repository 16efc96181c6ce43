import numpy as np
import pytest

from dfq_tpu.quant.core import (
    affine_qparams_from_range,
    fake_quant,
    fake_quant_np,
    fake_quant_per_channel,
    quant_params,
)


def test_affine_roundtrip_exact_levels():
    # values already on the grid survive qdq exactly
    mn, mx = -1.0, 3.0
    scale = (mx - mn) / 255.0
    levels = mn + scale * np.array([0, 1, 17, 128, 255], np.float32)
    out = fake_quant_np(levels, mn, mx, bits=8)
    np.testing.assert_allclose(out, levels, atol=1e-6)


def test_affine_clamps_out_of_range():
    out = fake_quant_np(np.array([-10.0, 10.0], np.float32), -1.0, 1.0, bits=8)
    np.testing.assert_allclose(out, [-1.0, 1.0], atol=1e-6)


def test_symmetric_scale_uses_absmax():
    scale, offset, qmin, qmax = quant_params(
        np.float32(-4.0), np.float32(2.0), bits=8, symmetric=True
    )
    assert qmin == -128 and qmax == 127
    assert np.isclose(scale, 4.0 / 127.0)
    assert offset == 0.0


def test_scale_floor():
    scale, _, _, _ = quant_params(np.float32(0.0), np.float32(0.0), bits=8)
    assert scale == pytest.approx(1e-8)


def test_jax_and_numpy_paths_agree():
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    x = rng.normal(0, 2, (64,)).astype(np.float32)
    a = fake_quant_np(x, -3.0, 5.0, bits=8)
    b = np.asarray(fake_quant(jnp.asarray(x), -3.0, 5.0, bits=8))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_per_channel_tighter_than_per_tensor():
    rng = np.random.default_rng(1)
    # channel 0 tiny, channel 1 huge: the depthwise-conv failure mode that
    # per-tensor quantization collapses on (BASELINE.md MobileNetV2 row)
    w = np.stack(
        [rng.normal(0, 1e-3, (16,)), rng.normal(0, 10.0, (16,))]
    ).astype(np.float32)
    pt = fake_quant_np(w, w.min(), w.max(), bits=8)
    pc = fake_quant_per_channel(w, bits=8)
    err_pt = np.abs(pt[0] - w[0]).mean()
    err_pc = np.abs(pc[0] - w[0]).mean()
    assert err_pc < err_pt * 1e-2


def test_affine_qparams_zero_point_in_range():
    s, zp = affine_qparams_from_range(-1.0, 3.0)
    assert 0 <= zp <= 255
    # real zero maps to a representable level
    assert abs((0.0 - (-1.0)) / s - zp) < 1.0


@pytest.mark.parametrize("symmetric", [False, True])
def test_parity_with_reference_torch(symmetric):
    """Behavioral parity vs the reference UniformQuantize
    (/root/reference/utils/quantize.py:49-74), run as an oracle if
    importable. Skipped when the reference tree is absent."""
    import importlib.util
    import os
    import sys

    path = "/root/reference/utils/quantize.py"
    if not os.path.exists(path):
        pytest.skip("reference not available")
    torch = pytest.importorskip("torch")
    spec = importlib.util.spec_from_file_location("ref_quantize", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_quantize"] = mod
    spec.loader.exec_module(mod)

    rng = np.random.default_rng(2)
    x = rng.normal(0, 3, (128,)).astype(np.float32)
    mn, mx = float(x.min()), float(x.max())
    ref = (
        mod.UniformQuantize()
        .apply(torch.from_numpy(x.copy()), 8, mn, mx, False, symmetric)
        .numpy()
    )
    ours = fake_quant_np(x, mn, mx, bits=8, symmetric=symmetric)
    np.testing.assert_allclose(ours, ref, atol=1e-6)
