"""ZeroQ distillation, distilled-range calibration, and empirical bias
correction."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfq_tpu.calib import (
    DistillConfig,
    bias_correction_distill,
    calibrate_ranges,
    distill_data,
)
from dfq_tpu.graph import GraphBuilder, execute
from dfq_tpu.graph.ir import quant_sites
from dfq_tpu.models import init_params
from dfq_tpu.passes import fold_batchnorm, quantize_layer_weights


def _small_cnn():
    b = GraphBuilder()
    x = b.input("data")
    x = b.conv("c1", x, 3, 8, (3, 3), stride=(2, 2), padding=(1, 1))
    x = b.bn("n1", x, 8)
    x = b.relu("r1", x)
    x = b.conv("c2", x, 8, 12, (3, 3), stride=(2, 2), padding=(1, 1))
    x = b.bn("n2", x, 12)
    x = b.relu("r2", x)
    x = b.global_mean("gm", x)
    x = b.linear("fc", x, 12, 4)
    return b.build([x])


@pytest.fixture(scope="module")
def model():
    g = _small_cnn()
    p = init_params(g, seed=0, bn_stats="random")
    return g, p


def test_distillation_matches_bn_stats(model):
    g, p = model
    cfg = DistillConfig(
        batch_size=16, num_batch=1, image_size=(16, 16),
        max_iters=300, early_break_factor=0.05, lr=0.05,
    )
    batches = distill_data(g, p, cfg, seed=0)
    assert len(batches) == 1
    x = batches[0]
    assert x.shape == (16, 16, 16, 3)
    assert x.min() >= cfg.value_range[0] - 1e-5
    assert x.max() <= cfg.value_range[1] + 1e-5

    # the synthesized data must drive BN-input statistics toward the BN's
    # recorded running stats (the whole point of ZeroQ)
    _, aux = jax.jit(lambda pp, v: execute(g, pp, v, capture="bn_inputs"))(
        p, jnp.asarray(x)
    )
    for bn in ("n1", "n2"):
        mean_b, std_b = aux[bn]
        mu_err = np.abs(np.asarray(mean_b).mean(0) - p[bn]["mean"]).mean()
        # random init reference error
        rng = np.random.default_rng(1)
        x0 = rng.uniform(-2.1, 2.6, x.shape).astype(np.float32)
        _, aux0 = jax.jit(lambda pp, v: execute(g, pp, v, capture="bn_inputs"))(
            p, jnp.asarray(x0)
        )
        mu_err0 = np.abs(np.asarray(aux0[bn][0]).mean(0) - p[bn]["mean"]).mean()
        assert mu_err < mu_err0, (bn, mu_err, mu_err0)


def test_calibrate_ranges_covers_sites_and_recurrence(model):
    g, p = model
    gf, pf = fold_batchnorm(g, p)
    rng = np.random.default_rng(2)
    batches = [
        rng.normal(0, 1, (8, 16, 16, 3)).astype(np.float32) for _ in range(3)
    ]
    ranges = calibrate_ranges(gf, pf, batches)
    sites = quant_sites(gf)
    assert set(ranges) == set(sites)

    # independent emulation of the QuantMeasure state the reference
    # actually calibrates in (update_stat merge + training EMA, batches
    # self-quantized with their own stats — utils/quantize.py:103-113,
    # reached in training mode per main_cls.py:84/196): per-batch stats
    # from the self_quant forward, then the merge-then-EMA recurrence
    stats = []
    for b in batches:
        _, aux = jax.jit(
            lambda pp, v: execute(
                gf, pp, v, capture="minmax", self_quant=True
            )
        )(pf, jnp.asarray(b))
        stats.append({k: (float(v[0]), float(v[1])) for k, v in aux.items()})
    for s in sites:
        if s == "c1:in0":
            continue  # pinned below
        lo = hi = 0.0
        for st in stats:
            mn, mx = st[s]
            lo, hi = min(lo, mn), max(hi, mx)
            lo, hi = lo * 0.9 + mn * 0.1, hi * 0.9 + mx * 0.1
        assert ranges[s] == pytest.approx((lo, hi), rel=1e-6), s
        assert lo < hi
    # input site pinned to the preprocessing range
    assert ranges["c1:in0"] == (-2.11790393, 2.64)


def test_bias_correction_distill_recenters(model):
    g, p = model
    gf, pf = fold_batchnorm(g, p)
    pq = quantize_layer_weights(gf, pf, bits_weight=4, bits_bias=32)
    rng = np.random.default_rng(3)
    batches = [
        rng.normal(0, 1, (8, 16, 16, 3)).astype(np.float32) for _ in range(2)
    ]
    ranges = calibrate_ranges(gf, pq, batches)
    pc = bias_correction_distill(gf, pq, ranges, pf, batches)

    # contract (reference improve_dfq.py:349-366): each layer's bias moves
    # by exactly minus its measured mean output error
    def layer_means(params, use_ranges):
        acc = {}
        for b in batches:
            _, aux = jax.jit(
                lambda pp, v: execute(
                    gf, pp, v,
                    act_ranges=ranges if use_ranges else {},
                    capture="layer_outputs",
                )
            )(params, jnp.asarray(b))
            for k, v in aux.items():
                acc[k] = acc.get(k, 0.0) + np.asarray(v)
        return {k: v / len(batches) for k, v in acc.items()}

    mq = layer_means(pq, True)
    mf = layer_means(pf, False)
    for name in mq:
        shift = np.asarray(pc[name].get("bias", 0)) - np.asarray(
            pq[name].get("bias", np.zeros_like(mq[name]))
        )
        np.testing.assert_allclose(shift, -(mq[name] - mf[name]), atol=1e-4)

    # the FIRST target layer (no upstream corrections) must now match the
    # FP32 mean output exactly up to measurement noise
    mc = layer_means(pc, True)
    assert np.abs(mc["c1"] - mf["c1"]).mean() < np.abs(mq["c1"] - mf["c1"]).mean() * 0.1


def test_distill_bf16_converges_like_f32(model):
    """compute_dtype="bf16" (MXU-native network math; stats/loss/Adam
    stay f32) must converge to the same loss neighborhood as f32 — the
    BN-statistics loss only consumes statistics, which the executor
    computes in f32 either way."""
    from dfq_tpu.calib.distill import distill_batch_fn, init_random_batch

    g, p = model
    losses = {}
    for dt in ("f32", "bf16"):
        cfg = DistillConfig(
            batch_size=8, num_batch=1, image_size=(16, 16),
            max_iters=150, early_break_factor=0.0, lr=0.05,
            compute_dtype=dt,
        )
        run = distill_batch_fn(g, p, cfg)
        x0 = jnp.asarray(init_random_batch(np.random.default_rng(0), cfg))
        x, it, loss = run(x0)
        assert x.dtype == jnp.float32  # images stay f32
        losses[dt] = float(loss)
    assert np.isfinite(losses["bf16"])
    # same neighborhood: within 25% of the f32 trajectory's final loss
    assert losses["bf16"] <= losses["f32"] * 1.25, losses


def test_distill_early_break(model):
    g, p = model
    cfg = DistillConfig(
        batch_size=4, num_batch=1, image_size=(16, 16),
        max_iters=50, early_break_factor=1e6,  # trivially satisfied
    )
    run = __import__(
        "dfq_tpu.calib.distill", fromlist=["distill_batch_fn"]
    ).distill_batch_fn(g, p, cfg)
    from dfq_tpu.calib.distill import init_random_batch

    x0 = jnp.asarray(init_random_batch(np.random.default_rng(0), cfg))
    _, iters, _ = run(x0)
    assert int(iters) <= 1  # broke immediately
