"""Multi-device sharding on the 8-device CPU test mesh: sharded eval,
sharded distillation step, multihost helpers, checkpointing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfq_tpu.calib.distill import DistillConfig, init_random_batch
from dfq_tpu.graph import GraphBuilder, execute
from dfq_tpu.models import init_params
from dfq_tpu.parallel import (
    data_mesh,
    make_sharded_distill_step,
    make_sharded_eval,
    replicate,
    shard_batch,
)
from dfq_tpu.parallel.multihost import global_mesh, host_shard_bounds, make_global_batch
from dfq_tpu.passes import fold_batchnorm


def _net():
    b = GraphBuilder()
    x = b.input("data")
    x = b.conv("c1", x, 3, 8, (3, 3), stride=(2, 2), padding=(1, 1))
    x = b.bn("n1", x, 8)
    x = b.relu("r1", x)
    x = b.global_mean("gm", x)
    x = b.linear("fc", x, 8, 4)
    return b.build([x])


def test_mesh_has_8_devices():
    mesh = data_mesh()
    assert mesh.devices.size == 8


def test_sharded_eval_matches_single_device():
    g = _net()
    p = init_params(g, seed=0, bn_stats="random")
    mesh = data_mesh()
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (16, 16, 16, 3)).astype(np.float32)
    labels = rng.integers(0, 4, 16).astype(np.int32)

    run = make_sharded_eval(g, p, mesh)
    with mesh:
        correct, total = run(jnp.asarray(x), jnp.asarray(labels))
    # single-device oracle
    logits = np.asarray(jax.jit(lambda pp, v: execute(g, pp, v))(p, jnp.asarray(x)))
    expect = int((logits.argmax(-1) == labels).sum())
    assert total == 16
    assert correct == expect


def test_sharded_seg_eval_matches_host_evaluator():
    """Device-side sharded confusion matrix == the host SegEvaluator on
    single-device logits (incl. the reference's 0<=gt<C validity mask,
    utils/metrics.py:19)."""
    from dfq_tpu.metrics import SegEvaluator
    from dfq_tpu.parallel import make_sharded_seg_eval

    b = GraphBuilder()
    x = b.input("data")
    x = b.conv("c1", x, 3, 8, (3, 3), padding=(1, 1))
    x = b.bn("n1", x, 8)
    x = b.relu("r1", x)
    x = b.conv("head", x, 8, 5, (1, 1))
    g = b.build([x])
    p = init_params(g, seed=3, bn_stats="random")
    mesh = data_mesh()
    rng = np.random.default_rng(4)
    x = rng.normal(0, 1, (8, 12, 12, 3)).astype(np.float32)
    # include ignore pixels (255) outside [0, C)
    gt = rng.integers(0, 5, (8, 12, 12)).astype(np.int32)
    gt[rng.random(gt.shape) < 0.1] = 255

    run = make_sharded_seg_eval(g, p, mesh, num_class=5)
    with mesh:
        conf = run(jnp.asarray(x), jnp.asarray(gt))

    logits = np.asarray(jax.jit(lambda pp, v: execute(g, pp, v))(p, jnp.asarray(x)))
    ev = SegEvaluator(5)
    ev.add_batch(gt, logits.argmax(-1))
    np.testing.assert_array_equal(conf, ev.confusion_matrix)
    assert conf.sum() < gt.size  # the ignore pixels were masked


def _inv_res_net():
    """Small inverted-residual net: exercises the fused engine's real
    content (pw expand -> dw 3x3 -> pw project -> residual add)."""
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
    z = b.linear("fc", z, 8, 4)
    return b.build([z])


def test_sharded_int8_and_fused_match_single_device():
    """The true-int8 engines must produce IDENTICAL logits sharded over
    the mesh vs single-device: data parallelism splits the batch only, so
    every per-example computation is bit-identical and the counters psum
    exactly."""
    from dfq_tpu.engine import execute_int8, lower_int8
    from dfq_tpu.engine.int8_fused import execute_int8_fused
    from dfq_tpu.parallel.eval import make_sharded_forward
    from dfq_tpu.pipeline import QuantConfig, prepare

    g = _inv_res_net()
    p = init_params(g, seed=0, bn_stats="random")
    prep = prepare(
        g, p, QuantConfig(quantize=True, relu=True, equalize=True, bits_bias=16)
    )
    model = lower_int8(prep)
    mesh = data_mesh()
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, (16, 16, 16, 3)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 4, 16), jnp.int32)

    for engine, exec_fn in (("int8", execute_int8), ("fused", execute_int8_fused)):
        oracle = np.asarray(
            jax.jit(lambda v: exec_fn(model, prep.params, v))(x)
        )
        fwd = make_sharded_forward(
            prep.graph, prep.params, mesh, int8_model=model, engine=engine
        )
        run = make_sharded_eval(
            prep.graph, prep.params, mesh, int8_model=model, engine=engine
        )
        with mesh:
            sharded = np.asarray(fwd(x))
            correct, total = run(x, labels)
        np.testing.assert_array_equal(sharded, oracle), engine
        assert total == 16
        assert correct == int(
            (oracle.argmax(-1) == np.asarray(labels)).sum()
        ), engine
        # the sharded logits really lived on all 8 devices
        with mesh:
            out = fwd(x)
        assert len(out.sharding.device_set) == 8


def test_sharded_distill_step_runs_and_reduces():
    g = _net()
    p = init_params(g, seed=0, bn_stats="random")
    gf, pf = fold_batchnorm(g, p)
    mesh = data_mesh()
    cfg = DistillConfig(batch_size=16, image_size=(16, 16), max_iters=1)
    step, init = make_sharded_distill_step(gf, pf, cfg, mesh)
    x0 = jnp.asarray(init_random_batch(np.random.default_rng(0), cfg))
    with mesh:
        x, opt_state = init(x0)
        x1, opt_state, loss = step(x, opt_state)
        x2, _, loss2 = step(x1, opt_state)
    assert np.isfinite(float(loss)) and np.isfinite(float(loss2))
    assert float(loss2) < float(loss)  # one Adam step reduces the loss
    # the image shard stays sharded over the data axis
    assert len(x1.sharding.device_set) == 8


def test_shard_and_replicate_placement():
    mesh = data_mesh()
    x = jnp.zeros((16, 4))
    xs = shard_batch(mesh, x)
    assert len(xs.sharding.device_set) == 8
    p = replicate(mesh, {"w": jnp.zeros((3, 3))})
    assert p["w"].sharding.is_fully_replicated


def test_multihost_helpers_single_process():
    assert global_mesh().devices.size == 8
    start, end = host_shard_bounds(100)
    assert (start, end) == (0, 100)  # single process owns everything
    mesh = global_mesh()
    local = np.ones((8, 4), np.float32)
    arr = make_global_batch(mesh, local)
    assert arr.shape == (8, 4)


def test_checkpoint_roundtrip(tmp_path):
    from dfq_tpu.io.checkpoint import load_params, save_params

    g = _net()
    p = init_params(g, seed=3, bn_stats="random")
    ranges = {"c1:in0": (-2.0, 2.0)}
    save_params(str(tmp_path / "ckpt"), p, ranges)
    p2, r2 = load_params(str(tmp_path / "ckpt"))
    np.testing.assert_allclose(p2["c1"]["weight"], p["c1"]["weight"])
    assert r2 == ranges


def test_streaming_eval_matches_sharded():
    """The depth-2 streaming pipeline must produce the same counters as
    the synchronous sharded eval over a multi-batch host stream."""
    from dfq_tpu.engine import lower_int8
    from dfq_tpu.parallel import make_streaming_eval
    from dfq_tpu.pipeline import QuantConfig, prepare

    g = _inv_res_net()
    p = init_params(g, seed=0, bn_stats="random")
    prep = prepare(
        g, p, QuantConfig(quantize=True, relu=True, equalize=True, bits_bias=16)
    )
    model = lower_int8(prep)
    mesh = data_mesh()
    rng = np.random.default_rng(3)
    batches = [
        (
            rng.normal(0, 1, (16, 16, 16, 3)).astype(np.float32),
            rng.integers(0, 4, 16).astype(np.int32),
        )
        for _ in range(5)
    ]

    run_sync = make_sharded_eval(
        prep.graph, prep.params, mesh, int8_model=model, engine="int8"
    )
    with mesh:
        want_c = want_t = 0
        for x, l in batches:
            c, t = run_sync(jnp.asarray(x), jnp.asarray(l))
            want_c, want_t = want_c + c, want_t + t

    run_stream = make_streaming_eval(
        prep.graph, prep.params, mesh, int8_model=model, engine="int8"
    )
    with mesh:
        got_c, got_t = run_stream(iter(batches))
    assert (got_c, got_t) == (want_c, want_t)


def test_tensor_parallel_int8_matches_single_device():
    """Channel-sharded (tensor-parallel) int8 execution over a 2x4
    data x model mesh: weights split on output channels, GSPMD inserts
    the collectives, logits match the single-device engine (int32 conv
    cores are exact; f32 epilogues may reassociate)."""
    from dfq_tpu.engine import execute_int8, lower_int8
    from dfq_tpu.parallel import make_tp_int8_forward, tp_mesh
    from dfq_tpu.pipeline import QuantConfig, prepare

    g = _inv_res_net()
    p = init_params(g, seed=0, bn_stats="random")
    prep = prepare(
        g, p, QuantConfig(quantize=True, relu=True, equalize=True, bits_bias=16)
    )
    model = lower_int8(prep)
    mesh = tp_mesh(2, 4)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(0, 1, (8, 16, 16, 3)), jnp.float32)

    oracle = np.asarray(jax.jit(lambda v: execute_int8(model, prep.params, v))(x))
    fwd = make_tp_int8_forward(model, prep.params, mesh)
    with mesh:
        out = fwd(x)
        sharded = np.asarray(out)
    np.testing.assert_allclose(sharded, oracle, rtol=0, atol=1e-4)
    np.testing.assert_array_equal(sharded.argmax(-1), oracle.argmax(-1))
    # weights really live split across the model axis
    from dfq_tpu.parallel.tp import shard_int8_weights

    arrays = shard_int8_weights(model, mesh)
    qw = arrays["exp"]["qweight"]  # HWIO, O=24 split over 4
    shard_shapes = {s.data.shape for s in qw.addressable_shards}
    assert all(sh[-1] == 6 for sh in shard_shapes), shard_shapes
