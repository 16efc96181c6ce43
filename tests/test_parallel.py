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
