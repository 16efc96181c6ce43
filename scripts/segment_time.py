"""Per-segment slope timing of the fused int8 MobileNetV2 engine —
reproduces PERFORMANCE.md's "where the time goes" table.

Times the engine on truncated prefixes of the graph and reports the
difference between consecutive prefixes. Each prefix is prepared and
lowered independently (ranges differ marginally from the full model;
irrelevant for timing).

Usage: python scripts/segment_time.py   (real chip, ~15 min)
"""

import sys

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from bench import step_time  # noqa: E402

from dfq_tpu.engine import lower_int8  # noqa: E402
from dfq_tpu.engine.int8_fused import execute_int8_fused  # noqa: E402
from dfq_tpu.graph.ir import Graph  # noqa: E402
from dfq_tpu.models import init_params, mobilenet_v2  # noqa: E402
from dfq_tpu.pipeline import QuantConfig, prepare  # noqa: E402

SEGMENTS = [
    ("stem+blocks1-2", "features.2.conv.4"),
    ("blocks3-7", "features.7.conv.7"),
    ("blocks8-14", "features.14.conv.7"),
    ("blocks15-18", "features.18.1"),
    ("pool+classifier", None),  # full graph
]


def prefix_graph(graph: Graph, last: str) -> Graph:
    nodes = []
    for node in graph:
        nodes.append(node)
        if node.name == last:
            break
    return Graph(nodes, [last])


def main():
    batch = 128
    full = mobilenet_v2()
    params = init_params(full, seed=0, bn_stats="random")
    cfg = QuantConfig(quantize=True, relu=True, equalize=True, bits_bias=16)
    x = jnp.asarray(
        np.random.default_rng(0).normal(0, 1, (batch, 224, 224, 3)),
        jnp.float32,
    )

    times = []
    for name, last in SEGMENTS:
        g = full if last is None else prefix_graph(full, last)
        prep = prepare(g, {k: dict(v) for k, v in params.items() if k in g}, cfg)
        model = lower_int8(prep)
        t = step_time(
            lambda v: execute_int8_fused(model, prep.params, v), x,
            tag=f"prefix:{name}",
        )
        times.append((name, t))
        print(f"# cumulative {name}: {t * 1e3:.2f} ms", file=sys.stderr)

    total = times[-1][1]
    prev = 0.0
    print("segment, ms, share", file=sys.stderr)
    for name, t in times:
        print(
            f"RESULT {name}: {(t - prev) * 1e3:.2f} ms "
            f"({(t - prev) / total * 100:.0f}%)",
            file=sys.stderr,
        )
        prev = t


if __name__ == "__main__":
    main()
