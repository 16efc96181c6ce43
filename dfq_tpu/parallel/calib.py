"""Sharded distilled-data synthesis (the framework's training step).

ZeroQ distillation is the only gradient computation in the DFQ pipeline
(``/root/reference/ZeroQ/distill_data.py:172-216`` — reference is
explicitly single-GPU, ``:83``). Here the synthesized image batch is
sharded across the mesh's data axis; the BN-statistics loss is a sum
over per-sample statistics, so GSPMD reduces the per-shard partial
losses with a psum over ICI and every device applies the identical Adam
update to its image shard.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dfq_tpu.calib.distill import DistillConfig, make_loss_fn
from dfq_tpu.graph.ir import Graph
from dfq_tpu.parallel.mesh import DATA_AXIS


def make_sharded_distill_step(
    graph: Graph, params, cfg: DistillConfig, mesh: Mesh
):
    """Returns ``(step, x_sharding)`` where ``step(x, opt_state) ->
    (x', opt_state', loss)`` is jitted with the image batch sharded over
    the data axis and params replicated."""
    loss_fn, _ = make_loss_fn(graph, params, cfg)
    opt = optax.adam(cfg.lr)
    data_sh = NamedSharding(mesh, P(DATA_AXIS))
    rep = NamedSharding(mesh, P())

    @jax.jit
    def step(x, opt_state):
        loss, grad = jax.value_and_grad(loss_fn)(x)
        updates, opt_state = opt.update(grad, opt_state, x)
        x = optax.apply_updates(x, updates)
        return x, opt_state, loss

    def init(x0):
        x0 = jax.device_put(x0, data_sh)
        return x0, opt.init(x0)

    return step, init
