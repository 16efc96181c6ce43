"""ZeroQ reconstruction-variant calibration data (``getReconData``).

Behavioral contract: reference ``ZeroQ/reconstruct_data.py:53-161`` — the
alternative synthesis that hooks *conv outputs feeding each BN* rather
than BN inputs post-merge:

- targets are the raw BN running statistics ``(mean, sqrt(var + 1e-6))``
  (``reconstruct_data.py:93-97``),
- no value-range clamp on the image (unlike ``getDistilData``),
- loss = sum per BN of ``own_loss(mu, mu_b) + own_loss(sd, sd_b)`` with
  ``own_loss(A,B) = |A-B|^2 / len(A)`` plus input stats vs N(0,1)
  normalized by batch (``:126-145``),
- Adam lr 0.1, ReduceLROnPlateau(patience=100, min_lr=1e-4), 500 iters,
  early break at ``loss <= (num_BN + 1) * 5`` (``:107-155``).

In our functional executor the pre-BN conv output IS the BN input, so the
same ``capture="bn_inputs"`` mode supplies the hooked statistics; the whole
per-batch optimization is one ``lax.while_loop`` under ``jit`` (same design
as :mod:`dfq_tpu.calib.distill`). Unused by the reference mains — kept for
capability parity with the ZeroQ subtree.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dfq_tpu.calib.distill import DistillConfig, init_random_batch
from dfq_tpu.graph.executor import execute
from dfq_tpu.graph.ir import Graph


@dataclasses.dataclass
class ReconConfig:
    batch_size: int = 32
    num_batch: int = 1
    image_size: tuple = (224, 224)
    max_value: float = 1.0
    max_iters: int = 500
    lr: float = 0.1
    plateau_patience: int = 100
    plateau_factor: float = 0.1
    min_lr: float = 1e-4
    early_break: float = 5.0


def _bn_raw_targets(graph: Graph, params):
    """Raw BN running stats (reconstruct_data.py:93-97); folded BNs keep
    their retained stat buffers."""
    targets = {}
    for node in graph:
        if node.op == "bn":
            p = params[node.name]
            targets[node.name] = (
                np.asarray(p["mean"], np.float32),
                np.sqrt(np.asarray(p["var"], np.float32) + 1e-6),
            )
        elif node.op in ("identity", "dropout") and "stat_std" in params.get(
            node.name, {}
        ):
            p = params[node.name]
            targets[node.name] = (
                np.asarray(p["stat_mean"], np.float32),
                np.asarray(p["stat_std"], np.float32),
            )
    return targets


def recon_batch_fn(graph: Graph, params, cfg: ReconConfig):
    targets = _bn_raw_targets(graph, params)
    num_bn = len(targets)
    threshold = (num_bn + 1) * cfg.early_break

    def loss_fn(x):
        _, aux = execute(graph, params, x, capture="bn_inputs")
        loss = 0.0
        for name, (mu_t, sd_t) in targets.items():
            mean_b, std_b = aux[name]
            c = mu_t.shape[0]
            loss = loss + jnp.sum((mean_b - mu_t) ** 2) / c
            loss = loss + jnp.sum((std_b - sd_t) ** 2) / c
        flat = x.reshape(x.shape[0], -1, 3)
        n_el = flat.shape[1]
        mu_x = jnp.mean(flat, axis=1)
        sd_x = jnp.sqrt(jnp.var(flat, axis=1) * (n_el / (n_el - 1)))
        b = x.shape[0]
        loss = loss + jnp.sum(mu_x**2) / b + jnp.sum((sd_x - 1.0) ** 2) / b
        return loss

    value_and_grad = jax.value_and_grad(loss_fn)
    opt = optax.inject_hyperparams(optax.adam)(learning_rate=cfg.lr)

    def cond(state):
        x, opt_state, it, best, bad, last = state
        return jnp.logical_and(it < cfg.max_iters, last > threshold)

    def body(state):
        x, opt_state, it, best, bad, _ = state
        loss, grad = value_and_grad(x)
        updates, opt_state = opt.update(grad, opt_state, x)
        x = optax.apply_updates(x, updates)
        improved = loss < best * (1.0 - 1e-4)
        best = jnp.where(improved, loss, best)
        bad = jnp.where(improved, 0, bad + 1)
        lr = opt_state.hyperparams["learning_rate"]
        reduce_now = bad > cfg.plateau_patience
        opt_state.hyperparams["learning_rate"] = jnp.where(
            reduce_now, jnp.maximum(lr * cfg.plateau_factor, cfg.min_lr), lr
        )
        bad = jnp.where(reduce_now, 0, bad)
        return (x, opt_state, it + 1, best, bad, loss)

    @jax.jit
    def run(x0):
        opt_state = opt.init(x0)
        state = (
            x0,
            opt_state,
            jnp.array(0),
            jnp.array(jnp.inf, jnp.float32),
            jnp.array(0),
            jnp.array(jnp.inf, jnp.float32),
        )
        x, _, it, _, _, last = jax.lax.while_loop(cond, body, state)
        return x, it, last

    return run


def recon_data(
    graph: Graph,
    params,
    cfg: Optional[ReconConfig] = None,
    seed: int = 0,
    verbose: bool = False,
) -> List[np.ndarray]:
    """Synthesize ``cfg.num_batch`` reconstruction batches."""
    cfg = cfg or ReconConfig()
    rng = np.random.default_rng(seed)
    run = recon_batch_fn(graph, params, cfg)
    seed_cfg = DistillConfig(
        batch_size=cfg.batch_size,
        image_size=cfg.image_size,
        max_value=cfg.max_value,
    )
    batches = []
    for i in range(cfg.num_batch):
        x0 = jnp.asarray(init_random_batch(rng, seed_cfg))
        x, it, loss = run(x0)
        if verbose:
            print(f"recon batch {i + 1}/{cfg.num_batch}: iters={int(it)} loss={float(loss):.3f}")
        batches.append(np.asarray(x))
    return batches
