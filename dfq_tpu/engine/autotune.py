"""Model-level engine-policy autotuner.

Why this exists: the fused engine's depthwise lowering has two bit-exact
forms — XLA grouped conv (VPU 9-tap path) and the dense-diagonal MXU
rewrite (``int8_fused._dense_diag_weights``) — and which one XLA executes
well is *context*-dependent, not shape-predictable. Measured on v5e:

- MobileNetV2-SSD-Lite @300 b8: its dw32@150^2 grouped conv runs fine
  (1.77 ms step); the dense rewrite is a 7.9% end-to-end LOSS
  (``SSD_POLICY_r05.json``).
- MobileNetV1-SSD @300 b8: the *identically shaped* dw32@150^2 grouped
  conv collapses to 1.5 GB/s = 7.84 ms of a 9.07 ms step
  (``PROF_MB1_r05.json``); the dense rewrite is a 5.5x end-to-end WIN
  (``MB1_DW_r05.json``). At b32 the same conv un-collapses and grouped
  wins again by 8%.

Identical HLO conv shapes, opposite winners, flipping with batch — no
static policy can discriminate. On TPU there is no XLA conv autotuner
(configs are deterministic from the HLO module), so the framework
supplies the missing autotune step at the model level: compile the few
candidate policies, slope-time each on device, keep the winner. This is
a serve-time cost (one-off per model x batch, amortized over a
deployment) and the result is cacheable.

The reference has no analog — torch/CUDA users get cudnn.benchmark for
free; this is the TPU-native equivalent at the only granularity where
it is sound (whole-module, since XLA's choice depends on module
context).
"""

from __future__ import annotations

import hashlib
import json
import sys
import time
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple

__all__ = ["dw_policy_candidates", "autotune_dw_policy", "model_signature"]


def dw_policy_candidates(per_device_batch: int) -> List[Dict[str, Any]]:
    """The measured-distinct dw-lowering policies worth racing.

    Three points cover the observed behavior space: the static auto
    policy (best for MNV2-family at every batch), dense-diag up to
    C<=32 / H<=160 (rescues collapsed 150^2 dw32 contexts: 5.5x on
    MNV1-SSD b8), and grouped-everywhere (best at large batch where the
    dense rewrite's 9xC MAC overhead is pure loss)."""
    del per_device_batch  # same candidate set at every batch today
    return [
        {"_label": "auto"},
        {"_label": "dense32_h160", "dw_dense_max_ch": 32,
         "dw_dense_max_h": 160},
        {"_label": "grouped", "dw_dense_max_ch": 0},
    ]


def model_signature(model, batch: int, extra: str = "") -> str:
    """Stable cache key for (lowered model topology, batch, device kind).

    Topology only — weight *values* don't change XLA's conv configs, so
    retrained weights reuse the cached policy."""
    import jax

    h = hashlib.sha256()
    for node in model.graph:
        h.update(node.name.encode())
        h.update(str(sorted(
            (k, str(v)) for k, v in (node.attrs or {}).items()
        )).encode())
        h.update(node.op.encode())
    kind = jax.devices()[0].device_kind
    h.update(f"|b{batch}|{kind}|{extra}".encode())
    return h.hexdigest()[:16]


def _slope_time(fwd, x, n_small: int, n_big: int, rounds: int = 3,
                tag: str = "") -> float:
    """Minimal on-device slope timer (see bench.py:step_time for the
    full-dress version and the tunnel-variance rationale): per-step
    time = (t_big - t_small) / (n_big - n_small), lower-median over
    interleaved rounds. Self-contained so the library does not import
    the repo-root bench harness."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    def loop(n):
        def run(x):
            def body(i, carry):
                acc, x = carry
                out = fwd(x + acc * 1e-20)  # anti-hoist, runtime-zero
                if isinstance(out, tuple):
                    s = sum(jnp.sum(o.astype(jnp.float32)) for o in out)
                else:
                    s = jnp.sum(out.astype(jnp.float32))
                return acc + s * 1e-20, x

            acc, _ = lax.fori_loop(0, n, body, (jnp.float32(0), x))
            return acc

        t0 = time.time()
        c = jax.jit(run).lower(x).compile()
        print(f"#   autotune compile {tag} n={n}: {time.time() - t0:.1f}s",
              file=sys.stderr)
        jax.device_get(c(x))  # warm
        return c

    c_small, c_big = loop(n_small), loop(n_big)
    slopes = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        jax.device_get(c_small(x))
        t_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.device_get(c_big(x))
        t_b = time.perf_counter() - t0
        slopes.append((t_b - t_s) / (n_big - n_small))
    slopes.sort()
    return slopes[(len(slopes) - 1) // 2]


def autotune_dw_policy(
    model,
    params,
    x,
    candidates: Optional[Sequence[Dict[str, Any]]] = None,
    cache_path: Optional[str] = None,
    per_device_batch: Optional[int] = None,
    rounds: int = 3,
    executor=None,
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Race the candidate dw policies on device; return
    ``(policy_kwargs, report)``.

    ``policy_kwargs`` feeds straight into ``execute_int8_fused(**...)``
    (the ``_label`` key is stripped). With ``cache_path`` set, a JSON
    cache keyed by :func:`model_signature` skips the race entirely on a
    hit — the intended serve-time flow is: first deployment of a model
    pays ~30-60s of compile+measure once, every later process start
    reads the winner back.
    """
    from .int8_fused import execute_int8_fused

    executor = executor or execute_int8_fused
    batch = per_device_batch or x.shape[0]
    cands = list(candidates or dw_policy_candidates(batch))
    sig = model_signature(model, batch)

    if cache_path:
        p = Path(cache_path)
        if p.exists():
            cache = json.loads(p.read_text())
            hit = cache.get(sig)
            if hit:
                want = {c["_label"]: c for c in cands}.get(hit["label"])
                if want is not None:
                    pol = {k: v for k, v in want.items() if k != "_label"}
                    return pol, {"cached": True, "signature": sig, **hit}

    # short loops: the decision margins measured so far are 1.08x-5.5x,
    # far above slope noise at n=10/60
    n_small, n_big = (2, 12) if batch >= 64 else (10, 60)
    report_rows = []
    best = None
    for cand in cands:
        label = cand["_label"]
        pol = {k: v for k, v in cand.items() if k != "_label"}

        def fwd(v, _pol=pol):
            return executor(model, params, v,
                            per_device_batch=per_device_batch, **_pol)

        t = _slope_time(fwd, x, n_small, n_big, rounds=rounds,
                        tag=f"{label}_b{batch}")
        row = {"label": label, "ms": round(t * 1e3, 3), "policy": pol}
        print(f"# autotune {label}: {t * 1e3:.3f} ms/step", file=sys.stderr)
        report_rows.append(row)
        if best is None or t < best[0]:
            best = (t, label, pol)

    _, label, pol = best
    report = {"cached": False, "signature": sig, "label": label,
              "ms": round(best[0] * 1e3, 3), "rows": report_rows}
    if cache_path:
        p = Path(cache_path)
        cache = json.loads(p.read_text()) if p.exists() else {}
        cache[sig] = {"label": label, "ms": report["ms"]}
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(json.dumps(cache, indent=1))
    return pol, report
