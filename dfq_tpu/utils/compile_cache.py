"""Persistent XLA compilation cache.

The reference's deployed int8 binary starts instantly
(``/root/reference/inference_cls.cpp:158-197``: ncnn loads a prebuilt
param/bin). The XLA analog is the persistent compilation cache: the
first process compiles (~10s for the fused MNV2 program, measured AOT in
``scripts/probe_compile_r3.py``), every later process with an unchanged
program deserializes the executable in <1s — validated over the axon
TPU tunnel (round-3 probe: 0.7-0.9s warm vs 9.9-26.2s cold).
"""

from __future__ import annotations

import os


def enable_compile_cache(path: str | None = None) -> str:
    """Point JAX at a persistent compilation cache directory and return
    it. Default: ``.jax_cache/`` at the repo root (next to the
    ``dfq_tpu`` package), overridable via ``DFQ_TPU_COMPILE_CACHE``."""
    import jax

    if os.environ.get("DFQ_TPU_DISABLE_COMPILE_CACHE"):
        # A/B harnesses that vary XLA_FLAGS set this: a cached
        # executable compiled under other flags would mask the effect
        return ""
    if path is None:
        path = os.environ.get("DFQ_TPU_COMPILE_CACHE") or os.path.join(
            os.path.dirname(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
            ),
            ".jax_cache",
        )
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return path
