"""AOT-compiled executable inside the deployment artifact.

The instant-start story otherwise rides the machine-local, gitignored
persistent compile cache (``.jax_cache/``). For the true analog of the
reference's prebuilt ncnn binary (``/root/reference/inference_cls.cpp``
— binary starts executing immediately, no compiler in the loop), the
artifact can additionally carry the serialized PJRT executable of the
fused forward: a fresh machine (same device kind + jax version) then
cold-starts in ~0.1s with NO compile cache.

Measured on the axon v5e (``scripts/probe_aot_export.py``,
``AOT_r04.json``): serialize 0.13s / 36.6MB payload / load 0.11s /
outputs bit-equal; the StableHLO route (``jax.export``) is portable but
recompiles on load (7.5s), so PJRT serialization is the one that
delivers cache-less cold start.

Payload caveat: a PJRT executable is specific to the device kind,
topology, and jax/XLA version — ``load_aot_forward`` validates the
recorded metadata and raises with a clear message on mismatch, and the
artifact remains fully usable without the AOT payload (the engine
recompiles as usual).
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Callable, Optional

AOT_DIR = "aot"


def _meta():
    import jax

    dev = jax.devices()[0]
    return {
        "device_kind": dev.device_kind,
        "platform": dev.platform,
        "jax_version": jax.__version__,
    }


def save_aot_forward(path: str, compiled, batch: int, image_size: int):
    """Serialize a ``jax.stages.Compiled`` fused forward into
    ``<artifact>/aot/``. ``compiled`` must close over the model — its
    only argument is the image batch."""
    from jax.experimental import serialize_executable as se

    payload, in_tree, out_tree = se.serialize(compiled)
    d = os.path.join(path, AOT_DIR)
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "executable.pjrt"), "wb") as f:
        f.write(payload)
    with open(os.path.join(d, "trees.pkl"), "wb") as f:
        pickle.dump((in_tree, out_tree), f)
    with open(os.path.join(d, "meta.json"), "w") as f:
        json.dump({**_meta(), "batch": batch, "image_size": image_size}, f)


class _TreeDefUnpickler(pickle.Unpickler):
    """Unpickler restricted to the globals PyTreeDef pickling actually
    uses (jax tree_util + harmless builtins). Blocks the generic
    pickle arbitrary-code-execution vector for ``trees.pkl`` loaded
    from an artifact of uncertain provenance."""

    _ALLOWED_MODULES = (
        "jax.tree_util",
        "jax._src.tree_util",
        "jaxlib._jax.pytree",  # PyTreeDef's C++ home in current jaxlib
        "jaxlib.xla_extension",  # older jaxlib spelling
        "builtins",
        "collections",
    )

    def find_class(self, module, name):  # noqa: D102
        if module == "builtins" and name in ("eval", "exec", "getattr", "compile", "open", "__import__"):
            raise pickle.UnpicklingError(f"blocked builtin {name!r} in AOT trees.pkl")
        if any(module == m or module.startswith(m + ".") for m in self._ALLOWED_MODULES):
            return super().find_class(module, name)
        raise pickle.UnpicklingError(
            f"AOT trees.pkl references {module}.{name}, outside the "
            "jax tree_util allowlist — refusing to unpickle"
        )


def load_aot_forward(path: str) -> Optional[Callable]:
    """Load the serialized executable if present and compatible; returns
    the ready-to-call function (no compile) or None when the artifact
    carries no AOT payload.

    Trust note: the AOT payload (PJRT executable + pytree defs) should
    only be loaded from artifacts you produced or trust — the treedef
    sidecar is pickle-based (restricted to a jax tree_util allowlist
    here, but an executable blob is inherently trusted code)."""
    d = os.path.join(path, AOT_DIR)
    if not os.path.isdir(d):
        return None
    from jax.experimental import serialize_executable as se

    with open(os.path.join(d, "meta.json")) as f:
        meta = json.load(f)
    cur = _meta()
    for k in ("device_kind", "platform", "jax_version"):
        if meta.get(k) != cur[k]:
            raise ValueError(
                f"AOT executable was built for {k}={meta.get(k)!r} but this "
                f"process has {cur[k]!r}; re-export on matching hardware or "
                "load the artifact without the AOT payload"
            )
    with open(os.path.join(d, "executable.pjrt"), "rb") as f:
        payload = f.read()
    with open(os.path.join(d, "trees.pkl"), "rb") as f:
        in_tree, out_tree = _TreeDefUnpickler(f).load()
    fn = se.deserialize_and_load(payload, in_tree, out_tree)
    fn.aot_meta = meta  # type: ignore[attr-defined]
    return fn
