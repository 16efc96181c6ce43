"""AOT executable payload in the deployment artifact (dfq_tpu.io.aot).

The serialize/execute round-trip runs in a SUBPROCESS with a plain
1-device CPU backend: under the suite's virtual 8-device mesh the
deserialized executable expects 8 input shards (an XLA:CPU loader
quirk; the real-TPU round-trip is validated in AOT_r04.json /
scripts/probe_aot_export.py). The metadata guard and the absent-payload
path are pure file logic and run in-process."""

import json
import os
import subprocess
import sys

import pytest

from dfq_tpu.io.aot import load_aot_forward

_CHILD = r"""
import os, sys, json
os.environ["XLA_FLAGS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")  # the axon plugin ignores the env var
import jax.numpy as jnp, numpy as np
from dfq_tpu.io.aot import save_aot_forward, load_aot_forward
path = {path!r}
os.makedirs(path, exist_ok=True)
fwd = jax.jit(lambda x: jnp.tanh(x) @ jnp.ones((8, 4), jnp.float32))
x = jnp.asarray(np.random.default_rng(0).normal(0, 1, (2, 8)), jnp.float32)
compiled = fwd.lower(x).compile()
save_aot_forward(path, compiled, batch=2, image_size=8)
fn = load_aot_forward(path)
assert fn is not None
np.testing.assert_array_equal(np.asarray(fn(x)), np.asarray(compiled(x)))
assert fn.aot_meta["batch"] == 2
print("ROUNDTRIP_OK")
"""


def test_aot_roundtrip_subprocess(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = str(tmp_path / "art")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    res = subprocess.run(
        [sys.executable, "-c", _CHILD.format(repo=repo, path=path)],
        capture_output=True, text=True, timeout=240, env=env,
    )
    if "does not implement" in res.stderr or "Unimplemented" in res.stderr:
        pytest.skip(f"backend does not serialize executables: {res.stderr[-200:]}")
    assert res.returncode == 0, res.stderr[-2000:]
    assert "ROUNDTRIP_OK" in res.stdout

    # metadata mismatch -> clear error (file logic, in-process)
    meta_p = os.path.join(path, "aot", "meta.json")
    meta = json.load(open(meta_p))
    meta["jax_version"] = "0.0.0"
    json.dump(meta, open(meta_p, "w"))
    # the pytest process may differ from the child in device_kind too;
    # any recorded-metadata mismatch must raise the documented error
    with pytest.raises(ValueError, match="re-export on matching hardware"):
        load_aot_forward(path)


def test_absent_payload_returns_none(tmp_path):
    assert load_aot_forward(str(tmp_path / "empty")) is None
