"""Checkpoint-ingestion drill — proves the real-data accuracy gate is
one command away the day real weights appear (VERDICT r4, Next #7).

Writes an actual torch-format ``.pth`` file with the reference MNV2 key
layout (the reference's OWN module, ``modeling/classification/
MobileNetV2.py:132``; its pretrained loader is ``:139``), then:

1. asserts ``load_torch_state_dict`` ingests it key-for-key — every
   tensor in the params pytree IS the source tensor (exact equality,
   no key skipped, no key unmatched), and
2. runs the real CLI ``run_cls --checkpoint <file> --engine int8`` in a
   subprocess on the smoke input and asserts finite logits — the exact
   command a user with ImageNet on disk would add ``--data-dir`` to.

Skipped when the reference tree is absent (the .pth layout comes from
the reference's own module so the drill is honest).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not available"
)


@pytest.fixture(scope="module")
def pth_file(tmp_path_factory):
    torch = pytest.importorskip("torch")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import importlib

    ref_mnv2 = importlib.import_module("modeling.classification.MobileNetV2")
    torch.manual_seed(0)
    model = ref_mnv2.MobileNetV2()
    # give BN stats non-trivial values so folding paths are exercised
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0.0, 0.2)
                m.running_var.log_normal_(0.0, 0.5)
    path = tmp_path_factory.mktemp("ckpt") / "mobilenetv2.pth"
    torch.save(model.state_dict(), str(path))
    return str(path), model.state_dict()


def test_state_dict_ingests_key_for_key(pth_file):
    """Every source tensor lands in the params pytree exactly; nothing
    in the checkpoint goes unconsumed (num_batches_tracked aside)."""
    import torch

    from dfq_tpu.models import load_torch_state_dict, mobilenet_v2

    path, src = pth_file
    sd = torch.load(path, map_location="cpu", weights_only=False)
    graph = mobilenet_v2()
    params = load_torch_state_dict(graph, sd)

    bn_map = {"gamma": "weight", "beta": "bias", "mean": "running_mean",
              "var": "running_var"}
    consumed = set()
    for node in graph:
        if node.name not in params:
            continue
        for pkey, arr in params[node.name].items():
            tk = bn_map.get(pkey, pkey) if node.op == "bn" else pkey
            skey = f"{node.name}.{tk}"
            assert skey in src, f"params[{node.name}][{pkey}] has no source {skey}"
            np.testing.assert_array_equal(
                np.asarray(arr), src[skey].detach().numpy(),
                err_msg=f"mismatch at {skey}",
            )
            consumed.add(skey)
    leftover = {
        k for k in src
        if k not in consumed and not k.endswith("num_batches_tracked")
    }
    assert not leftover, f"checkpoint keys never ingested: {sorted(leftover)[:8]}"
    # sanity: the drill actually covered the whole network
    assert len(consumed) >= 150  # 52 convs + 52 BNs x 4 + classifier


def test_run_cls_checkpoint_int8_cli(pth_file, tmp_path):
    """The accuracy-gate command itself: run_cls --checkpoint file
    --engine int8 (smoke input; --data-dir is the only flag a user with
    ImageNet adds). Finite logits through the true-int8 engine."""
    path, _ = pth_file
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    env["XLA_FLAGS"] = ""
    res = subprocess.run(
        [sys.executable, "-m", "dfq_tpu.cli.run_cls",
         "--quantize", "--relu", "--equalize", "--correction",
         "--bits_bias", "16", "--checkpoint", path, "--engine", "int8",
         "--platform", "cpu"],
        capture_output=True, text=True, timeout=900, env=env, cwd=repo,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "smoke eval ok" in res.stdout and "finite=True" in res.stdout, (
        res.stdout[-500:]
    )
