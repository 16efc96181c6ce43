"""Engine policy autotuner (``dfq_tpu/engine/autotune.py``).

The autotuner exists because XLA's grouped-dw conv configs are
context-dependent (the same dw32@150^2 HLO collapses to 1.5 GB/s inside
MobileNetV1-SSD at b8 but not inside MNV2-SSD-Lite — PROF_MB1_r05 /
PROF_SSD_r04); on CPU we validate the machinery, not the v5e margins:
candidate racing, winner selection, signature stability, and the JSON
cache round-trip.
"""

import json

import jax.numpy as jnp
import numpy as np
import pytest

from dfq_tpu.engine import lower_int8
from dfq_tpu.engine.autotune import (
    autotune_dw_policy,
    dw_policy_candidates,
    model_signature,
)
from dfq_tpu.engine.int8_fused import execute_int8_fused
from dfq_tpu.graph import GraphBuilder
from dfq_tpu.models import init_params
from dfq_tpu.pipeline import QuantConfig, prepare


def _tiny_dw_net():
    """Stem conv + dw block + classifier — the smallest graph exercising
    the dw-lowering policies the autotuner races."""
    b = GraphBuilder()
    x = b.input("data")
    x = b.conv("stem.0", x, 3, 16, (3, 3), stride=(2, 2), padding=(1, 1))
    x = b.bn("stem.1", x, 16)
    x = b.relu("stem.2", x)
    x = b.conv("blk.0", x, 16, 16, (3, 3), padding=(1, 1), groups=16)
    x = b.bn("blk.1", x, 16)
    x = b.relu("blk.2", x)
    x = b.conv("blk.3", x, 16, 32, (1, 1))
    x = b.bn("blk.4", x, 32)
    x = b.relu("blk.5", x)
    x = b.global_mean("pool", x)
    x = b.linear("classifier", x, 32, 10)
    return b.build([x])


@pytest.fixture(scope="module")
def prepared():
    graph = _tiny_dw_net()
    params = init_params(graph, seed=0, bn_stats="random")
    prep = prepare(graph, params, QuantConfig(quantize=True, relu=True,
                                              bits_bias=16))
    return prep, lower_int8(prep)


def test_candidates_cover_measured_space():
    labels = {c["_label"] for c in dw_policy_candidates(8)}
    assert labels == {"auto", "dense32_h160", "grouped"}
    for c in dw_policy_candidates(8):
        # every candidate minus its label must be valid executor kwargs
        pol = {k: v for k, v in c.items() if k != "_label"}
        assert set(pol) <= {"dw_dense_max_ch", "dw_dense_max_h"}


def test_signature_stable_and_batch_sensitive(prepared):
    _, model = prepared
    assert model_signature(model, 8) == model_signature(model, 8)
    assert model_signature(model, 8) != model_signature(model, 32)


def test_autotune_picks_a_candidate_and_caches(prepared, tmp_path):
    prep, model = prepared
    x = jnp.asarray(
        np.random.default_rng(0).normal(0, 1, (2, 32, 32, 3)), jnp.float32
    )
    cache = tmp_path / "autotune.json"
    pol, report = autotune_dw_policy(
        model, prep.params, x, cache_path=str(cache), rounds=1)
    assert not report["cached"]
    assert report["label"] in {"auto", "dense32_h160", "grouped"}
    assert len(report["rows"]) == 3
    # winner's policy must execute
    out = execute_int8_fused(model, prep.params, x, **pol)
    assert out.shape == (2, 10)
    # second call: cache hit, same winner, no measurement rows
    pol2, report2 = autotune_dw_policy(
        model, prep.params, x, cache_path=str(cache), rounds=1)
    assert report2["cached"] and report2["label"] == report["label"]
    assert pol2 == pol
    # the cache file is keyed by the signature
    data = json.loads(cache.read_text())
    assert model_signature(model, 2) in data


def test_forced_winner_via_candidates(prepared, tmp_path):
    """A candidate list with one entry must return that entry — the
    mechanism bench/serving callers use to pin a policy while keeping
    the cache bookkeeping."""
    prep, model = prepared
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    pol, report = autotune_dw_policy(
        model, prep.params, x, rounds=1,
        candidates=[{"_label": "grouped", "dw_dense_max_ch": 0}])
    assert report["label"] == "grouped"
    assert pol == {"dw_dense_max_ch": 0}
