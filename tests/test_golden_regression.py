"""Golden regression: the full DFQ pipeline on fixed seeds must keep
producing byte-identical int8 artifacts.

The reference's regression baseline is its README accuracy tables
(SURVEY.md §4); without ImageNet in this environment, the equivalent
guard is determinism of every host-side pass output: any unintended
semantic change to fold/CLE/absorb/correct/range-set/lowering shifts
these digests. All quantities are integers or host-numpy float32
(platform-independent), so the digests are stable.
"""

import hashlib

import numpy as np

from dfq_tpu.engine import lower_int8
from dfq_tpu.models import init_params, mobilenet_v2
from dfq_tpu.pipeline import QuantConfig, prepare


def _digest(*arrays) -> str:
    h = hashlib.sha256()
    for a in arrays:
        h.update(np.ascontiguousarray(a).tobytes())
    return h.hexdigest()[:16]


def test_int8_artifact_golden():
    graph = mobilenet_v2()
    params = init_params(graph, seed=0, bn_stats="random")
    cfg = QuantConfig(
        quantize=True, relu=True, equalize=True, absorption=True,
        correction=True, bits_bias=16,
    )
    prep = prepare(graph, params, cfg)
    model = lower_int8(prep)

    qw = _digest(*[model.layers[k].qweight for k in sorted(model.layers)])
    ws = _digest(*[model.layers[k].wsum for k in sorted(model.layers)])
    ranges = np.array(
        [prep.act_ranges[k] for k in sorted(prep.act_ranges)], np.float32
    )
    rq = _digest(np.round(ranges * 1e4).astype(np.int64))

    # pinned digests — update ONLY for a deliberate semantic change,
    # and say why in the commit message
    assert qw == "bce65f66658466d6", qw
    assert ws == "b544a3b7cc257337", ws
    assert rq == "a35656226155b95b", rq


def test_pipeline_deterministic_across_runs():
    graph = mobilenet_v2()
    cfg = QuantConfig(quantize=True, relu=True, equalize=True, bits_bias=16)
    digests = []
    for _ in range(2):
        params = init_params(graph, seed=1, bn_stats="random")
        prep = prepare(graph, params, cfg)
        model = lower_int8(prep)
        digests.append(
            _digest(*[model.layers[k].qweight for k in sorted(model.layers)])
        )
    assert digests[0] == digests[1]
